"""Incremental-corpus gates: delta-vs-index dedup (ID1), the seeded
deterministic training shuffle (SH1), URL/domain corpus filtering (UF1),
the leakage-safe holdout split (HS1), its stability-under-growth rule
(HS2), streaming ingestion with online dedup (IN1), and the corpus
snapshot diff (SD1) — the nightly production shapes of a growing
training corpus.

Planted-residue pattern (as RT2/VR2/EQ1): ID1 synthesizes its "new batch"
from the documents table itself — doc_id % 10 == 0 is the delta, the rest
is the existing corpus — and plants exact duplicates (doc_id % 50 == 0
takes its index neighbor's text verbatim) and near duplicates
(doc_id % 30 == 0 takes the neighbor's text plus one appended word) via a
self-join both engines derive identically, so the expected verdict of
every planted row is known by construction and the md5-driven MinHash
classification is bitwise identical in Spark and DuckDB.

Determinism: every hash is md5 hex; signature agreement counts and the
cap/rank windows are integer; no float contract anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.incremental import (
    NEAR_MIN_AGREE,
    assign_holdout_incremental,
    build_signature_index,
    dedup_against_index,
    seeded_shuffle,
    seeded_split,
)
from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# ID1 — incremental-corpus dedup: classify a NEW batch against the
# signature index of the EXISTING corpus (reference analog: the
# existing-ID row filter, oc_meta/run/meta/preprocess_input.py:157-193 —
# drop input rows whose ids the store already knows; here generalized to
# content identity and near-identity at corpus scale).
#
# Scale notes (100 TB): index-side tables are persisted parquet (the
# pytest round-trips write_signature_index/read_signature_index); all
# joins are keyed on the DELTA (hash equi-join, (band,bucket) equi-join,
# candidate pairs) — work scales with the nightly batch, never
# index-vs-index; verify is signature agreement, so no shingle sets are
# stored or re-read.
# ---------------------------------------------------------------------------
# the DuckDB renderings of the fold kernels live in the non-registering
# ingest_fold_oracle module (shared with the IN2 composed-nightly gate);
# the local aliases keep this module's oracle f-strings unchanged
from oc_meta_spark.plans.ingest_fold_oracle import (  # noqa: E402
    ID1_BANDS as _ID1_BANDS,
    ID1_MINHASH as _ID1_MINHASH,
    ID1_SHINGLES as _ID1_SHINGLES,
    IN_FOLD_CTES as _IN_FOLD_CTES,
)


def id1_planted_batch(docs: DataFrame) -> DataFrame:
    """ID1's synthesized delta: doc_id % 10 == 0, with exact duplicates
    planted at % 50 (the index neighbor's text verbatim) and near
    duplicates at % 30 (neighbor's text plus one appended word).  The
    SINGLE definition of the plant — the gate and
    tests/test_incremental.py's expectation pins both import it."""
    donor = docs.select(F.col("doc_id").alias("d_id"), F.col("text").alias("d_text"))
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .join(donor, F.col("d_id") == F.col("doc_id") + 1)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 50 == 0, F.col("d_text"))
            .when(F.col("doc_id") % 30 == 0, F.concat(F.col("d_text"), F.lit(" zzz")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )


@register(
    "ID1_incremental_corpus_dedup",
    f"""
    WITH batch AS (
      SELECT b.doc_id,
             CASE WHEN b.doc_id % 50 = 0 THEN d.text
                  WHEN b.doc_id % 30 = 0 THEN d.text || ' zzz'
                  ELSE b.text END AS text
      FROM documents b JOIN documents d ON d.doc_id = b.doc_id + 1
      WHERE b.doc_id % 10 = 0
    ),
    idx AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
    exact_idx AS (SELECT md5(text) AS h, MIN(doc_id) AS idx_id FROM idx GROUP BY 1),
    exact_hit AS (
      SELECT b.doc_id, e.idx_id FROM batch b LEFT JOIN exact_idx e ON md5(b.text) = e.h
    ),
    bsh AS ({_ID1_SHINGLES.format(src="batch")}),
    ish AS ({_ID1_SHINGLES.format(src="idx")}),
    bmh AS ({_ID1_MINHASH.format(sh="bsh")}),
    imh AS ({_ID1_MINHASH.format(sh="ish")}),
    bband AS ({_ID1_BANDS.format(mh="bmh")}),
    iband AS ({_ID1_BANDS.format(mh="imh")}),
    cand AS (
      SELECT DISTINCT b.doc_id AS b_id, i.doc_id AS i_id
      FROM bband b JOIN iband i ON b.band = i.band AND b.bucket = i.bucket
    ),
    agree AS (
      SELECT c.b_id, c.i_id, COUNT(*) AS n_match
      FROM cand c
      JOIN bmh ON bmh.doc_id = c.b_id
      JOIN imh ON imh.doc_id = c.i_id AND imh.k = bmh.k AND imh.h = bmh.h
      GROUP BY c.b_id, c.i_id
    ),
    near AS (
      SELECT b_id, MIN(i_id) AS near_id FROM agree
      WHERE n_match >= {NEAR_MIN_AGREE} GROUP BY b_id
    )
    SELECT b.doc_id,
           CASE WHEN e.idx_id IS NOT NULL THEN 'exact_dup'
                WHEN n.near_id IS NOT NULL THEN 'near_dup'
                ELSE 'unique' END AS verdict,
           CAST(COALESCE(e.idx_id, n.near_id) AS BIGINT) AS matched_existing
    FROM batch b
    LEFT JOIN exact_hit e ON e.doc_id = b.doc_id
    LEFT JOIN near n ON n.b_id = b.doc_id
    ORDER BY b.doc_id
    """,
    doc="Incremental dedup of a new batch against the existing-corpus signature index: exact hash anti-path + delta-vs-index banded MinHash with signature-agreement verify.",
)
def id1_incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    batch = id1_planted_batch(docs)
    index = build_signature_index(docs.filter(F.col("doc_id") % 10 != 0))
    return dedup_against_index(batch, index).orderBy("doc_id")


# ---------------------------------------------------------------------------
# SH1 — seeded deterministic corpus shuffle: the reproducible global
# training permutation.  sort_key = md5(seed:doc_id); shard = the key's
# first 48 bits mod n (deterministic hash split, uniform for any shard
# count — NOT repartitionByRange, whose sampled boundaries vary run to
# run); pos = rank within shard.  Spark's conv(hex,16,10) and DuckDB's
# ('0x'||hex)::BIGINT read the same 12 hex chars to the same integer.
#
# Scale notes: one shuffle on shard; the rank window is per-shard
# (partition-parallel, never a global single-partition sort); shard
# count scales with the corpus (4 here only for gate-sized output).
# ---------------------------------------------------------------------------
_SH1_SEED = "r8seed"
_SH1_SHARDS = 4


@register(
    "SH1_seeded_corpus_shuffle",
    f"""
    WITH keyed AS (
      SELECT doc_id, md5('{_SH1_SEED}:' || CAST(doc_id AS VARCHAR)) AS sort_key
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, sort_key,
             ('0x' || substr(sort_key, 1, 12))::BIGINT % {_SH1_SHARDS} AS shard
      FROM keyed
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS BIGINT) AS pos,
           doc_id, sort_key
    FROM sharded ORDER BY shard, pos
    """,
    doc="Seeded deterministic training shuffle: md5(seed:id) sort key, 48-bit hash shard split, per-shard rank — identical permutation for a given seed on any run or cluster.",
)
def sh1_seeded_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return (
        seeded_shuffle(docs, _SH1_SEED, _SH1_SHARDS)
        .select("shard", "pos", "doc_id", "sort_key")
        .orderBy("shard", "pos")
    )


# ---------------------------------------------------------------------------
# UF1 — URL/domain corpus filter: hostname extraction, blocklist
# anti-join, per-domain document cap — the standard web-corpus hygiene
# pass (block bad domains, bound any single domain's contribution).
# URLs are synthesized deterministically from real columns (the
# documents table has no url column — planted-residue pattern; the
# KERNEL under test — regexp hostname extraction, broadcast anti-join,
# per-domain rank cap — is the real one).
#
# Scale notes: extraction is a scan-stage projection; the blocklist is a
# broadcast anti-join (blocklists are small); the cap is a per-domain
# window — partition-parallel on domain, the natural key.
# ---------------------------------------------------------------------------
_UF1_BLOCKLIST = ("src1-0.example.org", "src7-3.example.org", "evil.example.org")
_UF1_CAP = 3


@register(
    "UF1_domain_filter",
    f"""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '-' || CAST((doc_id // 20) % 5 AS VARCHAR) ||
             '.example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    hosts AS (
      SELECT doc_id, regexp_extract(url, 'https?://([^/]+)/', 1) AS domain FROM urls
    ),
    allowed AS (
      -- unparseable URLs (NULL/empty domain) are dropped EXPLICITLY: a
      -- NULL domain passes NOT IN in Spark's left_anti but not DuckDB's
      -- NOT IN — the contract is "no domain, no document", stated on
      -- both sides rather than left to engine null semantics
      SELECT * FROM hosts
      WHERE domain IS NOT NULL AND domain <> ''
        AND domain NOT IN ('{_UF1_BLOCKLIST[0]}', '{_UF1_BLOCKLIST[1]}', '{_UF1_BLOCKLIST[2]}')
    ),
    capped AS (
      SELECT doc_id, domain,
             ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS domain_rank
      FROM allowed
    )
    SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank
    FROM capped WHERE domain_rank <= {_UF1_CAP} ORDER BY doc_id
    """,
    doc="Web-corpus domain hygiene: hostname extraction, broadcast blocklist anti-join, per-domain contribution cap.",
)
def uf1_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-"),
            F.expr("cast((doc_id div 20) % 5 as string)"),
            F.lit(".example.org/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    hosts = urls.select(
        "doc_id", F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("domain")
    )
    blocklist = spark.createDataFrame(
        [(d,) for d in _UF1_BLOCKLIST], schema="domain string"
    )
    # explicit "no domain, no document" — see the oracle's allowed CTE
    parseable = hosts.filter(F.col("domain").isNotNull() & (F.col("domain") != ""))
    allowed = parseable.join(F.broadcast(blocklist), "domain", "left_anti")
    # the cap is a rank threshold over doc_id per domain — a mega-domain
    # (half the crawl) would make one hot window partition if ranked
    # naively (the SCALING row's risk); bucketed_rank salts by the
    # min/max-anchored range class of doc_id (spreads for ANY id
    # distribution) and, because the cap is a LITERAL, prunes every
    # class past it before ranking a single row
    from oc_meta_spark.plans.rank_refine import bucketed_rank, range_class

    keyed = range_class(allowed, "doc_id")
    return (
        bucketed_rank(
            keyed, ["domain"], ["rb"], ["doc_id"],
            rank_col="domain_rank", max_rank=_UF1_CAP,
        )
        .filter(F.col("domain_rank") <= _UF1_CAP)
        .select("doc_id", "domain", "domain_rank")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# HS1 — leakage-safe holdout split: assign every document to
# train/val/test (80/10/10) such that an entire near-dup CLUSTER lands in
# ONE split — the split key is the cluster representative, not the doc,
# so a document and its near-duplicate can never straddle train and eval
# (the standard benchmark-leakage failure a doc-keyed random split
# causes).  Clusters come from the same banded-MinHash pairs + connected
# components as D21; singleton docs are their own cluster.  The split
# assignment is the seeded-shuffle hash (md5 over the cluster id, first
# 48 bits mod 10), so it is reproducible on any run or cluster.
#
# Scale notes (100 TB): pairs are block-then-verify (no cartesian); CC is
# pointer-jumping, O(log diameter) rounds; the split itself is a narrow
# map on the cluster id plus one left join of docs to cluster labels.
# The oracle re-derives CC with a recursive CTE (the D21 pattern).
# ---------------------------------------------------------------------------
_HS1_SHINGLES = """
    shingles AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
    )
"""


@register(
    "HS1_leakage_safe_holdout",
    f"""
    WITH RECURSIVE {_HS1_SHINGLES},
    mh AS (
      SELECT doc_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
      FROM shingles CROSS JOIN (SELECT unnest(range(8)) AS k)
      GROUP BY doc_id, k
    ),
    bands AS (
      SELECT doc_id, k // 4 AS band, md5(string_agg(h, '|' ORDER BY k)) AS bucket
      FROM mh GROUP BY doc_id, k // 4
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, s.v FROM reach JOIN sym s ON s.u = reach.r
    ),
    comp AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node),
    clustered AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    assigned AS (
      SELECT doc_id, cluster,
             ('0x' || substr(md5('hs1:' || CAST(cluster AS VARCHAR)), 1, 12))::BIGINT % 10 AS b
      FROM clustered
    )
    SELECT doc_id, cluster,
           CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
    FROM assigned ORDER BY doc_id
    """,
    doc="Leakage-safe 80/10/10 holdout: near-dup clusters (banded MinHash + connected components) are split atomically by a seeded hash of the cluster representative — no near-duplicate straddles train and eval.",
)
def hs1_leakage_safe_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy imports: dedup_queries registers its own gates on import — the
    # registry's rotation order must stay the registry's decision
    from oc_meta_spark.operators.cc import connected_components
    from oc_meta_spark.plans.dedup_queries import d16_minhash_lsh

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    pairs = d16_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs, src="doc_a", dst="doc_b", local_threshold=0)
    comp = labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster"))
    clustered = docs.join(comp, "doc_id", "left").withColumn(
        "cluster", F.coalesce("cluster", F.col("doc_id"))
    )
    return clustered.select(
        "doc_id", "cluster", seeded_split("hs1", "cluster").alias("split")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# HS2 — holdout split STABILITY under corpus growth: the nightly reality
# HS1 alone gets wrong.  Clusters GROW — a new document that bridges a
# train cluster and a test cluster changes the merged cluster's
# representative, and HS1's recomputed seeded hash would flip OLD
# documents into a different split (cross-epoch leakage: yesterday's
# train doc surfaces in tomorrow's test set).  The incremental rule
# (plans/incremental.py::assign_holdout_incremental): assigned docs NEVER
# move, new docs inherit the split of their cluster's earliest-assigned
# member (min (assigned_epoch, doc_id)), all-new clusters get HS1's
# seeded-hash split.
#
# Planted-residue gate: "yesterday's" assignment is synthesized from a
# doc_id residue (doc_id % 10 != 0 are assigned, split = seeded hash of
# the doc — deliberately doc-keyed: the contract under test is STABILITY,
# not yesterday's safety; assigned_epoch = doc_id % 7).  "Today's"
# clustering arrives relationally: blocks of 9 consecutive doc_ids (each
# containing at most one new %10 doc, bridging up to 8 assigned docs with
# DIFFERING splits), except %90 docs, which get singleton all-new
# clusters (the fresh path).  All three statuses (kept / inherited /
# fresh) are present by construction at every SF.  Clustering itself is
# HS1/D16/D21's tested territory — this gate isolates the assignment
# kernel, which is what changed.
#
# Scale notes (100 TB): one doc_id equi-join, one per-cluster window, one
# anti-join, one cluster left-join — no new shuffle class beyond HS1's;
# prior and clusters are both bucketable on their join keys.
# ---------------------------------------------------------------------------


@register(
    "HS2_incremental_holdout_stability",
    """
    WITH prior AS (
      SELECT doc_id, doc_id % 7 AS assigned_epoch,
             ('0x' || substr(md5('prior:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10 AS b
      FROM documents WHERE doc_id % 10 <> 0
    ),
    prior_split AS (
      SELECT doc_id, assigned_epoch,
             CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
      FROM prior
    ),
    clusters AS (
      SELECT doc_id,
             CASE WHEN doc_id % 90 = 0 THEN -(doc_id + 1)
                  ELSE (doc_id // 9) * 9 END AS cluster
      FROM documents
    ),
    anchors AS (
      SELECT cluster, split AS inherited_split FROM (
        SELECT c.cluster, p.split,
               ROW_NUMBER() OVER (PARTITION BY c.cluster
                                  ORDER BY p.assigned_epoch, p.doc_id) AS rn
        FROM clusters c JOIN prior_split p ON p.doc_id = c.doc_id
      ) WHERE rn = 1
    ),
    fresh AS (
      SELECT doc_id, cluster,
             ('0x' || substr(md5('hs2:' || CAST(cluster AS VARCHAR)), 1, 12))::BIGINT % 10 AS fb
      FROM clusters WHERE doc_id % 10 = 0
    )
    SELECT doc_id, split, 'kept' AS status FROM prior_split
    UNION ALL
    SELECT f.doc_id,
           COALESCE(a.inherited_split,
                    CASE WHEN f.fb < 8 THEN 'train'
                         WHEN f.fb = 8 THEN 'val' ELSE 'test' END) AS split,
           CASE WHEN a.inherited_split IS NOT NULL
                THEN 'inherited' ELSE 'fresh' END AS status
    FROM fresh f LEFT JOIN anchors a ON a.cluster = f.cluster
    ORDER BY doc_id
    """,
    doc="Holdout stability under corpus growth: assigned docs never move, new docs inherit their cluster's earliest-assigned split, all-new clusters get the seeded fresh split.",
)
def hs2_incremental_holdout_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    prior = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        seeded_split("prior", "doc_id").alias("split"),
        (F.col("doc_id") % 7).alias("assigned_epoch"),
    )
    clustered = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 90 == 0, -(F.col("doc_id") + 1))
        .otherwise(F.expr("(doc_id div 9) * 9"))
        .alias("cluster"),
    )
    return assign_holdout_incremental(clustered, prior, seed="hs2").orderBy("doc_id")


# ---------------------------------------------------------------------------
# HS3 — the HS1→HS2 COMPOSITION over the real clustering kernel: HS2's
# driver row pins the assignment rule over synthetic clusters; this gate
# derives both yesterday's and today's clusters from the REAL banded-
# MinHash + connected-components path (HS1's kernel, D16's geometry) and
# runs the incremental assigner across real growth.
#
# Plants (all deterministic through the honest kernel — both engines
# derive them from the same md5 banding):
#   %30==1 (old, >=3 words)  → text := its own first 3 words REPEATED
#                              ("w1 w2 w3 w1 w2 w3");
#   %30==0 (new)             → the ROTATION of its old neighbor's triple
#                              ("w2 w3 w1 w2 w3 w1"): the two texts have
#                              the IDENTICAL shingle set, hence identical
#                              signatures and band buckets — a GUARANTEED
#                              banded near-dup merge of the new doc into
#                              the old cluster (different md5, so the
#                              exact path cannot shortcut it);
#   %50==0 (new, donor not a %30==1 plant) → the old neighbor's text
#                              verbatim — the exact-dup merge path.
# Every other new doc exercises the fresh path; every old doc must come
# back 'kept' with yesterday's split byte-identical.
#
# Why no cross-OLD-cluster bridge is planted: under banded MinHash the
# only DETERMINISTIC similarity is shingle-set equality, which is an
# equivalence relation — any doc set it connects was already ONE cluster
# in yesterday's run, so a guaranteed two-old-cluster merge through the
# real kernel is impossible by construction (a probabilistic band
# collision could do it, but then the gate's expectations would be
# SF-dependent).  The cross-split straddle-merge contract is therefore
# pinned where it can be forced: HS2's synthetic-cluster gate and the
# explicit-bridge pytest (tests/test_incremental.py::
# test_incremental_holdout_never_reassigns).
#
# Scale notes: two runs of HS1's shape (pairs are block-then-verify,
# CC is pointer-jumping) + HS2's assignment joins; in production
# yesterday's clusters come from the persisted holdout history, not a
# re-derivation — the double clustering here exists to make the oracle
# self-contained.
# ---------------------------------------------------------------------------
_HS3_SEED = "hs3"


def _hs3_w(col: str, i: int) -> str:
    return f"string_split({col}, ' ')[{i}]"


def _hs3_triple(col: str, order: tuple[int, int, int]) -> str:
    a, b, c = (_hs3_w(col, i) for i in order)
    return f"({a} || ' ' || {b} || ' ' || {c} || ' ' || {a} || ' ' || {b} || ' ' || {c})"


def _hs3_cluster_block(tag: str, src: str) -> str:
    """The HS1 kernel as CTEs over ``src``: shingles → k=8 MinHash →
    2 bands of 4 → candidate pairs → recursive-CTE CC → (doc_id, cluster)
    as ``cl{tag}`` (singletons are their own cluster)."""
    return f"""
    sh{tag} AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}))
    ),
    mh{tag} AS (
      SELECT doc_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
      FROM sh{tag} CROSS JOIN (SELECT unnest(range(8)) AS k)
      GROUP BY doc_id, k
    ),
    bd{tag} AS (
      SELECT doc_id, k // 4 AS band, md5(string_agg(h, '|' ORDER BY k)) AS bucket
      FROM mh{tag} GROUP BY doc_id, k // 4
    ),
    pr{tag} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bd{tag} a JOIN bd{tag} b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    sym{tag} AS (
      SELECT doc_a AS u, doc_b AS v FROM pr{tag}
      UNION SELECT doc_b, doc_a FROM pr{tag}
    ),
    nodes{tag} AS (SELECT DISTINCT u AS node FROM sym{tag}),
    reach{tag}(node, r) AS (
      SELECT node, node FROM nodes{tag}
      UNION
      SELECT reach{tag}.node, s.v FROM reach{tag} JOIN sym{tag} s ON s.u = reach{tag}.r
    ),
    comp{tag} AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach{tag} GROUP BY node),
    cl{tag} AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
      FROM {src} d LEFT JOIN comp{tag} c ON c.doc_id = d.doc_id
    )"""


_HS3_ORACLE = f"""
    WITH RECURSIVE planted AS (
      SELECT m.doc_id,
             CASE
               WHEN m.doc_id % 30 = 1 AND len(string_split(m.text, ' ')) >= 3
                 THEN {_hs3_triple("m.text", (1, 2, 3))}
               WHEN m.doc_id % 30 = 0 AND n.text IS NOT NULL
                    AND len(string_split(n.text, ' ')) >= 3
                 THEN {_hs3_triple("n.text", (2, 3, 1))}
               WHEN m.doc_id % 50 = 0 AND n.text IS NOT NULL
                    AND (m.doc_id + 1) % 30 <> 1
                 THEN n.text
               ELSE m.text END AS text
      FROM documents m LEFT JOIN documents n ON n.doc_id = m.doc_id + 1
    ),
    old AS (SELECT doc_id, text FROM planted WHERE doc_id % 10 <> 0),
    {_hs3_cluster_block("o", "old")},
    prior_split AS (
      SELECT doc_id,
             CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
             0 AS assigned_epoch
      FROM (
        SELECT doc_id,
               ('0x' || substr(md5('{_HS3_SEED}:' || CAST(cluster AS VARCHAR)), 1, 12))::BIGINT % 10 AS b
        FROM clo
      )
    ),
    {_hs3_cluster_block("f", "planted")},
    anchors AS (
      SELECT cluster, split AS inherited_split FROM (
        SELECT c.cluster, p.split,
               ROW_NUMBER() OVER (PARTITION BY c.cluster
                                  ORDER BY p.assigned_epoch, p.doc_id) AS rn
        FROM clf c JOIN prior_split p ON p.doc_id = c.doc_id
      ) WHERE rn = 1
    ),
    fresh AS (
      SELECT doc_id, cluster,
             ('0x' || substr(md5('{_HS3_SEED}:' || CAST(cluster AS VARCHAR)), 1, 12))::BIGINT % 10 AS fb
      FROM clf WHERE doc_id % 10 = 0
    )
    SELECT doc_id, split, 'kept' AS status FROM prior_split
    UNION ALL
    SELECT f.doc_id,
           COALESCE(a.inherited_split,
                    CASE WHEN f.fb < 8 THEN 'train'
                         WHEN f.fb = 8 THEN 'val' ELSE 'test' END) AS split,
           CASE WHEN a.inherited_split IS NOT NULL
                THEN 'inherited' ELSE 'fresh' END AS status
    FROM fresh f LEFT JOIN anchors a ON a.cluster = f.cluster
    ORDER BY doc_id
"""


def hs3_planted_corpus(docs: DataFrame) -> DataFrame:
    """HS3's planted corpus (doc_id, text) — the SINGLE definition of the
    plant; the gate and tests/test_incremental.py both import it.  See
    the residue table in the comment block above."""
    n = docs.select(F.col("doc_id").alias("n_id"), F.col("text").alias("n_text"))
    j = docs.join(n, F.col("n_id") == F.col("doc_id") + 1, "left")
    ws = F.split(F.col("text"), " ")
    nws = F.split(F.col("n_text"), " ")

    def triple(arr, order):
        a, b, c = (F.element_at(arr, i) for i in order)
        return F.concat_ws(" ", a, b, c, a, b, c)

    return j.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 30 == 1) & (F.size(ws) >= 3), triple(ws, (1, 2, 3))
        )
        .when(
            (F.col("doc_id") % 30 == 0)
            & F.col("n_text").isNotNull()
            & (F.size(nws) >= 3),
            triple(nws, (2, 3, 1)),
        )
        .when(
            (F.col("doc_id") % 50 == 0)
            & F.col("n_text").isNotNull()
            & ((F.col("doc_id") + 1) % 30 != 1),
            F.col("n_text"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def lsh_clusters(corpus: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """(doc_id, cluster): HS1's clustering kernel over an arbitrary
    (doc_id, text) frame — banded-MinHash candidate pairs + pointer-
    jumping connected components; docs in no pair are their own
    singleton cluster.  ``pairs`` (doc_a, doc_b) supplies a precomputed
    candidate set so a caller with several corpus views of ONE banding
    pass (HS3) reuses it instead of re-running the kernel."""
    from oc_meta_spark.operators.cc import connected_components
    from oc_meta_spark.plans.dedup_queries import banded_pairs

    if pairs is None:
        pairs = banded_pairs(corpus)
    labels = connected_components(pairs, src="doc_a", dst="doc_b", local_threshold=0)
    comp = labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster"))
    return (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("cluster", F.coalesce("cluster", F.col("doc_id")))
    )


@register(
    "HS3_composed_holdout_growth",
    _HS3_ORACLE,
    doc="HS1→HS2 composition over the real clustering kernel: yesterday's holdout from banded-MinHash+CC clusters of the old corpus, today's growth (planted exact and rotation near-dup merges plus fresh docs) assigned incrementally — old assignments never move.",
)
def hs3_composed_holdout_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.dedup_queries import banded_pairs

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    planted = hs3_planted_corpus(docs)
    old = planted.filter(F.col("doc_id") % 10 != 0)

    # ONE MinHash/banding pass serves both clusterings: a banded pair is
    # a property of its two docs alone (bucket equality), so the old
    # corpus's pairs are EXACTLY the full corpus's pairs restricted to
    # old endpoints — re-running the kernel on the old slice (as the
    # self-contained oracle does) would compute the identical set at
    # twice the cost.  Materialized once: both CC runs and their retry
    # iterations re-read the pair set.
    pairs_full = banded_pairs(planted).localCheckpoint()
    pairs_old = pairs_full.filter(
        (F.col("doc_a") % 10 != 0) & (F.col("doc_b") % 10 != 0)
    )

    prior = lsh_clusters(old, pairs=pairs_old).select(
        "doc_id",
        seeded_split(_HS3_SEED, "cluster").alias("split"),
        F.lit(0).cast("int").alias("assigned_epoch"),
    )
    clustered = lsh_clusters(planted, pairs=pairs_full)
    return assign_holdout_incremental(clustered, prior, seed=_HS3_SEED).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# IN1 — streaming ingestion with online dedup: the continuous form of the
# nightly ID1 loop (streaming/ingest.py).  A sequence of micro-batches is
# folded through classify-against-index → extend-index, so a document is
# deduplicated against the base corpus AND every earlier batch's
# survivors; in-batch exact duplicates collapse to the min-id holder
# first (the batch's distinct-content set is what probes the index).
#
# Planted-residue gate (the ID1 pattern, extended to two sequential
# batches): base corpus = doc_id % 10 ∉ {0, 1}; batch b = residue b, with
# plants (precedence order, donors must exist):
#   %110 == b → the same batch's doc_id−10 FINAL text (in-batch dup),
#   % 50 == b → base donor doc_id+(2−b) verbatim   (exact vs base),
#   % 30 == b → base donor + ' zzz'                (near vs base),
#   % 70 == 1 → batch-0 doc_id−1 FINAL text        (cross-batch, b=1).
# The oracle rebuilds the identical two-stage plant and replays the fold
# batch-by-batch in SQL (batch-1's index CTE includes batch-0 survivors),
# so every verdict — including cross-batch and in-batch chains — is
# derived independently by both engines.  The gate runs the BOUNDED fold
# (ingest_fold — the same ingest_step kernel the foreachBatch body runs);
# checkpointed streaming, the manifest store, replay idempotency, and
# compaction are pinned by tests/test_streaming_ingest.py (the ST-gate
# split: values gated here, sink semantics in pytest).
#
# Scale notes (continuous ingestion at 100 TB): every index probe in the
# kernel is the delta-prefiltered ID1 path (the index is scanned, never
# shuffled); the in-batch holder collapse is one batch-sized hash agg;
# the store appends O(batch) delta files per commit and compacts
# periodically (tests pin rows-unchanged).
# ---------------------------------------------------------------------------


def in1_planted_batches(docs: DataFrame) -> list[DataFrame]:
    """The two planted micro-batches (doc_id, text) — the SINGLE
    definition of the plant; the gate and tests/test_streaming_ingest.py
    both import it.  See the comment block above for the residue table."""
    raw = docs.select("doc_id", "text")
    donor = raw.select(F.col("doc_id").alias("d_id"), F.col("text").alias("d_text"))
    batches: list[DataFrame] = []
    prev: DataFrame | None = None
    for b in (0, 1):
        mine = raw.filter(F.col("doc_id") % 10 == b)
        p = mine.join(donor, F.col("d_id") == F.col("doc_id") + (2 - b), "left")
        planted = F.when(
            (F.col("doc_id") % 50 == b) & F.col("d_text").isNotNull(), F.col("d_text")
        ).when(
            (F.col("doc_id") % 30 == b) & F.col("d_text").isNotNull(),
            F.concat(F.col("d_text"), F.lit(" zzz")),
        )
        if b >= 1:
            x = prev.select(F.col("doc_id").alias("x_id"), F.col("text").alias("x_text"))
            p = p.join(x, F.col("x_id") == F.col("doc_id") - 1, "left")
            planted = planted.when(
                (F.col("doc_id") % 70 == b) & F.col("x_text").isNotNull(), F.col("x_text")
            )
        p = p.select("doc_id", planted.otherwise(F.col("text")).alias("text"))
        q = p.select(F.col("doc_id").alias("q_id"), F.col("text").alias("q_text"))
        t = (
            p.join(q, F.col("q_id") == F.col("doc_id") - 10, "left")
            .select(
                "doc_id",
                F.when(
                    (F.col("doc_id") % 110 == b) & F.col("q_text").isNotNull(),
                    F.col("q_text"),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
        )
        batches.append(t)
        prev = t
    return batches


_IN1_ORACLE = f"""
    WITH {_IN_FOLD_CTES}
    SELECT doc_id, verdict, matched_existing, batch FROM ver0
    UNION ALL
    SELECT doc_id, verdict, matched_existing, batch FROM ver1
    ORDER BY doc_id
"""


@register(
    "IN1_streaming_ingest_dedup",
    _IN1_ORACLE,
    doc="Streaming corpus ingestion with online dedup: micro-batches folded through classify-against-signature-index → extend, with in-batch holder collapse and cross-batch survivor dedup.",
)
def in1_streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy import: streaming.ingest pulls in the micro-batch store module;
    # registration order stays the registry's decision
    from oc_meta_spark.streaming.ingest import ingest_fold

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = docs.filter(~(F.col("doc_id") % 10).isin(0, 1))
    return (
        ingest_fold(in1_planted_batches(docs), build_signature_index(base))
        .select("doc_id", "verdict", "matched_existing", "batch")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# SD1 — corpus snapshot diff: the dataset-versioning audit between two
# corpus snapshots (added / removed / changed / unchanged by content
# hash) a nightly pipeline runs before promoting a new snapshot — the
# whole-corpus generalization of the reference's export-consistency check
# (oc_meta/run/check_results.py compares a dump against the store row by
# row; here both sides are snapshots and identity is md5(text)).
#
# Planted snapshots: old = doc_id % 13 ≠ 0 (with % 17 == 0 texts given an
# ' OLD' suffix), new = doc_id % 11 ≠ 0 — so added (%13==0 ∧ %11≠0),
# removed (%11==0 ∧ %13≠0), changed (%17==0 present in both), and
# unchanged rows all exist by construction; %143==0 docs are in neither
# snapshot and must not appear.
#
# Scale notes: hash-projected scans (narrow) + ONE full outer equi-join
# on doc_id — co-located when snapshots are doc_id-bucketed/sorted, which
# the shard sink guarantees.
# ---------------------------------------------------------------------------


@register(
    "SD1_corpus_snapshot_diff",
    """
    WITH old_snap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0 THEN text || ' OLD' ELSE text END AS text
      FROM documents WHERE doc_id % 13 <> 0
    ),
    new_snap AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0)
    -- presence keyed on the JOIN SIDE (snapshot keys are non-null), not
    -- on md5's nullability, and the hash compare is null-safe — the
    -- kernel's contract for NULL-text rows
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN md5(o.text) IS DISTINCT FROM md5(n.text) THEN 'changed'
                ELSE 'unchanged' END AS status,
           md5(o.text) AS old_hash,
           md5(n.text) AS new_hash
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    ORDER BY doc_id
    """,
    doc="Corpus snapshot diff: added/removed/changed/unchanged audit between two snapshots via hash-projected scans and one full outer key join.",
)
def sd1_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.incremental import snapshot_diff

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" OLD")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = docs.filter(F.col("doc_id") % 11 != 0)
    return snapshot_diff(old, new).orderBy("doc_id")
