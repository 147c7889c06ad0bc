"""Incremental-corpus gates: delta-vs-index dedup (ID1), the seeded
deterministic training shuffle (SH1), URL/domain corpus filtering (UF1),
the leakage-safe holdout split (HS1) and its stability-under-growth rule
(HS2) — the nightly production shapes of a growing training corpus.

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
_ID1_SHINGLES = """
    SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
    FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}))
"""

_ID1_MINHASH = """
    SELECT doc_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
    FROM {sh} CROSS JOIN (SELECT unnest(range(8)) AS k)
    GROUP BY doc_id, k
"""

_ID1_BANDS = """
    SELECT doc_id, k // 2 AS band, md5(string_agg(h, '|' ORDER BY k)) AS bucket
    FROM {mh} GROUP BY doc_id, k // 2
"""


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
    w = Window.partitionBy("domain").orderBy("doc_id")
    return (
        allowed.withColumn("domain_rank", F.row_number().over(w).cast("long"))
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
    bucket = F.expr(
        "cast(conv(substr(md5(concat('hs1:', cast(cluster as string))), 1, 12), 16, 10) as bigint) % 10"
    )
    return clustered.select(
        "doc_id",
        "cluster",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split"),
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
    prior_bucket = F.expr(
        "cast(conv(substr(md5(concat('prior:', cast(doc_id as string))), 1, 12), 16, 10) as bigint) % 10"
    )
    prior = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(prior_bucket < 8, "train")
        .when(prior_bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
        (F.col("doc_id") % 7).alias("assigned_epoch"),
    )
    clustered = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 90 == 0, -(F.col("doc_id") + 1))
        .otherwise(F.expr("(doc_id div 9) * 9"))
        .alias("cluster"),
    )
    return assign_holdout_incremental(clustered, prior, seed="hs2").orderBy("doc_id")
