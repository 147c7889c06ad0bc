"""Deduplication & entity-resolution plans (SURVEY §2.4) plus the
training-data-pipeline dedup family (MinHash-LSH / SimHash / n-gram Jaccard).

Cross-engine determinism: every hash is an ``md5`` hex string (identical in
Spark and DuckDB); set sizes and int arithmetic are exact; ratios are single
IEEE divisions of exact ints.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# D8 — full-row dedup (reference: global seen_rows set,
# oc_meta/run/meta/preprocess_input.py:150-153 → Spark dropDuplicates).
# ---------------------------------------------------------------------------
@register(
    "D8_exact_dedup",
    """
    SELECT o_orderpriority AS priority, o_orderstatus AS status, COUNT(*) AS n_distinct_custs
    FROM (SELECT DISTINCT o_orderpriority, o_orderstatus, o_custkey FROM orders)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="dropDuplicates as hash-aggregate exact dedup (SURVEY D8).",
)
def d8_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderpriority", "o_orderstatus", "o_custkey")
        .dropDuplicates()
        .groupBy(F.col("o_orderpriority").alias("priority"), F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n_distinct_custs"))
        .orderBy("priority", "status")
    )


# ---------------------------------------------------------------------------
# D9 — duplicate-key finder: keys held by >1 entity, with the full sorted
# group (reference: duplicated_ids.py groupBy (scheme, literal) →
# collect_set, oc_meta/run/find/duplicated_ids.py:22-155).
# ---------------------------------------------------------------------------
@register(
    "D9_duplicate_key_groups",
    """
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           COUNT(*) AS n_lines,
           array_to_string(list_sort(list(l_orderkey)), ',') AS orderkeys
    FROM lineitem
    GROUP BY 1, 2
    HAVING COUNT(*) > 1
    ORDER BY 1, 2
    """,
    doc="Duplicate-key grouping with deterministic sorted member list (SURVEY D9/D10 input).",
)
def d9_duplicate_key_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("l_orderkey")), lambda v: v.cast("string")), ","
            ).alias("orderkeys"),
        )
        .filter(F.col("n_lines") > 1)
        .orderBy("partkey", "suppkey")
    )


# ---------------------------------------------------------------------------
# D2 — the resolution decision kernel: per input row, aggregate the candidate
# set from the catalog join and classify new / existing / conflict
# (reference: id_worker, oc_meta/core/curator.py:1167-1304 — priority
# cascade; >1 distinct match ⇒ conflict).  Catalog = every 7th document,
# keyed by (lang, n_chars); batch = remaining documents.
# ---------------------------------------------------------------------------
@register(
    "D2_resolution_decision",
    """
    WITH catalog AS (
      SELECT doc_id AS cat_id, lang, n_chars FROM documents WHERE doc_id % 7 = 0
    ),
    batch AS (
      SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT b.doc_id,
           COUNT(c.cat_id) AS n_candidates,
           CASE WHEN COUNT(c.cat_id) = 0 THEN 'new'
                WHEN COUNT(DISTINCT c.cat_id) = 1 THEN 'existing'
                ELSE 'conflict' END AS decision,
           MIN(c.cat_id) AS resolved_id
    FROM batch b LEFT JOIN catalog c ON b.lang = c.lang AND b.n_chars = c.n_chars
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    doc="id_worker candidate-set cascade: new/existing/conflict (SURVEY D2/A7).",
)
def d2_resolution_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    catalog = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("cat_id"), F.col("lang").alias("c_lang"), F.col("n_chars").alias("c_n")
    )
    batch = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "lang", "n_chars")
    joined = batch.join(
        F.broadcast(catalog), (batch.lang == catalog.c_lang) & (batch.n_chars == catalog.c_n), "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("cat_id").alias("n_candidates"),
            F.when(F.count("cat_id") == 0, "new")
            .when(F.countDistinct("cat_id") == 1, "existing")
            .otherwise("conflict")
            .alias("decision"),
            F.min("cat_id").alias("resolved_id"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# D14 — disambiguation key: countDistinct over a conditional key
# (reference: venue key = lower(name) if only-OMID else OMID,
# oc_meta/run/count/meta_entities.py:25-44).
# ---------------------------------------------------------------------------
@register(
    "D14_conditional_distinct_key",
    """
    SELECT c_mktsegment AS segment,
           COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN lower(c_name) ELSE CAST(c_custkey AS VARCHAR) END) AS n_entities
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    doc="Conditional disambiguation key + distinct count (SURVEY D14/A1).",
)
def d14_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    key = F.when(F.col("c_acctbal") < 0, F.lower("c_name")).otherwise(F.col("c_custkey").cast("string"))
    return (
        cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.countDistinct(key).alias("n_entities"))
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# D15 — weighted fuzzy bibliographic match (reference: Levenshtein-based
# score 7·author + 14·title + 5·source, threshold 25 —
# oc_meta/lib/bibliographic_matching.py:185-259).  Generic analog: weighted
# similarity between customer and supplier names within a nation.
# ---------------------------------------------------------------------------
@register(
    "D15_fuzzy_weighted_match",
    """
    SELECT s_suppkey AS suppkey, c_custkey AS custkey, score
    FROM (
      SELECT s.s_suppkey, c.c_custkey,
             7.0 * (1.0 - CAST(levenshtein(c.c_name, s.s_name) AS DOUBLE)
                          / CAST(greatest(length(c.c_name), length(s.s_name)) AS DOUBLE))
             + 5.0 * (CASE WHEN c.c_nationkey = s.s_nationkey THEN 1.0 ELSE 0.0 END) AS score,
             ROW_NUMBER() OVER (PARTITION BY s.s_suppkey
                                ORDER BY levenshtein(c.c_name, s.s_name), c.c_custkey) AS rn
      FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey
      WHERE s.s_suppkey <= 100
    ) WHERE rn = 1
    ORDER BY suppkey
    """,
    doc="Weighted Levenshtein similarity + deterministic argmin (SURVEY D15/C13).",
)
def d15_fuzzy_weighted_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 100)
    cust = _t(spark, sf_dir, "customer")
    lev = F.levenshtein("c_name", "s_name")
    score = (
        F.lit(7.0) * (F.lit(1.0) - lev.cast("double") / F.greatest(F.length("c_name"), F.length("s_name")).cast("double"))
        + F.lit(5.0) * F.when(F.col("c_nationkey") == F.col("s_nationkey"), 1.0).otherwise(0.0)
    )
    w = Window.partitionBy("s_suppkey").orderBy(lev, F.col("c_custkey"))
    return (
        supp.join(cust, supp.s_nationkey == cust.c_nationkey)
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("s_suppkey").alias("suppkey"), F.col("c_custkey").alias("custkey"), "score")
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Shared CTE fragments for the text-dedup family.
# ---------------------------------------------------------------------------
_WORDS_SQL = """
    words AS (
      SELECT DISTINCT doc_id, w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    )
"""


def _words(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .dropDuplicates(["doc_id", "w"])
    )


# ---------------------------------------------------------------------------
# D16 — MinHash + LSH near-dup detection over 3-word shingles.  k=8 hash
# functions realized as md5(shingle || '#' || k); signature = per-k min;
# 2 bands of 4 rows; candidate pairs share a band bucket.  Word-salad docs
# share vocabulary, so single-word sets would candidate nearly all pairs —
# shingling restores discrimination (the planted near-dups have shingle
# Jaccard ≈0.99, everything else ≈0).  (Training-data dedup extension; same
# shape as the reference's shared-id duplicate finder D10 but on content.)
# ---------------------------------------------------------------------------
_SHINGLES_SQL = """
    shingles AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
    )
"""


def _shingles(docs: DataFrame) -> DataFrame:
    # Guarded against Spark's descending sequence(1, 0): a sub-3-word doc
    # must yield zero shingles, not spurious partials from concat_ws dropping
    # the null out-of-range elements (the oracle's range(1, len-1) is empty).
    sh = F.expr(
        "CASE WHEN size(ws) >= 3 THEN "
        "transform(sequence(1, size(ws) - 2), "
        "i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])) "
        "ELSE array() END"
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.explode(sh).alias("s"))
        .dropDuplicates(["doc_id", "s"])
    )


def banded_pairs(docs: DataFrame, n_band_rows: int = 4) -> DataFrame:
    """(doc_a, doc_b), doc_a < doc_b: the banded-LSH candidate pairs of a
    (doc_id, text) corpus — D16's kernel over an arbitrary frame, shared
    with HS1/HS3's cluster derivations.  The MinHash/banding kernel is
    ONE implementation (plans/incremental.py), two band geometries
    (within-corpus: 2 bands of 4; incremental index: 4 bands of 2)."""
    from oc_meta_spark.plans.incremental import band_buckets, minhash_signature

    bands = band_buckets(minhash_signature(docs), n_band_rows=n_band_rows)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates()
    )


@register(
    "D16_minhash_lsh_near_dup",
    f"""
    WITH {_SHINGLES_SQL},
    mh AS (
      SELECT doc_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
      FROM shingles CROSS JOIN (SELECT unnest(range(8)) AS k)
      GROUP BY doc_id, k
    ),
    bands AS (
      SELECT doc_id, k // 4 AS band, md5(string_agg(h, '|' ORDER BY k)) AS bucket
      FROM mh GROUP BY doc_id, k // 4
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
    doc="MinHash over 3-word shingles + banded LSH candidate pairs (training-data dedup; SURVEY M6).",
)
def d16_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return banded_pairs(_t(spark, sf_dir, "documents")).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# D17 — SimHash: 64-bit signature from word-md5 bit votes, expressed fully
# in relational algebra (explode words × 16 hex positions; ±1 votes per bit;
# sign → signature hex).  No UDFs, identical in both engines.
# ---------------------------------------------------------------------------
@register(
    "D17_simhash_signature",
    f"""
    WITH {_WORDS_SQL},
    wh AS (SELECT doc_id, substr(md5(w), 1, 16) AS h FROM words),
    bits AS (
      SELECT doc_id, i, j,
             ((strpos('0123456789abcdef', substr(h, CAST(i AS INT) + 1, 1)) - 1) >> CAST(j AS INT)) & 1 AS bit
      FROM wh
      CROSS JOIN (SELECT unnest(range(16)) AS i)
      CROSS JOIN (SELECT unnest(range(4)) AS j)
    ),
    votes AS (
      SELECT doc_id, i, j, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
      FROM bits GROUP BY doc_id, i, j
    ),
    nibbles AS (
      SELECT doc_id, i,
             SUM(CASE WHEN v > 0 THEN (1 << CAST(j AS INT)) ELSE 0 END) AS nib
      FROM votes GROUP BY doc_id, i
    )
    SELECT doc_id,
           string_agg(substr('0123456789abcdef', CAST(nib AS INT) + 1, 1), '' ORDER BY i) AS simhash
    FROM nibbles GROUP BY doc_id ORDER BY doc_id
    """,
    doc="SimHash 64-bit signatures via relational bit votes (training-data dedup).",
)
def d17_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_signatures(spark, sf_dir).orderBy("doc_id")


def _simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) with NO output ordering — the shared frame for
    the D17 signature listing (which adds orderBy) and the D20 banding
    join (where a pre-sort would be a wasted full shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    words = _words(docs)
    wh = words.select("doc_id", F.substring(F.md5("w"), 1, 16).alias("h"))
    pos_i = spark.range(16).select(F.col("id").cast("int").alias("i"))
    pos_j = spark.range(4).select(F.col("id").cast("int").alias("j"))
    bits = (
        wh.crossJoin(F.broadcast(pos_i))
        .crossJoin(F.broadcast(pos_j))
        .select(
            "doc_id",
            "i",
            "j",
            F.expr("shiftright(instr('0123456789abcdef', substr(h, i + 1, 1)) - 1, j) & 1").alias("bit"),
        )
    )
    votes = bits.groupBy("doc_id", "i", "j").agg(
        F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1)).alias("v")
    )
    nibbles = votes.groupBy("doc_id", "i").agg(
        F.sum(F.when(F.col("v") > 0, F.expr("shiftleft(1, j)")).otherwise(0)).alias("nib")
    )
    return (
        nibbles.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "nib"))),
                    lambda s: F.substring(F.lit("0123456789abcdef"), s["nib"].cast("int") + 1, 1),
                ),
                "",
            ).alias("simhash")
        )
    )


# ---------------------------------------------------------------------------
# D18 — n-gram/word-set Jaccard similarity join within blocking buckets
# (blocking by `source` bounds the candidate space — the scale path at
# 100 TB is block + verify, never all-pairs).
# ---------------------------------------------------------------------------
@register(
    "D18_jaccard_similarity_join",
    f"""
    WITH {_WORDS_SQL},
    ws AS (SELECT doc_id, list_sort(list(w)) AS wset, COUNT(*) AS n FROM words GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(wa.wset, wb.wset)) AS inter,
             wa.n + wb.n - len(list_intersect(wa.wset, wb.wset)) AS uni
      FROM documents a
      JOIN documents b ON a.source = b.source AND a.doc_id < b.doc_id
      JOIN ws wa ON wa.doc_id = a.doc_id
      JOIN ws wb ON wb.doc_id = b.doc_id
    )
    SELECT doc_a, doc_b, inter, uni,
           CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
    FROM pairs
    WHERE inter * 2 > uni
    ORDER BY doc_a, doc_b
    """,
    doc="Blocked Jaccard similarity join with exact int set arithmetic (training-data dedup).",
)
def d18_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inverted-index formulation: pairs materialize ONLY through shared
    # (source, word) postings — a pair with zero common words never exists,
    # and a pair with inter=0 cannot pass inter*2 > uni, so this is exactly
    # equivalent to the all-pairs oracle while scaling as O(sum of posting-
    # list squares) instead of O(block² · |doc|).  This is the 100 TB shape:
    # the shuffle keys on (source, word), AQE splits skewed hub words.
    docs = _t(spark, sf_dir, "documents")
    words = _words(docs).join(docs.select("doc_id", "source"), "doc_id")
    # df-threshold prefilter (r13, guide §2.2 — shuffle fewer bytes): a
    # token held by ONE document of its source block joins only with
    # itself, and doc_a < doc_b kills the self-pair — so df=1 tokens
    # contribute NOTHING to `inter` and are dropped before the pair join.
    # Word frequencies are Zipf: most of the vocabulary is df=1, so the
    # posting self-join input shrinks by that whole tail.  Exactness:
    # every (source, w) row of a SHARED token survives (df counts distinct
    # docs — `words` is distinct per (doc_id, w)), so per-pair intersection
    # counts are unchanged; `uni` uses per-doc sizes over the UNFILTERED
    # words, as before.
    multi = (
        words.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("source", "w")
    )
    shared = words.join(multi, ["source", "w"], "left_semi")
    wa = shared.select(F.col("doc_id").alias("doc_a"), "w", "source")
    wb = shared.select(F.col("doc_id").alias("doc_b"), "w", "source")
    inter = (
        wa.join(wb, ["w", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("uni", (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("bigint"))
        .withColumn("inter", F.col("inter").cast("bigint"))
        .filter(F.col("inter") * 2 > F.col("uni"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "uni",
            (F.col("inter").cast("double") / F.col("uni").cast("double")).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# D19 — prefix-filtered exact Jaccard join (AllPairs/PPJoin family:
# Bayardo et al. WWW'07, Xiao et al. WWW'08 — public algorithms).  Same
# semantics and ORACLE as D18, different candidate generation: tokens are
# ordered by ascending document frequency (one fixed (df, w) order per
# source, applied per doc — no global rank materialized) and a pair can
# only materialize through a shared token in both docs' PREFIXES
# (|x| - ceil(t·|x|) + 1 rarest tokens).  Hub words — the residual skew
# risk of D18's full posting-list join — sit at the END of the order and
# almost never in a prefix, so the candidate shuffle is bounded by
# rare-token posting lists.  Exact, not approximate: any pair with
# J > 0.5 must share a prefix token, so verification over full word sets
# loses nothing.
# ---------------------------------------------------------------------------
@register(
    "D19_prefix_filtered_jaccard",
    f"""
    WITH {_WORDS_SQL},
    ws AS (SELECT doc_id, list_sort(list(w)) AS wset, COUNT(*) AS n FROM words GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(wa.wset, wb.wset)) AS inter,
             wa.n + wb.n - len(list_intersect(wa.wset, wb.wset)) AS uni
      FROM documents a
      JOIN documents b ON a.source = b.source AND a.doc_id < b.doc_id
      JOIN ws wa ON wa.doc_id = a.doc_id
      JOIN ws wb ON wb.doc_id = b.doc_id
    )
    SELECT doc_a, doc_b, inter, uni,
           CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
    FROM pairs
    WHERE inter * 2 > uni
    ORDER BY doc_a, doc_b
    """,
    doc="Exact Jaccard join via document-frequency prefix filtering — hub-word-immune candidate generation.",
)
def d19_prefix_filtered_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = 0.5
    docs = _t(spark, sf_dir, "documents")
    words = _words(docs).join(docs.select("doc_id", "source"), "doc_id")

    # The prefix filter needs ONE fixed total token order per blocking
    # source (ascending document frequency, ties by word — rare first),
    # but no doc ever compares tokens across sources, so the order is
    # consumed entirely INSIDE per-doc windows: join each token's df and
    # sort by (df, w) per doc_id.  The former per-source row_number over
    # the whole vocabulary (the round-10 weak finding: one task sorting
    # the biggest source's ~10⁹-token vocabulary at 100 TB) is GONE, not
    # salted — a df-derived range_class would degenerate anyway (df is
    # Zipf: most of any vocabulary sits at df=1, i.e. in one class).  The
    # only row windows left are doc_id-partitioned — bounded by document
    # length (plan-pinned in tests/test_plan_shapes.py).
    tok_df = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("df"))
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    wpos = (
        words.join(tok_df, ["source", "w"])
        .withColumn("pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "w")))
        .join(sizes, "doc_id")
    )
    # prefix = |x| - ceil(t*|x|) + 1 rarest tokens of each doc
    pref = wpos.filter(F.col("pos") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1)
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), "w", "source")
        .join(pref.select(F.col("doc_id").alias("doc_b"), "w", "source"), ["w", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    # verification: exact intersection over FULL word sets, candidates only
    wa = words.select(F.col("doc_id").alias("doc_a"), "w", "source")
    wb = words.select(F.col("doc_id").alias("doc_b"), "w", "source")
    inter = (
        wa.join(wb, ["w", "source"])
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("uni", (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("bigint"))
        .withColumn("inter", F.col("inter").cast("bigint"))
        .filter(F.col("inter") * 2 > F.col("uni"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "uni",
            (F.col("inter").cast("double") / F.col("uni").cast("double")).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# A8 — processing report: global conditional tallies with percentages
# (reference: preprocess report, oc_meta/run/meta/preprocess_input.py:211-266).
# ---------------------------------------------------------------------------
@register(
    "A8_processing_report",
    """
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pct_en,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    """,
    doc="Single-row conditional tally report (SURVEY A8/A6).",
)
def a8_processing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_en = F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_en.cast("bigint").alias("n_en"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0)).cast("bigint").alias("n_long"),
        (n_en.cast("double") / F.count(F.lit(1))).alias("pct_en"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# D20 — SimHash near-dup JOIN: band the 64-bit signature into 4×16-bit
# blocks, generate candidates that share ≥1 identical band, then verify by
# exact Hamming distance at radius 3.  Pigeonhole: ≤3 differing bits can
# touch at most 3 of the 4 bands, so every radius-3 pair collides in some
# band — exact recall.  Block-then-verify — never all-pairs — the same
# 100 TB shape as D16/D18/D19.
# ---------------------------------------------------------------------------

_D20_SIG_SQL = f"""
    {_WORDS_SQL},
    wh AS (SELECT doc_id, substr(md5(w), 1, 16) AS h FROM words),
    bits AS (
      SELECT doc_id, i, j,
             ((strpos('0123456789abcdef', substr(h, CAST(i AS INT) + 1, 1)) - 1) >> CAST(j AS INT)) & 1 AS bit
      FROM wh
      CROSS JOIN (SELECT unnest(range(16)) AS i)
      CROSS JOIN (SELECT unnest(range(4)) AS j)
    ),
    votes AS (
      SELECT doc_id, i, j, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
      FROM bits GROUP BY doc_id, i, j
    ),
    nibbles AS (
      SELECT doc_id, i,
             SUM(CASE WHEN v > 0 THEN (1 << CAST(j AS INT)) ELSE 0 END) AS nib
      FROM votes GROUP BY doc_id, i
    ),
    sig AS (
      SELECT doc_id,
             string_agg(substr('0123456789abcdef', CAST(nib AS INT) + 1, 1), '' ORDER BY i) AS simhash
      FROM nibbles GROUP BY doc_id
    )
"""


@register(
    "D20_simhash_hamming_neardup",
    f"""
    WITH {_D20_SIG_SQL},
    bands AS (
      SELECT doc_id, simhash, b, substr(simhash, CAST(b AS INT) * 4 + 1, 4) AS bv
      FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                      x.simhash AS sa, y.simhash AS sb
      FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
    ),
    ham AS (
      SELECT doc_a, doc_b,
             CAST(SUM(bit_count(xor(
               strpos('0123456789abcdef', substr(sa, CAST(i AS INT) + 1, 1)) - 1,
               strpos('0123456789abcdef', substr(sb, CAST(i AS INT) + 1, 1)) - 1
             ))) AS BIGINT) AS hamming
      FROM cand CROSS JOIN (SELECT unnest(range(16)) AS i)
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, hamming FROM ham
    WHERE hamming <= 3 ORDER BY doc_a, doc_b
    """,
    doc="Banded SimHash near-dup join: 4×16-bit blocking + exact Hamming verify (training-data dedup).",
)
def d20_simhash_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _simhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.expr("sequence(0, 3)")).alias("b"),
    ).withColumn("bv", F.expr("substr(simhash, b * 4 + 1, 4)"))
    x = bands.select(
        F.col("b"), F.col("bv"), F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa")
    )
    y = bands.select(
        F.col("b"), F.col("bv"), F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb")
    )
    cand = (
        x.join(y, ["b", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.expr(
        "aggregate(sequence(0, 15), 0, (acc, i) -> acc + bit_count("
        "(instr('0123456789abcdef', substr(sa, i + 1, 1)) - 1) ^ "
        "(instr('0123456789abcdef', substr(sb, i + 1, 1)) - 1)))"
    ).cast("bigint")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# D21 — near-dup CLUSTER COLLAPSE: the deletion step of a training-data
# dedup pipeline.  D16's banded-LSH candidate pairs are symmetrized into an
# undirected graph, connected components assign a cluster per document, and
# the minimum doc_id in each cluster survives — everything else is marked
# for deletion.  This is what MinHash dedup actually SHIPS: an assignment
# table (doc → cluster, kept?) that a filter join applies to the corpus.
# Scale shape: pair list is O(near-dups), never O(N²); CC is min-label +
# pointer jumping (O(log diameter) rounds); the collapse is one groupBy.
# ---------------------------------------------------------------------------
@register(
    "D21_neardup_cluster_collapse",
    f"""
    WITH RECURSIVE {_SHINGLES_SQL},
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
    comp AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node)
    SELECT doc_id, cluster, doc_id = cluster AS kept,
           COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
    FROM comp ORDER BY doc_id
    """,
    doc="Near-dup cluster collapse: LSH pairs → connected components → one survivor per cluster (training-data dedup deletion step).",
)
def d21_neardup_cluster_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.operators.cc import connected_components

    pairs = d16_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs, src="doc_a", dst="doc_b", local_threshold=0)
    comp = labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster"))
    sizes = comp.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "cluster")
        .select(
            "doc_id",
            "cluster",
            (F.col("doc_id") == F.col("cluster")).alias("kept"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# D22 — the reference's full bibliographic matching score
# (compute_matching_score, lib/bibliographic_matching.py:185-259; weights
# 7·first_author + 14·title + 5·source + 14·other) through the production
# expression kernel in functions/matching.py, with candidate fields
# synthesized to exercise every branch: empty families/titles, matching and
# non-matching initials, the ISSN shortcut, the length-adjusted venue
# similarity floor, and each of the five 'other' components.  Top-1
# candidate per left record by score (deterministic tie-break).
# ---------------------------------------------------------------------------
@register(
    "D22_bibliographic_match_score",
    """
    WITH pairs AS (
      SELECT s.s_suppkey, c.c_custkey,
             s.s_name AS fam_a, c.c_name AS fam_b,
             CAST(s.s_suppkey % 97 AS VARCHAR) AS giv_a, CAST(c.c_custkey % 97 AS VARCHAR) AS giv_b,
             CASE WHEN s.s_suppkey % 5 = 0 THEN '' ELSE s.s_name || ' t' END AS tit_a,
             CASE WHEN c.c_custkey % 7 = 0 THEN '' ELSE c.c_name || ' t' END AS tit_b,
             substr(s.s_name, 1, 12) AS ven_a, substr(c.c_name, 1, 10) AS ven_b,
             CASE WHEN s.s_suppkey % 2 = 0 THEN CAST(s.s_nationkey AS VARCHAR) ELSE '' END AS issn_a,
             CASE WHEN c.c_custkey % 3 = 0 THEN CAST(c.c_nationkey AS VARCHAR) ELSE '' END AS issn_b,
             CAST(s.s_suppkey % 5 AS VARCHAR) AS yr_a, CAST(c.c_custkey % 5 AS VARCHAR) AS yr_b,
             CAST(s.s_suppkey % 4 AS VARCHAR) AS vol_a, CAST(c.c_custkey % 4 AS VARCHAR) AS vol_b,
             CAST(s.s_suppkey % 3 AS VARCHAR) AS iss_a, CAST(c.c_custkey % 3 AS VARCHAR) AS iss_b,
             CAST(s.s_suppkey % 9 AS VARCHAR) AS sp_a, CAST(c.c_custkey % 9 AS VARCHAR) AS sp_b,
             CAST(s.s_suppkey % 11 AS VARCHAR) AS ep_a, CAST(c.c_custkey % 11 AS VARCHAR) AS ep_b
      FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey
      WHERE s.s_suppkey <= 50
    ),
    scored AS (
      SELECT s_suppkey, c_custkey,
        7.0 * (CASE WHEN fam_a = '' OR fam_b = '' THEN 0.0 ELSE
                 0.8 * (1.0 - CAST(levenshtein(fam_a, fam_b) AS DOUBLE)
                              / CAST(greatest(length(fam_a), length(fam_b)) AS DOUBLE))
                 + (CASE WHEN substr(lower(giv_a), 1, 1) <> '' AND substr(lower(giv_b), 1, 1) <> ''
                              AND substr(lower(giv_a), 1, 1) = substr(lower(giv_b), 1, 1)
                         THEN 0.2 ELSE 0.0 END) END)
        + 14.0 * (CASE WHEN tit_a = '' OR tit_b = '' THEN 0.0 ELSE
                    1.0 - CAST(levenshtein(tit_a, tit_b) AS DOUBLE)
                          / CAST(greatest(length(tit_a), length(tit_b)) AS DOUBLE) END)
        + 5.0 * (CASE WHEN issn_a <> '' AND issn_a = issn_b THEN 1.0
                      WHEN ven_a = '' OR ven_b = '' THEN 0.0
                      ELSE greatest(1.0 - (CAST(levenshtein(ven_a, ven_b) AS DOUBLE)
                                           - CAST(abs(length(ven_a) - length(ven_b)) AS DOUBLE))
                                          / CAST(least(length(ven_a), length(ven_b)) AS DOUBLE), 0.0) END)
        + 14.0 * ((CASE WHEN yr_a <> '' AND yr_a = yr_b THEN 0.1 ELSE 0.0 END)
                + (CASE WHEN vol_a <> '' AND vol_a = vol_b THEN 0.2 ELSE 0.0 END)
                + (CASE WHEN iss_a <> '' AND iss_a = iss_b THEN 0.1 ELSE 0.0 END)
                + (CASE WHEN sp_a <> '' AND sp_a = sp_b THEN 0.3 ELSE 0.0 END)
                + (CASE WHEN ep_a <> '' AND ep_a = ep_b THEN 0.3 ELSE 0.0 END)) AS score
      FROM pairs
    )
    SELECT s_suppkey AS suppkey, c_custkey AS custkey, round(score, 9) AS score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY s_suppkey
                                       ORDER BY round(score, 9) DESC, c_custkey) AS rn FROM scored)
    WHERE rn = 1 ORDER BY suppkey
    """,
    doc="Full 7/14/5/14 bibliographic matching score (first-author/title/source/other) with top-1 candidate per record.",
)
def d22_bibliographic_match_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from oc_meta_spark.functions.matching import matching_score

    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 50)
    c = _t(spark, sf_dir, "customer")
    p = s.join(c, s.s_nationkey == c.c_nationkey)
    a = {
        "family": F.col("s_name"),
        "given": (F.col("s_suppkey") % 97).cast("string"),
        "title": F.when(F.col("s_suppkey") % 5 == 0, "").otherwise(
            F.concat(F.col("s_name"), F.lit(" t"))
        ),
        "venue": F.substring("s_name", 1, 12),
        "issn": F.when(F.col("s_suppkey") % 2 == 0, F.col("s_nationkey").cast("string")).otherwise(""),
        "year": (F.col("s_suppkey") % 5).cast("string"),
        "volume": (F.col("s_suppkey") % 4).cast("string"),
        "issue": (F.col("s_suppkey") % 3).cast("string"),
        "start_page": (F.col("s_suppkey") % 9).cast("string"),
        "end_page": (F.col("s_suppkey") % 11).cast("string"),
    }
    b = {
        "family": F.col("c_name"),
        "given": (F.col("c_custkey") % 97).cast("string"),
        "title": F.when(F.col("c_custkey") % 7 == 0, "").otherwise(
            F.concat(F.col("c_name"), F.lit(" t"))
        ),
        "venue": F.substring("c_name", 1, 10),
        "issn": F.when(F.col("c_custkey") % 3 == 0, F.col("c_nationkey").cast("string")).otherwise(""),
        "year": (F.col("c_custkey") % 5).cast("string"),
        "volume": (F.col("c_custkey") % 4).cast("string"),
        "issue": (F.col("c_custkey") % 3).cast("string"),
        "start_page": (F.col("c_custkey") % 9).cast("string"),
        "end_page": (F.col("c_custkey") % 11).cast("string"),
    }
    w = Window.partitionBy("s_suppkey").orderBy(F.col("score").desc(), F.col("c_custkey"))
    return (
        # round(…, 9) canonicalizes the last float ulp: the two engines may
        # associate the four weighted terms differently at compile time
        p.withColumn("score", F.round(matching_score(a, b), 9))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("s_suppkey").alias("suppkey"), F.col("c_custkey").alias("custkey"), "score")
        .orderBy("suppkey")
    )
