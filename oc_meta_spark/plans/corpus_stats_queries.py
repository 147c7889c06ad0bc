"""Corpus-statistics operators that replace full-corpus passes with
bounded-state computations — the "know your data without scanning twice"
tools of a 100 TB pipeline.

- **SK1** is a KMV (k-minimum-values) distinct-count sketch (Bar-Yossef
  et al. 2002, "Counting Distinct Elements in a Data Stream" — public
  paper): the k smallest md5 values of the keyed domain estimate its
  cardinality as ``(k-1) / u_k`` where ``u_k`` is the k-th minimum as a
  fraction of the hash space.  Spark's own ``approx_count_distinct`` is
  HLL++ and DuckDB's is a different sketch — they can never agree
  bitwise, which is why this gate implements the sketch RELATIONALLY:
  distinct-hash agg → global top-k (``TakeOrderedAndProject`` — the
  distributed top-k physical operator, never a full sort) → integer
  estimator on the hash's first 48 bits.  Integer end to end, so Spark
  and DuckDB agree exactly.  The domain here is distinct 3-word shingles
  (D16's kernel — the corpus-profiling question MinHash tuning actually
  asks); the gate also emits the EXACT distinct count to exhibit the
  sketch's error — production at 100 TB drops that column (it is the
  full-shuffle pass the sketch exists to avoid; the k-row sketch state
  is what a nightly profile persists).

- **VB1** is the corpus kernel of BPE tokenizer training (Sennrich et
  al. 2016, "Neural Machine Translation of Rare Words with Subword
  Units" — public paper): adjacent-symbol-pair frequencies weighted by
  word frequency — ``get_stats`` in the reference implementation — whose
  argmax is the next merge.  One round is a pure relational plan (word
  rollup → pair explosion over the DISTINCT-WORD table × frequency →
  hash agg → top-k); full training iterates it with the merge applied,
  each round this same job.  The pair table is bounded by the symbol
  alphabet squared, so its rank window is dimension-sized, never
  corpus-sized (the MX4 boundedness argument).

Scale notes (100 TB): SK1 is one distinct-hash aggregate + a k-row
top-k + scalar math — sketch state is k rows regardless of corpus size;
VB1 aggregates the corpus once into the word-vocabulary rollup and all
later work runs on vocabulary-sized tables.  No reference counterpart
(the reference profiles bibliographic CSVs, not token corpora); the
closest analog is the distinct-counting of
oc_meta/run/count/s_count_ids.py, which this generalizes to sketched
cardinality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

_SK1_K = 64
_POW48 = 281474976710656  # 2^48 — the estimator's hash-prefix space


@register(
    "SK1_kmv_distinct_sketch",
    f"""
    WITH sh AS (
      SELECT DISTINCT md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
      FROM (SELECT ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT string_split(text, ' ') AS ws FROM documents))
    ),
    kmv AS (SELECT h FROM sh ORDER BY h LIMIT {_SK1_K}),
    kth AS (SELECT MAX(h) AS hk, COUNT(*) AS n FROM kmv),
    exact AS (SELECT COUNT(*) AS exact_distinct FROM sh)
    SELECT CAST(n AS BIGINT) AS n_kept, hk,
           CAST(CASE WHEN n < {_SK1_K} THEN n
                ELSE (n - 1) * {_POW48}
                     // CAST('0x' || substr(hk, 1, 12) AS BIGINT)
                END AS BIGINT) AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM kth CROSS JOIN exact
    """,
    doc="KMV distinct-count sketch over 3-word shingles: k smallest md5 values → integer cardinality estimator (exact below k), with the exact count alongside to exhibit the error.",
)
def sk1_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.dedup_queries import _shingles

    docs = load_table(spark, "documents", sf_dir)
    sh = _shingles(docs).select(F.md5("s").alias("h")).dropDuplicates()
    kmv = sh.orderBy("h").limit(_SK1_K)  # TakeOrderedAndProject — top-k, no full sort
    kth = kmv.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n"))
    exact = sh.agg(F.count(F.lit(1)).alias("exact_distinct"))
    est = F.when(F.col("n") < _SK1_K, F.col("n")).otherwise(
        F.expr(
            f"(n - 1) * cast({_POW48} as bigint)"
            " div cast(conv(substr(hk, 1, 12), 16, 10) as bigint)"
        )
    )
    return kth.join(F.broadcast(exact)).select(
        F.col("n").cast("long").alias("n_kept"),
        "hk",
        est.cast("long").alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


# ---------------------------------------------------------------------------
# SK2 — KMV MERGEABILITY: the property that makes the sketch a nightly
# profiling tool (SCALING's SK1 note).  KMV merge is EXACT: every one of
# the global k minima is among its own partition's k minima, so
# top-k(distinct(top-k(A) ∪ top-k(B))) == top-k(distinct(A ∪ B)) — two
# k-row sketch states union into the whole-corpus sketch with zero loss.
# The gate sketches the two doc_id-parity halves independently and merges
# the 2×k rows; the ORACLE is the direct whole-corpus sketch (SK1's SQL
# minus the exhibition exact column) — the value-level pin that the
# merged state IS the direct state (the IR2/PX3/DR2 oracle discipline).
# At 100 TB: each shard's nightly profile job persists its k-row state;
# the corpus estimate is a union + top-k over n_shards × k rows — no
# corpus re-scan, and the merge tree can nest to any depth exactly.
#
# Registers outside the driver's 50-gate window this round (the IR1/PX2
# round-9 pattern — the window is exactly full with the rotation debt);
# locally oracle-verified; rotates to the front in round 11.
# ---------------------------------------------------------------------------


@register(
    "SK2_mergeable_kmv_sketch",
    f"""
    WITH sh AS (
      SELECT DISTINCT md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
      FROM (SELECT ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT string_split(text, ' ') AS ws FROM documents))
    ),
    kmv AS (SELECT h FROM sh ORDER BY h LIMIT {_SK1_K}),
    kth AS (SELECT MAX(h) AS hk, COUNT(*) AS n FROM kmv)
    SELECT CAST(n AS BIGINT) AS n_kept, hk,
           CAST(CASE WHEN n < {_SK1_K} THEN n
                ELSE (n - 1) * {_POW48}
                     // CAST('0x' || substr(hk, 1, 12) AS BIGINT)
                END AS BIGINT) AS est_distinct
    FROM kth
    """,
    doc="KMV sketch mergeability: per-partition k-row sketch states union into the exact whole-corpus sketch — the oracle is the direct sketch, pinning the merge losslessly.",
)
def sk2_mergeable_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.dedup_queries import _shingles

    docs = load_table(spark, "documents", sf_dir)
    h = _shingles(docs).select("doc_id", F.md5("s").alias("h"))
    # two independent partition sketches (each a TakeOrderedAndProject
    # over its half's distinct hashes — k rows of state each); pmod, not
    # %, so the split provably covers ANY id domain (Spark's % is
    # sign-preserving: a negative doc_id's remainder -1 would fall into
    # neither half and its shingles would vanish from the merged sketch)
    sketches = [
        h.filter(F.pmod(F.col("doc_id"), F.lit(2)) == p)
        .select("h")
        .dropDuplicates()
        .orderBy("h")
        .limit(_SK1_K)
        for p in (0, 1)
    ]
    # ... merged: union the 2×k state rows, re-take the k minima
    merged = (
        sketches[0].unionByName(sketches[1]).dropDuplicates().orderBy("h").limit(_SK1_K)
    )
    kth = merged.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n"))
    est = F.when(F.col("n") < _SK1_K, F.col("n")).otherwise(
        F.expr(
            f"(n - 1) * cast({_POW48} as bigint)"
            " div cast(conv(substr(hk, 1, 12), 16, 10) as bigint)"
        )
    )
    return kth.select(
        F.col("n").cast("long").alias("n_kept"),
        "hk",
        est.cast("long").alias("est_distinct"),
    )


_VB1_TOP = 20

# adjacent symbol pairs of one word as substrings — no char-split edge
# semantics to reconcile across engines; guarded for 1-char words
_VB1_PAIRS = (
    "CASE WHEN length(w) >= 2 THEN "
    "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) "
    "ELSE array() END"
)


@register(
    "VB1_bpe_pair_stats",
    f"""
    WITH wf AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, freq
      FROM (SELECT w, freq, unnest(range(1, len(w))) AS i FROM wf
            WHERE len(w) >= 2)
    ),
    agg AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM pairs GROUP BY pair),
    rk AS (
      SELECT pair, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rank
      FROM agg
    )
    SELECT pair, cnt, CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= {_VB1_TOP} ORDER BY rank
    """,
    doc="BPE tokenizer-training kernel: adjacent-symbol-pair counts weighted by word frequency over the vocabulary rollup, top merge candidates ranked (count desc, pair asc).",
)
def vb1_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = wf.select(F.explode(F.expr(_VB1_PAIRS)).alias("pair"), "freq")
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("cnt"))
    # rank window over the PAIR aggregate — bounded by the symbol
    # alphabet squared, never the corpus (the MX4 boundedness argument)
    w = Window.partitionBy().orderBy(F.col("cnt").desc(), "pair")
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _VB1_TOP)
        .select("pair", "cnt", "rank")
        .orderBy("rank")
    )
