"""Corpus retrieval: keyword search over the document corpus — the
"find the training examples about X" tool of corpus inspection, and the
missing sibling of the embedding-space searches (X2/X3/X5).

**IR1** is TF-IDF ranked boolean retrieval (Robertson & Spärck Jones
1976 lineage, public literature): score(d) = Σ_t tf(d,t) · idf(t) over
the query terms, top-k documents returned with their rank.  The
classical ``log(N/df)`` idf is replaced by the RATIONAL weight
``(1000·N) div df`` — same monotone rare-terms-win ordering, integer
end to end, so Spark and DuckDB rank identically (the T7/PX1
determinism doctrine: never let a libm transcendental near a hash-
compared value).  Ties break on doc_id.

Scale shape (100 TB): the postings build is one explode + a LITERAL
term filter (the query is tiny) + a (doc, term) hash agg; df is a
term-keyed agg over the postings (query-cardinality rows, broadcast
back); the top-k is ``orderBy().limit(k)`` — Spark's
``TakeOrderedAndProject``, a per-partition heap + driver merge, never a
global sort; the rank column is a window over the ALREADY-TAKEN k rows
(k-bounded, the MX4 dimension-window argument).

**IR2** is the standing-service form: the (term, doc_id, tf) postings
persist as a term-hash-partitioned inverted index
(plans/postings_index.py — the signature/IVF store contract), built once
and nightly-extended; each query probe-prunes to its own terms' files
instead of re-exploding the corpus.  Its oracle is IR1's SQL verbatim,
so the gate pins extend≡rebuild at the value level.

No reference counterpart (the reference looks entities up by exact
identifier, never by ranked text relevance); the closest analog is the
finder's id→entity lookup (oc_meta/lib/finder.py), which X-family and
J-family already generalize.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

_IR1_TERMS = ("vector", "merge", "window")
_IR1_K = 10
_IR1_TERMS_SQL = ", ".join(f"'{t}'" for t in _IR1_TERMS)

# IR1's full scoring SQL — shared verbatim by IR2, whose persisted-index
# build-then-extend path must reproduce the from-scratch ranking exactly
# (the PX_SCORING_CTES discipline: one rendering per shared contract)
_IR1_ORACLE = f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (
      SELECT doc_id, w AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w IN ({_IR1_TERMS_SQL})
      GROUP BY doc_id, w
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             SUM(tf.tf * ((1000 * n.n_docs) // df.df)) AS score,
             COUNT(*) AS n_terms_hit
      FROM tf JOIN df USING (term) CROSS JOIN n
      GROUP BY tf.doc_id
    ),
    rk AS (
      SELECT doc_id, score, n_terms_hit,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(score AS BIGINT) AS score,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit, CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= {_IR1_K} ORDER BY rank
"""


@register(
    "IR1_keyword_search_topk",
    _IR1_ORACLE,
    doc="TF-IDF keyword search: rational idf weights (integer-exact cross-engine), per-doc term-frequency scoring, top-k via TakeOrderedAndProject — ranked text retrieval over the corpus.",
)
def ir1_keyword_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(*_IR1_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df via a term-partitioned window over the ONE tf pass (r12): tf is
    # unique per (doc_id, term) (the groupBy above), so COUNT(*) per term
    # ≡ COUNT(DISTINCT doc_id).  The former separate-aggregate shape
    # referenced tf twice, and each reference re-ran the full corpus
    # explode — two corpus scans per query; now one, plus a
    # query-cardinality window exchange (same rows the old df aggregate
    # already shuffled).  Same rewrite as search_postings.
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_term))
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.expr("(1000 * n_docs) div df")).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    # TakeOrderedAndProject takes the k rows; the rank window then runs
    # over those k rows only (k-bounded, never the corpus)
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(_IR1_K)
    w = Window.partitionBy().orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("long").alias("score"),
        F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        "rank",
    )


# ---------------------------------------------------------------------------
# IR2 — the PERSISTED form of IR1: build the term-bucketed postings index
# on a founding slice (doc_id % 10 != 0), extend it with the rest (the
# nightly append), search the extended index.  The oracle is IR1's SQL
# over the FULL corpus verbatim — so the gate pins extend≡rebuild AND the
# probe-pruned search in one value-level check: if the append missed or
# doubled a posting, or the probe dropped one, a tf/df/N would shift and
# the ranking hash would diverge.  Store persistence, the static partition
# filters on tp, retry idempotency, and the layout guard are pinned by
# tests/test_postings_index.py (the gate runs the in-memory composition —
# same plan shapes minus the parquet round-trip).
# ---------------------------------------------------------------------------


@register(
    "IR2_persisted_postings_search",
    _IR1_ORACLE,
    doc="Persisted inverted-index search: term-bucketed postings built on a founding slice and nightly-extended with the delta must reproduce IR1's from-scratch ranking exactly (extend≡rebuild, probed-partition df).",
)
def ir2_persisted_postings_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.postings_index import (
        build_postings_index,
        extend_postings_index,
        search_postings,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    founding = build_postings_index(docs.filter(F.col("doc_id") % 10 != 0))
    extended = extend_postings_index(founding, docs.filter(F.col("doc_id") % 10 == 0))
    return search_postings(extended, list(_IR1_TERMS), _IR1_K)

