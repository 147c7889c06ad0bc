"""Corpus-assembly operators for a training-data pipeline: deterministic
stratified sampling (source mixing) and token-budget packing.

These are the two steps that sit between "cleaned + deduped documents" and
"training shards": pick how much of each source to keep (mixing weights),
then pack the survivors into fixed token budgets (context windows).  Both
are pure relational plans:

- MX1 keys the keep/drop decision on a Knuth multiplicative hash of
  ``doc_id`` — deterministic, seedless, identical integer arithmetic in any
  engine, and uniformly distributed, so a per-source threshold implements
  a per-source sampling RATE with no shuffle at all (the filter is a scan
  predicate; at 100 TB it pushes down to parquet row groups).
- MX2 is one window (cumulative token count per source ordered by doc_id)
  plus integer division to assign a bin — the greedy sequential packing
  used by block-concatenation data loaders.  Partitioned by source, so the
  window parallelizes across sources; within a source Spark's range
  partitioning on the sort key keeps each partition's scan local.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# Knuth's multiplicative constant; doc_id → pseudo-uniform 32-bit value.
# doc_id is reduced modulo 2^31 BEFORE the multiply: 2^31 * 2654435761 ≈
# 5.7e18 < 2^63-1, so the product stays in int64 range in every engine.
# Unreduced, a doc_id above ~3.5e9 would overflow — Spark (non-ANSI) wraps
# silently while DuckDB raises, breaking the cross-engine determinism claim.
_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296

# mixing weights: fraction of each source to KEEP (everything else: 0.5);
# keyed to the synthetic corpus's source vocabulary (src0..src19)
_RATES = {"src0": 1.0, "src1": 0.8, "src2": 0.25, "src3": 0.1}
_DEFAULT_RATE = 0.5


def _rate_sql() -> str:
    return (
        "CASE source "
        + " ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(_RATES.items()))
        + f" ELSE {_DEFAULT_RATE} END"
    )


@register(
    "MX1_stratified_source_sample",
    f"""
    SELECT doc_id, source,
           CAST(((doc_id % {_M31}) * {_KNUTH}) % {_M32} AS DOUBLE) / {_M32} AS u
    FROM documents
    WHERE CAST(((doc_id % {_M31}) * {_KNUTH}) % {_M32} AS DOUBLE) / {_M32} < {_rate_sql()}
    ORDER BY doc_id
    """,
    doc="Deterministic per-source stratified sampling via multiplicative hash (corpus mixing weights).",
)
def mx1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    u = (((F.col("doc_id") % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)).cast(
        "double"
    ) / F.lit(_M32)
    rate = F.lit(_DEFAULT_RATE)
    for s, r in sorted(_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    return (
        docs.select("doc_id", "source", u.alias("u"))
        .filter(F.col("u") < rate)
        .orderBy("doc_id")
    )


# context-window budget in whitespace tokens
_BUDGET = 4096


@register(
    "MX2_token_budget_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tok
      FROM toks
    )
    SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(cum_tok AS BIGINT) AS cum_tok,
           CAST((cum_tok - 1) // {_BUDGET} AS BIGINT) AS bin
    FROM cum ORDER BY doc_id
    """,
    doc="Greedy token-budget packing: per-source cumulative token count cut into fixed context-window bins.",
)
def mx2_token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = toks.withColumn("cum_tok", F.sum("n_tok").over(w))
    return cum.select(
        "doc_id",
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("cum_tok").cast("long").alias("cum_tok"),
        F.floor((F.col("cum_tok") - 1) / _BUDGET).cast("long").alias("bin"),
    ).orderBy("doc_id")
