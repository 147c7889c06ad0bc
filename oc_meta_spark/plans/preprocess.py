"""Input preprocessing — the reference's second entry point (SURVEY §3.2,
run/meta/preprocess_input.py): drop rows whose identifiers ALL already
exist in the store (F5), full-row dedup across all input files (D8), and
a processing report (A8).  The reference fans this across a process pool
with Redis probes or batched SPARQL VALUES queries; here the existing-id
set is a DataFrame and the filter is one join — the whole tool is three
relational steps over any number of input files.

Chunked output (S3) stays with the caller: ``kept`` writes through
sources/export.py's maxRecordsPerFile sink.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class PreprocessResult:
    kept: DataFrame
    report: DataFrame  # single row: totals + percentages


def preprocess(input_df: DataFrame, existing_ids: DataFrame | None = None) -> PreprocessResult:
    """``existing_ids``: one string column ``id`` of ``schema:value``
    tokens already in the store (the Redis membership set, SURVEY S13).

    A row is dropped iff it HAS identifiers and every one of them is in
    the existing set (reference filter_sparql_results,
    preprocess_input.py:179-193 — id-less rows always pass); survivors are
    full-row deduplicated (seen_rows, :150-153, 207-227).
    """
    spark = input_df.sparkSession
    df = input_df.withColumn("__row", F.monotonically_increasing_id())
    total = df.count()

    if existing_ids is not None:
        toks = df.select(
            "__row",
            F.explode(F.split(F.trim(F.coalesce(F.col("id"), F.lit(""))), r"\s+")).alias("tok"),
        ).filter(F.col("tok") != "")
        found = toks.join(
            existing_ids.select(F.col("id").alias("tok")).dropDuplicates(), "tok", "left_semi"
        )
        per_row = toks.groupBy("__row").agg(F.count(F.lit(1)).alias("n_tok"))
        per_row = per_row.join(
            found.groupBy("__row").agg(F.count(F.lit(1)).alias("n_found")), "__row", "left"
        ).withColumn("n_found", F.coalesce("n_found", F.lit(0)))
        all_exist = per_row.filter(F.col("n_tok") == F.col("n_found")).select("__row")
        df = df.join(all_exist, "__row", "left_anti")
    after_filter = df.count()

    kept = df.drop("__row").dropDuplicates()
    written = kept.count()

    existing_rows = total - after_filter
    dup_rows = after_filter - written
    pct = lambda n: F.round(F.lit(100.0 * n / total) if total else F.lit(0.0), 2)
    report = spark.range(1).select(
        F.lit(total).alias("total_rows"),
        F.lit(existing_rows).alias("existing_ids_rows"),
        F.lit(dup_rows).alias("duplicate_rows"),
        F.lit(written).alias("written_rows"),
        pct(existing_rows).alias("existing_pct"),
        pct(dup_rows).alias("duplicate_pct"),
        pct(written).alias("written_pct"),
    )
    return PreprocessResult(kept=kept, report=report)
