"""Deterministic contiguous id assignment without a single-task sort.

The naive ``row_number() OVER (ORDER BY ...)`` (no partition key) collapses
the whole dataset into ONE task — fine at test scale, a wall at 100 TB.
This helper produces the same contiguous 1..N ranks in three parallel steps:

1. range-partitioned sort on the order columns (``orderBy`` — parallel);
2. per-partition ``row_number`` over ``spark_partition_id()`` (parallel
   window — each partition is its own group);
3. per-partition row counts → cumulative offsets (a driver-side list of
   at most #partitions integers — the only serialized piece, O(partitions)
   not O(rows)), broadcast-joined back.

Replaces the reference's FilesystemCounterHandler single-writer counters
(oc_meta/run/meta_process.py:162-168) at scale: the *offset base* is still
a single value per (kind, prefix) — serialization the semantics require —
but the assignment work is fully distributed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def const_partition_key() -> F.Column:
    """Single-group Window partition key for DELIBERATE small-batch global
    windows.  Catalyst's ``EliminateWindowPartitions`` folds any constant
    key away (turning the window into a warned-about no-partition global
    window); the engine's session factory excludes that rule so this key
    survives and the window is an explicit one-group hash partition rather
    than an accidental global sort."""
    return F.lit(0)


def assign_contiguous_ranks(df: DataFrame, order_cols: list, rank_col: str = "mint_rank") -> DataFrame:
    """Add ``rank_col`` = deterministic contiguous 1..N following the total
    order given by ``order_cols``.  Fully parallel; one tiny driver collect
    of per-partition counts.
    """
    spark = df.sparkSession
    sorted_df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    sorted_df = sorted_df.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["n"]
        for r in sorted_df.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _poffset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        sorted_df.join(offset_df, "_pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_poffset")).cast("long"))
        .drop("_pid", "_poffset")
    )


def mint_omids(
    df: DataFrame,
    order_cols: list,
    kind: str,
    prefix: str,
    offset: int,
    omid_col: str = "omid",
    small: bool = False,
) -> DataFrame:
    """Add ``omid_col`` = ``{kind}/{prefix}{offset + rank}``.

    ``small=True`` uses a plain global-order window (zero extra jobs —
    right for micro-batches); ``small=False`` uses the fully-distributed
    rank assignment.  Both produce identical omids for the same input —
    the switch is a physical-plan choice only.
    """
    if small:
        # one-group partition key: the single-task plan the small path
        # wants, stated explicitly (see const_partition_key).
        w = Window.partitionBy(const_partition_key()).orderBy(*order_cols)
        return df.withColumn(
            omid_col,
            F.concat(F.lit(f"{kind}/{prefix}"), (F.row_number().over(w) + offset).cast("string")),
        )
    ranked = assign_contiguous_ranks(df, order_cols)
    return ranked.withColumn(
        omid_col,
        F.concat(F.lit(f"{kind}/{prefix}"), (F.col("mint_rank") + offset).cast("string")),
    ).drop("mint_rank")
