"""Temporal join operators Spark lacks as primitives: as-of join and
keyless interval (range) join, built as scalable compositions.

- ``asof_join``: for each left row, the latest right row of the same key
  with ``right_ts <= left_ts`` (backward-inclusive).  NOT implemented as
  a theta-join (O(L·R) per key) but as the union+running-window form:
  tag both sides, union, one window per key ordered by (ts, side,
  tiebreak), carry the right payload forward as a single packed struct
  with ``last(ignorenulls)`` (so the payload is always one real right
  row, never a per-column mixture), keep left rows.  One shuffle on the key, one sort — the same cost as a
  sort-merge join, independent of how many right rows precede each left
  row.  (The pattern pandas ``merge_asof`` / Flink temporal joins use,
  expressed relationally.)

- ``interval_join``: pair rows with NO equi-key whose timestamp falls in
  an interval.  A raw theta-join is a cartesian product; instead the time
  axis is bucketized at the maximum interval length: intervals explode to
  the (at most 2) buckets they touch, points carry their single bucket,
  the join is an EQUI join on the bucket, and the exact containment
  predicate filters after.  Each (point, interval) pair meets in exactly
  one bucket (the point's), so no dedup is needed.  Shuffle keys on the
  bucket — time-skew (a hot bucket) salts like any hot key.

Both are deterministic under ties via an explicit tiebreak column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# tz-free epoch seconds for a TIMESTAMP_NTZ column (unix_timestamp /
# casts to TIMESTAMP route through the session timezone and lose
# monotonicity across DST folds; a plain NTZ diff does not)
def _epoch_sec(col_name: str) -> Column:
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_name})"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Backward-inclusive as-of join.

    ``right`` must carry ``key``, ``right_ts``, ``tiebreak`` and the
    ``payload`` columns; ``payload`` names must not collide with left
    columns.  Ties on ``right_ts`` resolve to the greatest ``tiebreak``.
    Left rows with no prior right row keep null payload.

    The payload travels as ONE struct column: a right row's struct is
    non-null even when individual fields are NULL, so a single
    ``last(ignorenulls)`` always returns the whole latest right row
    verbatim (NULL fields included).  Per-column fills would instead
    backfill a NULL field from an OLDER right row, producing a torn row
    that matches no real right row.
    """
    import pyspark.sql.types as T

    l_cols = left.columns
    pay_type = T.StructType([T.StructField(p, right.schema[p].dataType) for p in payload])
    lu = left.select(
        *l_cols,
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        F.lit(None).cast(pay_type).alias("_payload"),
    )
    ru = right.select(
        *[F.lit(None).cast(left.schema[c.name].dataType).alias(c.name) if c.name != key else F.col(key) for c in left.schema],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        F.col(tiebreak).alias("_tie"),
        F.struct(*payload).alias("_payload"),
    )
    u = lu.unionByName(ru)
    # rights sort before lefts at equal ts (inclusive semantics); among
    # rights, ascending tiebreak so last() picks the greatest
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *l_cols,
        F.col("_side"),
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(*l_cols, *[F.col(f"_payload.{p}").alias(p) for p in payload])
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Keyless point-in-interval join via time bucketization.

    ``bucket_seconds`` must be ≥ the maximum interval length so every
    interval touches at most two buckets.  Containment is inclusive on
    both ends.  Returns points × their containing intervals (all columns
    from both frames; names must not collide).
    """
    p = points.withColumn("_b", F.floor(_epoch_sec(point_ts) / bucket_seconds))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_epoch_sec(start_ts) / bucket_seconds),
                F.floor(_epoch_sec(end_ts) / bucket_seconds),
            )
        ),
    )
    return (
        p.join(iv, "_b")
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts)))
        .drop("_b")
    )
