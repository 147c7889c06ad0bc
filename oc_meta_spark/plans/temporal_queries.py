"""Temporal-join gates: as-of join (AS1) and keyless interval join (RJ1)
over the events table — the custom operators Spark lacks as primitives,
driven through ``operators/temporal.py``.

AS1: every purchase event joined to the user's latest click at-or-before
it (attribution — the canonical as-of use).  The Spark side runs the
union+running-window plan (one shuffle, no per-key explosion); the oracle
re-derives the same result with an explicit theta-join + row_number
(O(L·R) per user — fine for an oracle, wrong at scale, which is the
point).

RJ1: incident windows (30 minutes after each error event of user 0, a
keyless interval set) joined to every event falling inside one.  The
Spark side bucketizes time at the window length so the join is an
equi-join on the bucket; the oracle is the plain inequality join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.operators.temporal import asof_join, interval_join
from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

_RJ_WINDOW_SEC = 1800


@register(
    "AS1_asof_attribution_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT event_id AS r_id, user_id, ts AS r_ts, value AS r_value
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT l.event_id, l.user_id, l.ts, r.r_id, r.r_ts, r.r_value,
             ROW_NUMBER() OVER (
               PARTITION BY l.event_id
               ORDER BY r.r_ts DESC NULLS LAST, r.r_id DESC NULLS LAST
             ) AS rn
      FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.r_ts <= l.ts
    )
    SELECT event_id, user_id, ts, r_id, r_ts, r_value
    FROM j WHERE rn = 1 ORDER BY event_id
    """,
    doc="As-of join: each purchase attributed to the user's latest click at-or-before it (union+window plan vs theta-join oracle).",
)
def as1_asof_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    return asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="c_ts",
        payload=["r_id", "r_ts", "r_value"],
        tiebreak="r_id",
    ).orderBy("event_id")


@register(
    "RJ1_incident_window_join",
    f"""
    WITH w AS (
      SELECT event_id AS incident_id, ts AS w_start,
             ts + INTERVAL {_RJ_WINDOW_SEC} SECOND AS w_end
      FROM events WHERE event_type = 'error' AND user_id = 0
    )
    SELECT w.incident_id, e.event_id, e.user_id,
           CAST(date_diff('microsecond', w.w_start, e.ts) // 1000000 AS BIGINT) AS secs_after
    FROM w JOIN events e ON e.ts >= w.w_start AND e.ts <= w.w_end
    ORDER BY incident_id, event_id
    """,
    doc="Keyless interval join: all events inside 30-minute incident windows (bucketized equi-join plan vs inequality-join oracle).",
)
def rj1_incident_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = ev.filter((F.col("event_type") == "error") & (F.col("user_id") == 0)).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("w_start"),
        F.expr(f"ts + INTERVAL {_RJ_WINDOW_SEC} SECOND").alias("w_end"),
    )
    pts = ev.select("event_id", "user_id", "ts")
    return (
        interval_join(
            pts, w, point_ts="ts", start_ts="w_start", end_ts="w_end",
            bucket_seconds=_RJ_WINDOW_SEC,
        )
        .select(
            "incident_id",
            "event_id",
            "user_id",
            F.expr("timestampdiff(MICROSECOND, w_start, ts) div 1000000").cast("long").alias("secs_after"),
        )
        .orderBy("incident_id", "event_id")
    )
