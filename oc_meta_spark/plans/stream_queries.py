"""Oracle-gated entries for the event-stream operators (SURVEY §2.9).

Both run the BOUNDED path of the streaming operators in
:mod:`oc_meta_spark.streaming.windowed` — the plan is identical to the
``readStream`` path (same function); the streaming sink semantics are
covered by tests/test_streaming_windowed.py, and the value semantics are
gated here against DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# ST1 — watermarked tumbling-window aggregation (bounded = plain windowed
# groupBy; the stream path adds the watermark, tests prove both agree).
# ---------------------------------------------------------------------------
@register(
    "ST1_windowed_event_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
    doc="Tumbling event-time windows + watermark on the stream path (§2.9 windowed agg).",
)
def st1_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.streaming.windowed import windowed_event_counts

    ev = load_table(spark, "events", sf_dir)
    return (
        windowed_event_counts(ev)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# ST2 — gap-based sessionization (applyInPandasWithState on the stream
# path; lag + cumulative session ids on the bounded path — same contract).
# ---------------------------------------------------------------------------
@register(
    "ST2_sessionization",
    """
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    s AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="Gap-based sessions; custom stateful operator on the stream path (§2.9 applyInPandasWithState).",
)
def st2_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.streaming.windowed import sessionize

    ev = load_table(spark, "events", sf_dir)
    return (
        sessionize(ev, gap_minutes=30)
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# ST3 — streaming exact dedup (dropDuplicatesWithinWatermark on the stream
# path — bounded state; plain dropDuplicates on the bounded path).  The
# gate feeds an at-least-once-style input: every tenth event is delivered
# twice, and dedup must return the original event set exactly.
# ---------------------------------------------------------------------------
@register(
    "ST3_stream_dedup",
    """
    WITH feed AS (
      SELECT event_id, event_type, ts, value FROM events
      UNION ALL
      SELECT event_id, event_type, ts, value FROM events WHERE event_id % 10 = 0
    )
    SELECT DISTINCT event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM feed ORDER BY event_id
    """,
    doc="Exact dedup of an at-least-once feed; bounded-state dropDuplicatesWithinWatermark on the stream path (§2.9).",
)
def st3_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.streaming.windowed import dedup_events

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "ts", "value")
    feed = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return (
        dedup_events(feed)
        .select(
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.col("value").cast("decimal(18,4)").cast("double").alias("value"),
        )
        .orderBy("event_id")
    )
