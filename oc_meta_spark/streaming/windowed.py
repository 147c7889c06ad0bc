"""Event-time streaming operators: watermarked window aggregation and a
custom stateful sessionizer (SURVEY §2.9 stream shapes).

The reference's only streaming-ish construct is resumable file batching;
a 100 TB deployment also needs the event-stream shapes Spark provides
natively, expressed here over the ``events`` table schema
(event_id, ts, user_id, event_type, value, props):

- ``windowed_event_counts`` — tumbling event-time windows with a
  watermark: late events inside the watermark still update their window,
  older ones are dropped, and state is bounded (the watermark is what
  makes unbounded streams feasible — without it window state grows
  forever).
- ``sessionize`` — gap-based sessions via ``applyInPandasWithState``:
  per-user state carries (session start, last ts, count, sum) across
  micro-batches and emits a session row once the gap expires.  This is
  the custom-stateful-operator pattern for semantics windows can't
  express (data-dependent boundaries).

Both run identically over a bounded frame (tests, backfills) and a
``readStream`` source — the plan is the same; only the sink differs.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, s double"


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) counts and value sums with late-data
    tolerance ``watermark``.  On a stream this emits append-mode results
    as watermarks pass; on a bounded frame it degenerates to a plain
    windowed groupBy (same plan, total results)."""
    src = events
    if src.isStreaming:
        # watermarks require TIMESTAMP (LTZ) event time; interpreting NTZ
        # as session-local wall time keeps stream windows on the same
        # wall-clock boundaries the bounded NTZ path produces
        if dict(src.dtypes).get("ts") == "timestamp_ntz":
            src = src.withColumn("ts", F.expr("to_timestamp_ltz(ts)"))
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL(18,4) accumulation: exact and order-independent (the
            # registry determinism contract), then double on output
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            F.col("w")["end"].alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: consecutive events of a user belong to one
    session while the inter-event gap stays under ``gap_minutes``.

    Streaming path: ``applyInPandasWithState`` with a processing-time
    timeout — state per user is four scalars, emitted when the gap closes.
    Bounded path (isStreaming=False): the classic window formulation
    (lag + cumulative session ids) — same output, lets tests and backfills
    run the exact operator contract without a streaming sink.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    if not events.isStreaming:
        from pyspark.sql import Window

        # µs-since-epoch as a long; NTZ timestamps don't cast to bigint in
        # Spark 4, so diff against an epoch literal of the matching kind
        if dict(events.dtypes).get("ts") == "timestamp_ntz":
            ts_us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        else:
            ts_us = F.unix_micros(F.col("ts"))
        w = Window.partitionBy("user_id").orderBy("ts")
        with_gap = (
            events.withColumn("_ts_us", ts_us)
            .withColumn(
                "new_session",
                (
                    F.coalesce(
                        F.col("_ts_us") - F.lag("_ts_us").over(w),
                        F.lit(gap_us + 1),
                    )
                    > gap_us
                ).cast("long"),
            )
            .withColumn("session_id", F.sum("new_session").over(w))
        )
        return (
            with_gap.groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            )
            .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        )

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000 if rows["ts"].dtype.kind == "M" else rows["ts"]
        vals = rows["value"].fillna(0.0)
        if state.exists:
            start, last, n, s = state.get
        else:
            start, last, n, s = None, None, 0, 0.0
        out = []
        for t, v in zip(ts_us.astype("int64"), vals):
            if start is None:
                start, last, n, s = t, t, 1, float(v)
            elif t - last > gap_us:
                out.append((user_id, start, last, n, s))
                start, last, n, s = t, t, 1, float(v)
            else:
                last, n, s = t, n + 1, s + float(v)
        state.update((int(start), int(last), int(n), float(s)))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "sum_value": [o[4] for o in out],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each event_id
    (SURVEY D8's stream form — e.g. an at-least-once ingest feed).

    Streaming path: ``dropDuplicatesWithinWatermark`` bounds the dedup
    state to the watermark horizon — without the bound, exactly-once dedup
    state grows with the whole stream and a 100 TB feed OOMs; within the
    horizon re-deliveries (the at-least-once case) are eliminated exactly.
    Bounded path: plain dropDuplicates — same contract, total result.
    """
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    src = events
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.expr("to_timestamp_ltz(ts)"))
    return src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
