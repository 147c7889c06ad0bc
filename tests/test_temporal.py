"""Temporal operator semantics: as-of tie/boundary behavior and interval
join bucket-boundary correctness (the oracle gates AS1/RJ1 check values
at corpus scale; these pin the edge cases on hand-built frames)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from oc_meta_spark.operators.temporal import asof_join, interval_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_backward_inclusive_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(5)), (3, 20, _ts(30))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(5), 100, 1.0),   # exactly at left ts -> inclusive
            (10, _ts(5), 101, 2.0),   # tie on ts -> greater r_id wins
            (10, _ts(9), 102, 3.0),   # latest before minute 10
            (20, _ts(31), 103, 4.0),  # after the only purchase -> no match
        ],
        "user_id long, c_ts timestamp_ntz, r_id long, r_value double",
    )
    got = {
        r.event_id: (r.r_id, r.r_value)
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="c_ts",
            payload=["r_id", "r_value"], tiebreak="r_id",
        ).collect()
    }
    assert got[1] == (102, 3.0)
    assert got[2] == (101, 2.0)  # inclusive boundary, max-id tie-break
    assert got[3] == (None, None)


def test_asof_null_payload_is_atomic(spark):
    # Regression pin for the round-4 struct-packing fix: the as-of match
    # must take the latest right ROW atomically (pandas merge_asof
    # semantics).  If the latest row carries a NULL payload field, the
    # left row receives that NULL — a torn per-column last(ignorenulls)
    # would backfill the field from an OLDER row instead.  AS1's bench
    # data has no NULL payloads, which is exactly how the original bug
    # stayed invisible; this hand-built frame is the only thing pinning it.
    left = spark.createDataFrame(
        [(1, 10, _ts(20))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (10, _ts(5), 100, 1.0),    # older row with a real r_value
            (10, _ts(15), 101, None),  # latest row: r_value is NULL
        ],
        "user_id long, c_ts timestamp_ntz, r_id long, r_value double",
    )
    [row] = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="c_ts",
        payload=["r_id", "r_value"], tiebreak="r_id",
    ).collect()
    assert row.r_id == 101
    assert row.r_value is None  # NOT 1.0 backfilled from r_id=100


def test_interval_join_bucket_boundaries(spark):
    # interval straddles a bucket boundary; points at both inclusive ends
    iv = spark.createDataFrame(
        [(1, _ts(9), _ts(21))],  # 12-min window with 600 s buckets -> 3 buckets
        "iid long, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    pts = spark.createDataFrame(
        [(1, _ts(9)), (2, _ts(15)), (3, _ts(21)), (4, _ts(22)), (5, _ts(8))],
        "pid long, ts timestamp_ntz",
    )
    got = sorted(
        r.pid
        for r in interval_join(
            pts, iv, point_ts="ts", start_ts="w_start", end_ts="w_end",
            bucket_seconds=720,
        ).collect()
    )
    assert got == [1, 2, 3]


def test_as1_plan_has_no_theta_join(spark):
    from oc_meta_spark.plans.registry import load_all

    plan = (
        load_all()["AS1_asof_attribution_join"]
        .builder(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point: no per-key point-in-time explosion
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "Window" in plan
    assert not ("Exchange SinglePartition" in plan and "Window" in plan.split("Exchange SinglePartition")[1][:200]), plan[:3000]


def test_rj1_plan_is_equi_join(spark):
    from oc_meta_spark.plans.registry import load_all

    plan = (
        load_all()["RJ1_incident_window_join"]
        .builder(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan[:3000]


def test_asof_matches_bruteforce_on_random_streams(spark):
    """Seeded random streams with heavy ts collisions (500-second universe
    for 300 rights) — the union+window plan must agree with the O(L·R)
    brute force, max-(ts, id) pick, everywhere."""
    import random

    rnd = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    lefts = [
        (i, rnd.randrange(5), base + dt.timedelta(seconds=rnd.randrange(500)))
        for i in range(200)
    ]
    rights = [
        (
            1000 + i,
            rnd.randrange(5),
            base + dt.timedelta(seconds=rnd.randrange(500)),
            float(i),
        )
        for i in range(300)
    ]
    left = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp_ntz")
    right = spark.createDataFrame(
        rights, "r_id long, user_id long, c_ts timestamp_ntz, r_value double"
    )
    got = {
        r.event_id: r.r_id
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="c_ts",
            payload=["r_id", "r_value"], tiebreak="r_id",
        ).collect()
    }
    for eid, key, lts in lefts:
        cands = [(ts, rid) for rid, k, ts, _ in rights if k == key and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, got[eid], want)
