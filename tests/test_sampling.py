"""Corpus-assembly behavior tests (MX3 mixture upsampling; the MX1/MX2
plan-shape assertions live in test_plan_shapes.py, their value semantics
in the oracle gates)."""

from __future__ import annotations


def test_mx3_targets_hit_within_tolerance(spark, sf_dir):
    """MX3's achieved token count must track the weighted target: full
    epochs are exact, and the hash-sampled fractional pass is uniform, so
    the relative error is bounded by a few mean document lengths."""
    from oc_meta_spark.plans.sampling_queries import mx3_mixture_epoch_upsampling

    rows = mx3_mixture_epoch_upsampling(spark, sf_dir).collect()
    assert rows, "no sources"
    for r in rows:
        assert r.full_epochs >= 0
        assert r.target_tokens > 0
        # fractional-pass sampling error: generous 25% of the per-source
        # target at tiny SF (few docs per source), tightens with scale
        assert abs(r.achieved_tokens - r.target_tokens) <= max(
            0.25 * r.target_tokens, 2000
        ), r


def test_mx4_budget_is_exact(spark, sf_dir):
    """Largest-remainder allocation: kept docs sum to EXACTLY the budget,
    and each stratum's kept count is within 1 of its exact proportional
    share (the largest-remainder guarantee)."""
    from oc_meta_spark.plans.sampling_queries import (
        _MX4_TOTAL,
        mx4_exact_quota_stratified_sample,
    )
    from oc_meta_spark.sources.tables import load_table

    kept = mx4_exact_quota_stratified_sample(spark, sf_dir)
    rows = kept.collect()
    assert len(rows) == _MX4_TOTAL
    import collections

    per = collections.Counter(r["source"] for r in rows)
    sizes = collections.Counter(
        r["source"] for r in load_table(spark, "documents", sf_dir).select("source").collect()
    )
    total = sum(sizes.values())
    for s, c in sizes.items():
        exact = _MX4_TOTAL * c / total
        assert abs(per.get(s, 0) - exact) < 1.0


def test_range_class_spreads_for_any_id_distribution(spark):
    """The round-10 review finding: a fixed-width prefix of a 64-bit id
    ('00' for every realistic id) degenerates the salt to ONE bucket.
    range_class anchors at the observed min/max, so it must spread both
    sequential ids AND offset-clustered ids, stay order-preserving, and
    respect the bucket cap."""
    import pyspark.sql.functions as F

    from oc_meta_spark.plans.rank_refine import range_class

    seq = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    offset = spark.range(10**12, 10**12 + 1000).select(F.col("id").alias("doc_id"))
    for frame in (seq, offset):
        rows = sorted(
            (r["doc_id"], r["rb"])
            for r in range_class(frame, "doc_id").collect()
        )
        buckets = {b for _, b in rows}
        assert len(buckets) > 100, len(buckets)  # genuinely spread
        assert len(buckets) <= 256
        # nondecreasing in the key — a valid rank-decomposition prefix
        assert [b for _, b in rows] == sorted(b for _, b in rows)
