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
