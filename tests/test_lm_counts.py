"""Persisted LM count tables: persistence round-trip, additive
extend ≡ rebuild, replay-doubling guard, layout guard, and the
shared-scorer pin (score_with_counts over full-slice counts must equal
lm_bits_scores bit for bit).

(The gate-vs-oracle equality for PX1/PX3 runs in test_correctness.py like
every registered gate; these pin what an SQL oracle can't — filesystem
persistence and the append contract.)
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.lm_counts import (
    build_lm_counts,
    extend_lm_counts,
    read_lm_counts,
    score_with_counts,
    write_lm_counts,
)
from oc_meta_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")


@pytest.fixture(scope="module")
def train(docs):
    return docs.filter(F.col("lang") == "en").select("doc_id", "text")


def _scores(df):
    return sorted(
        (r["doc_id"], r["n_bigrams"], r["total_bits"], r["milli_bits"])
        for r in df.collect()
    )


def test_score_with_counts_is_the_px1_scorer(spark, docs, train):
    """The shared-scorer contract across IMPLEMENTATIONS: scoring against
    counts built from the full reference slice must equal lm_bits_scores
    (which trains inline) on every document, bit for bit."""
    from oc_meta_spark.plans.quality_queries import lm_bits_scores

    counts = build_lm_counts(train)
    got = _scores(score_with_counts(docs, counts))
    want = _scores(lm_bits_scores(docs))
    assert got == want and len(got) > 0


def test_lm_counts_persist_round_trip(spark, docs, train):
    counts = build_lm_counts(train)
    mem = _scores(score_with_counts(docs, counts))

    tmp = tempfile.mkdtemp(prefix="lmcounts_")
    try:
        write_lm_counts(counts, tmp)
        for table in ("heads", "bigrams"):
            assert any(
                d.startswith("gp=") for d in os.listdir(os.path.join(tmp, table))
            ), table
        loaded = read_lm_counts(spark, tmp)
        got = _scores(score_with_counts(docs, loaded))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == mem


def test_lm_counts_layout_guard(spark, train):
    counts = build_lm_counts(train.limit(20))
    tmp = tempfile.mkdtemp(prefix="lmcounts_meta_")
    try:
        write_lm_counts(counts, tmp)
        read_lm_counts(spark, tmp)  # matching layout loads fine
        spark.createDataFrame([("other_v9",)], schema="layout string").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "meta"))
        with pytest.raises(ValueError, match="layout=other_v9"):
            read_lm_counts(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_extend_lm_counts_equals_rebuild_and_never_doubles(spark, train):
    """Counts are additive, so append must equal rebuild EXACTLY — and
    precisely because they are additive, a replayed delta would silently
    double every touched count without the doc-level witness; the retry
    pin here is the store's whole reason to track docs."""
    founding = train.filter(F.col("doc_id") % 10 != 0)
    delta = train.filter(F.col("doc_id") % 10 == 0)

    extended = extend_lm_counts(build_lm_counts(founding), delta)
    rebuilt = build_lm_counts(train)

    def heads(c):
        return sorted(tuple(r) for r in c.heads.collect())

    def bigrams(c):
        return sorted(tuple(r) for r in c.bigrams.collect())

    assert heads(extended) == heads(rebuilt)
    assert bigrams(extended) == bigrams(rebuilt)

    # replayed night: nothing changes (no doubled counts, no new docs)
    again = extend_lm_counts(extended, delta)
    assert heads(again) == heads(extended)
    assert bigrams(again) == bigrams(extended)
    assert again.docs.count() == extended.docs.count() == train.count()

    # r13 merge shape: ONE keyed full-outer join — store and delta each
    # referenced exactly once (no semi probe + anti complement double
    # scan).  The only semi/anti joins left are the fresh_only doc-witness
    # guard (broadcast); never a nested-loop.
    plan = extended.heads._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan, plan[:2000]
    probes = [ln for ln in plan.splitlines() if "LeftAnti" in ln or "LeftSemi" in ln]
    assert all("BroadcastHashJoin" in ln for ln in probes), plan[:2000]
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:2000]


def test_materialized_lm_counts_equals_build(spark, train):
    """The fold-bootstrap materialized build (r12) must be value-identical
    to build_lm_counts table-for-table — the checkpoints may only change
    WHAT is materialized, never what is computed."""
    from oc_meta_spark.plans.lm_counts import materialized_lm_counts

    lazy = build_lm_counts(train)
    mat = materialized_lm_counts(train)
    for attr in ("heads", "bigrams", "docs"):
        l = sorted(tuple(r) for r in getattr(lazy, attr).collect())
        m = sorted(tuple(r) for r in getattr(mat, attr).collect())
        assert l == m, f"materialized build diverged on {attr}"
