"""Persisted domain-reputation stats: persistence round-trip, additive
extend ≡ rebuild, replay-doubling guard, layout guard, retroactive-dup
property, and verdict equality with DR1's full rescan.

(The gate-vs-oracle equality for DR1/DR2 runs in test_correctness.py like
every registered gate; these pin what an SQL oracle can't — filesystem
persistence and the append contract.)
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.domain_stats import (
    build_domain_stats,
    extend_domain_stats,
    read_domain_stats,
    reputation_from_stats,
    write_domain_stats,
)
from oc_meta_spark.sources.tables import load_table

FLOOR = 380


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from oc_meta_spark.plans.quality_queries import _dr_domain

    return load_table(spark, "documents", sf_dir).select(
        "doc_id", _dr_domain().alias("domain"), "text"
    )


def _verdicts(df):
    return sorted(tuple(r) for r in df.collect())


def test_reputation_from_stats_equals_full_rescan(spark, docs, sf_dir):
    """The store's derived verdicts must equal DR1's document-scanning
    rollup on the same corpus."""
    from oc_meta_spark.plans.registry import load_all

    got = _verdicts(reputation_from_stats(build_domain_stats(docs), FLOOR))
    want = _verdicts(load_all()["DR1_domain_reputation"].builder(spark, sf_dir))
    assert got == want and len(got) > 0


def test_domain_stats_persist_round_trip(spark, docs):
    stats = build_domain_stats(docs)
    mem = _verdicts(reputation_from_stats(stats, FLOOR))
    tmp = tempfile.mkdtemp(prefix="domstats_")
    try:
        write_domain_stats(stats, tmp)
        assert any(
            d.startswith("pp=") for d in os.listdir(os.path.join(tmp, "prefix_domain"))
        )
        loaded = read_domain_stats(spark, tmp)
        got = _verdicts(reputation_from_stats(loaded, FLOOR))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == mem


def test_domain_stats_layout_guard(spark, docs):
    stats = build_domain_stats(docs.limit(20))
    tmp = tempfile.mkdtemp(prefix="domstats_meta_")
    try:
        write_domain_stats(stats, tmp)
        read_domain_stats(spark, tmp)  # matching layout loads fine
        spark.createDataFrame([("old_v0",)], schema="layout string").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "meta"))
        with pytest.raises(ValueError, match="layout=old_v0"):
            read_domain_stats(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_extend_domain_stats_equals_rebuild_and_never_doubles(spark, docs):
    founding = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    extended = extend_domain_stats(build_domain_stats(founding), delta)
    rebuilt = build_domain_stats(docs)

    def drows(s):
        return sorted(tuple(r) for r in s.domain_stats.collect())

    def prows(s):
        return sorted(tuple(r) for r in s.prefix_domain.collect())

    assert drows(extended) == drows(rebuilt)
    assert prows(extended) == prows(rebuilt)

    # replayed night: additive counts must NOT double
    again = extend_domain_stats(extended, delta)
    assert drows(again) == drows(extended)
    assert prows(again) == prows(extended)
    assert again.docs.count() == docs.count()

    # r13 merge shape: ONE full-outer equi-join per table — the store and
    # the delta are each referenced exactly once (no semi probe + anti
    # complement double scan, no re-aggregation union).  The only anti
    # join left is the fresh_only doc-witness guard (broadcast); the
    # merge join must be keyed, never a nested-loop.
    plan = extended.domain_stats._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan, plan[:2000]
    probes = [ln for ln in plan.splitlines() if "LeftAnti" in ln or "LeftSemi" in ln]
    assert all("BroadcastHashJoin" in ln for ln in probes), plan[:2000]
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:2000]


def test_retroactive_dup_charges_founding_holder(spark):
    """The corpus-global dup rule under growth: a prefix whose SECOND
    copy arrives only in the delta must flip the FOUNDING holder's doc to
    duplicated too — the store derives dup from counts, never freezes it
    at build time."""
    prefix = "alpha beta gamma delta epsilon"
    founding = spark.createDataFrame(
        [(1, "a.org", prefix + " unique founding tail words here")],
        schema="doc_id long, domain string, text string",
    )
    delta = spark.createDataFrame(
        [(2, "b.org", prefix + " different delta tail words there")],
        schema="doc_id long, domain string, text string",
    )
    extended = extend_domain_stats(build_domain_stats(founding), delta)
    rep = {r["domain"]: (r["n_docs"], r["n_dup_docs"], r["verdict"])
           for r in reputation_from_stats(extended, FLOOR).collect()}
    # both domains' single docs share the 5-word prefix → both charged
    assert rep["a.org"][1] == 1 and rep["b.org"][1] == 1
    assert rep["a.org"][2] == "quarantine" and rep["b.org"][2] == "quarantine"


def test_materialized_domain_stats_equals_build(spark):
    """The fold-bootstrap materialized build (r12) must be value-identical
    to build_domain_stats table-for-table."""
    from oc_meta_spark.plans.domain_stats import materialized_domain_stats
    from oc_meta_spark.sources.tables import load_table
    from oc_meta_spark.plans.quality_queries import _dr_domain

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", _dr_domain().alias("domain"), "text"
    )
    lazy = build_domain_stats(docs)
    mat = materialized_domain_stats(docs)
    for attr in ("domain_stats", "prefix_domain", "docs"):
        l = sorted(tuple(r) for r in getattr(lazy, attr).collect())
        m = sorted(tuple(r) for r in getattr(mat, attr).collect())
        assert l == m, f"materialized build diverged on {attr}"
