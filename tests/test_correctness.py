"""Run every registered query against its DuckDB oracle (driver-gate replica)."""

from __future__ import annotations

import pytest

from oc_meta_spark.plans.registry import load_all
from tests.oracle_harness import compare_query

_QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = _QUERIES[name]
    compare_query(spark, name, q.builder, q.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(osql) <= set(qs)


def test_dc3_detects_most_planted_pairs(spark, sf_dir):
    """The planted perturbed copies (shingle Jaccard ~0.65) must be found
    at high rate — 4x2 banding gives ~0.9 recall there; cross-noise pairs
    are killed by the exact-Jaccard verify."""
    from oc_meta_spark.plans.hygiene_queries import _DC3_OFFSET
    from oc_meta_spark.plans.registry import load_all

    rows = load_all()["DC3_fuzzy_decontamination"].builder(spark, sf_dir).collect()
    planted = sum(1 for r in rows if r.bench_id - _DC3_OFFSET == r.doc_id)
    assert planted >= 14, planted  # of 20
    for r in rows:
        assert r.jaccard >= 0.3
