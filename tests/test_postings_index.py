"""Persisted postings (inverted) index: persistence round-trip with
dynamic partition pruning on the term hash, extend ≡ rebuild, retry
idempotency, term-less-doc N accounting, layout guard.

(The gate-vs-oracle equality for IR1/IR2 runs in test_correctness.py like
every registered gate; these pin what an SQL oracle can't — filesystem
persistence and the append contract.)
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.postings_index import (
    build_postings_index,
    extend_postings_index,
    read_postings_index,
    search_postings,
    write_postings_index,
)
from oc_meta_spark.sources.tables import load_table

TERMS = ["vector", "merge", "window"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "text")


def _results(df):
    return [(r["doc_id"], r["score"], r["n_terms_hit"], r["rank"]) for r in df.collect()]


def test_postings_persist_round_trip_and_prunes(spark, docs):
    """Build, PERSIST, reload, search — identical to in-memory; the
    on-disk postings are hive-partitioned by the 2-char term hash and the
    query probe DYNAMIC-PARTITION-PRUNES to the probed terms' files."""
    index = build_postings_index(docs)
    mem = _results(search_postings(index, TERMS, 10))

    tmp = tempfile.mkdtemp(prefix="postidx_")
    try:
        write_postings_index(index, tmp)
        parts = [d for d in os.listdir(os.path.join(tmp, "postings")) if d.startswith("tp=")]
        assert len(parts) > 10  # genuinely spread over the hash space
        loaded = read_postings_index(spark, tmp)
        q = search_postings(loaded, TERMS, 10)
        plan = q._jdf.queryExecution().executedPlan().toString()
        # the terms' hash prefixes are STATIC partition filters: the scan
        # lists only the probed terms' tp= directories
        assert re.search(r"PartitionFilters: \[[^\]]*tp#\d+ IN", plan), plan[:3000]
        assert "TakeOrderedAndProject" in plan, plan[:3000]
        got = _results(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert got == mem and len(got) == 10


def test_postings_layout_guard(spark, docs):
    index = build_postings_index(docs.limit(20))
    tmp = tempfile.mkdtemp(prefix="postidx_meta_")
    try:
        write_postings_index(index, tmp)
        read_postings_index(spark, tmp)  # matching layout loads fine
        spark.createDataFrame([("other_v0",)], schema="layout string").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "meta"))
        with pytest.raises(ValueError, match="layout=other_v0"):
            read_postings_index(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_extend_postings_equals_rebuild_and_is_idempotent(spark, docs):
    """Postings are per-doc disjoint and N is a count, so append must
    equal rebuild exactly — including a TERM-LESS document, which leaves
    no postings row but must still count once (and only once, even under
    a retried append) in the idf denominator."""
    spark_docs = docs.filter(F.col("doc_id") % 3 != 2)
    delta = docs.filter(F.col("doc_id") % 3 == 2).unionByName(
        docs.sparkSession.createDataFrame([(10_000_001, "")], "doc_id long, text string")
    )

    extended = extend_postings_index(build_postings_index(spark_docs), delta)
    rebuilt = build_postings_index(
        docs.unionByName(
            docs.sparkSession.createDataFrame([(10_000_001, "")], "doc_id long, text string")
        )
    )

    def prows(ix):
        return sorted(tuple(r) for r in ix.postings.collect())

    def drows(ix):
        return sorted(r["doc_id"] for r in ix.docs.collect())

    assert prows(extended) == prows(rebuilt)
    assert drows(extended) == drows(rebuilt)
    # the term-less doc is witnessed in docs/ (the N denominator)...
    assert 10_000_001 in drows(extended)
    # ...and carries no postings row
    assert extended.postings.filter(F.col("doc_id") == 10_000_001).count() == 0

    # retried append: nothing changes — N not inflated, postings not doubled
    again = extend_postings_index(extended, delta)
    assert prows(again) == prows(extended)
    assert drows(again) == drows(extended)

    # the retry guard is delta-keyed: broadcast semi/anti probes of the
    # corpus-sized docs table, never a full-width shuffle
    plan = extended.postings._jdf.queryExecution().executedPlan().toString()
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("BroadcastHashJoin" in ln for ln in anti), plan[:2000]

    # and searching the extended index equals searching the rebuilt one
    assert _results(search_postings(extended, TERMS, 10)) == _results(
        search_postings(rebuilt, TERMS, 10)
    )
