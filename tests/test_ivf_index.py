"""Persisted IVF ANN index: persistence round-trip, frozen-centroid
extend ≡ rebuild, retry idempotency, config guard, partition layout.

(The gate-vs-oracle equality for X5/X8 runs in test_correctness.py like
every registered gate; these pin what an SQL oracle can't — filesystem
persistence and the append contract.)
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.ivf_index import (
    assign_cells,
    build_ivf_index,
    extend_ivf_index,
    read_ivf_index,
    search_ivf_index,
    write_ivf_index,
)
from oc_meta_spark.sources.tables import load_table

K = 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


def _queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )


def _results(df):
    return sorted(
        (r["qid"], r["vec_id"], r["cosine"], r["rank"]) for r in df.collect()
    )


def test_ivf_index_persist_round_trip(spark, emb):
    """The nightly shape: build, PERSIST, reload in a later job, search
    against the loaded index — results identical to an in-memory run, and
    the on-disk inverted lists are hive-partitioned by cell so a probe
    partition-prunes."""
    index = build_ivf_index(emb, K)
    mem = _results(search_ivf_index(_queries(emb), index, nprobe=4, topk=10))

    tmp = tempfile.mkdtemp(prefix="ivfidx_")
    try:
        write_ivf_index(index, tmp)
        assert any(
            d.startswith("cid=") for d in os.listdir(os.path.join(tmp, "assignments"))
        )
        loaded = read_ivf_index(spark, tmp, K)
        # probing the persisted lists must DYNAMIC-PARTITION-PRUNE on the
        # cid layout — only the probed cells' files are read
        import re

        plan = (
            search_ivf_index(_queries(emb), loaded, nprobe=4, topk=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert re.search(r"dynamicpruningexpression\(cid#\d+L? IN", plan), plan[:3000]
        got = _results(search_ivf_index(_queries(emb), loaded, nprobe=4, topk=10))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert got == mem and len(got) == 5 * 10


def test_ivf_index_config_mismatch_refused(spark, emb):
    index = build_ivf_index(emb, K)
    tmp = tempfile.mkdtemp(prefix="ivfidx_meta_")
    try:
        write_ivf_index(index, tmp)
        read_ivf_index(spark, tmp, K)  # matching config loads fine
        with pytest.raises(ValueError, match=f"k={K}"):
            read_ivf_index(spark, tmp, 32)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_extend_ivf_index_equals_rebuild(spark, emb):
    """Frozen centroids make each vector's cell independent of every
    other vector, so appending a delta must equal assigning the full
    corpus against the same centroids — the invariant that lets the
    nightly job pay O(delta).  And a retried append changes nothing."""
    founding = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)

    extended = extend_ivf_index(build_ivf_index(founding, K), delta)
    rebuilt = assign_cells(emb, extended.centroids)

    def rows(df):
        return sorted((r["vec_id"], r["cid"]) for r in df.select("vec_id", "cid").collect())

    assert rows(extended.assignments) == rows(rebuilt)
    assert len(rows(extended.assignments)) == emb.count()

    again = extend_ivf_index(extended, delta)
    assert rows(again.assignments) == rows(extended.assignments)

    # the retry guard is delta-keyed: broadcast semi/anti probes of the
    # corpus-sized lists, never a full-width dropDuplicates shuffle
    plan = extended.assignments._jdf.queryExecution().executedPlan().toString()
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti and all("BroadcastHashJoin" in l for l in anti), plan[:2000]

    # centroids are FROZEN: the delta draw must not have touched them
    # (a rebuild from the full corpus would draw different centroids —
    # that is the rebuild path, not the append path)
    assert sorted(r["cid"] for r in extended.centroids.collect()) == sorted(
        r["cid"] for r in build_ivf_index(founding, K).centroids.collect()
    )
