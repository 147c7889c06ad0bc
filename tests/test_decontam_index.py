"""Persisted benchmark-decontamination index (plans/decontam_index.py):
persistence round-trip, layout guard, extend≡rebuild, retry idempotency,
and the gram-less-benchmark witness.  The VALUE semantics (contamination
report vs DC1's from-scratch SQL) are gated by DC4 in
plans/hygiene_queries.py + tests/test_correctness.py."""

from __future__ import annotations

import pytest

from oc_meta_spark.plans.decontam_index import (
    DECONTAM_LAYOUT,
    build_decontam_index,
    decontaminate,
    extend_decontam_index,
    read_decontam_index,
    write_decontam_index,
)

BENCH_SCHEMA = "bench_id long, text string"
B0 = [
    (1, "alpha beta gamma delta epsilon zeta eta"),
    (2, "one two three four five six seven eight"),
    (3, "too short"),  # < 5 words: gram-less, witness-only
]
B1 = [
    (11, "red green blue yellow purple orange pink"),
    (12, "alpha beta gamma delta epsilon repeated here"),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_extend_equals_rebuild_and_is_idempotent(spark):
    b0, b1 = spark.createDataFrame(B0, BENCH_SCHEMA), spark.createDataFrame(B1, BENCH_SCHEMA)
    extended = extend_decontam_index(build_decontam_index(b0), b1)
    rebuilt = build_decontam_index(b0.unionByName(b1))
    assert _rows(extended.grams) == _rows(rebuilt.grams)
    assert _rows(extended.benchmarks) == _rows(rebuilt.benchmarks)
    # a replayed delta appends nothing — the gram-less doc 3 is witnessed
    # by the benchmarks table, so even IT cannot re-enter
    replayed = extend_decontam_index(extended, b1.unionByName(b0))
    assert _rows(replayed.grams) == _rows(rebuilt.grams)
    assert _rows(replayed.benchmarks) == _rows(rebuilt.benchmarks)
    assert 3 in [r[0] for r in _rows(rebuilt.benchmarks)]
    assert not [r for r in _rows(rebuilt.grams) if r[0] == 3]


def test_extend_refuses_a_text_revision(spark):
    """A known bench_id arriving with DIFFERENT text is a revision:
    silently dropping it (the old fresh_only-only behavior) would leave
    grams unique to the revised text unindexed and contamination against
    them unreported — the extend must refuse loudly, mirroring
    ingest_batch's revision refusal."""
    idx = build_decontam_index(spark.createDataFrame(B0, BENCH_SCHEMA))
    revised = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon REVISED tail")], BENCH_SCHEMA
    )
    with pytest.raises(ValueError, match="bench_id 1 .*different text"):
        extend_decontam_index(idx, revised)
    # identical re-presentation is a retry, not a revision — still fine
    same = extend_decontam_index(idx, spark.createDataFrame(B0[:1], BENCH_SCHEMA))
    assert _rows(same.grams) == _rows(idx.grams)
    assert _rows(same.benchmarks) == _rows(idx.benchmarks)


def test_probe_plan_broadcasts_the_benchmark_side(spark):
    """The decontamination probe must be ONE BroadcastHashJoin of the
    benchmark-sized gram index into the corpus's gram explosion — never
    a sort-merge shuffle of the corpus, never a cartesian (DC1's
    documented 100 TB shape, now pinned for the persisted path too)."""
    bench = spark.createDataFrame(B0 + B1, BENCH_SCHEMA)
    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon different tail")],
        "doc_id long, text string",
    )
    out = decontaminate(corpus, build_decontam_index(bench))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1, plan[:3000]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_roundtrip_layout_guard_and_probe(spark, tmp_path):
    bench = spark.createDataFrame(B0 + B1, BENCH_SCHEMA)
    idx = build_decontam_index(bench)
    path = str(tmp_path / "idx")
    write_decontam_index(idx, path)
    loaded = read_decontam_index(spark, path)
    assert _rows(loaded.grams.select("bench_id", "g", "gp")) == _rows(
        idx.grams.select("bench_id", "g", "gp")
    )
    assert _rows(loaded.benchmarks) == _rows(idx.benchmarks)
    # a contaminated corpus doc hits BOTH benchmark docs sharing its
    # leading 5-gram (doc 1 from the founding slice, doc 12 from the
    # extension); a clean one reports nothing
    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon different tail"),
         (101, "completely unrelated words in this doc")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["bench_id"]): r["n_shared_grams"]
           for r in decontaminate(corpus, loaded).collect()}
    assert got == {(100, 1): 1, (100, 12): 1}

    # foreign layout refused loudly
    bad = str(tmp_path / "bad")
    write_decontam_index(idx, bad)
    spark.createDataFrame([("other_v3",)], "layout string").write.mode(
        "overwrite"
    ).parquet(f"{bad}/meta")
    with pytest.raises(ValueError, match="layout=other_v3"):
        read_decontam_index(spark, bad)
    # v2 = benchmarks carries the revision guard's content hash; a v1
    # store must be refused by the layout check above, never read with
    # all-null hashes
    assert DECONTAM_LAYOUT == "gp_v2"
