"""Streaming ingestion with online dedup (streaming/ingest.py): the
bounded fold vs the persisted store, replay idempotency, the checkpointed
stream path's exactly-once discipline, and store compaction.

The VALUE semantics of the classification (every verdict at sf0.001/0.01)
are gated against DuckDB by IN1 in plans/incremental_queries.py +
tests/test_correctness.py; these tests pin the sink/store behavior the
oracle cannot see."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.incremental import build_signature_index
from oc_meta_spark.plans.incremental_queries import in1_planted_batches
from oc_meta_spark.sources.tables import load_table
from oc_meta_spark.streaming.ingest import (
    bootstrap_store,
    compact_ingest_store,
    ingest_batch,
    ingest_fold,
    ingest_step,
    load_ingest_store,
    stream_ingest,
)

VCOLS = ["doc_id", "verdict", "matched_existing", "batch"]


def _docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "text")


def _rows(df, cols=VCOLS):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _manifest(store):
    with open(os.path.join(store, "MANIFEST.json"), encoding="utf-8") as f:
        return json.load(f)


def test_in_batch_holder_collapse(spark):
    """Two identical new docs in one batch: the min-id holder survives as
    unique; the other reports exact_dup matched to the holder itself
    (the doc that actually enters the corpus)."""
    base = spark.createDataFrame([(100, "base only words here and there")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    verdicts, survivors = ingest_step(batch, build_signature_index(base))
    got = {r["doc_id"]: (r["verdict"], r["matched_existing"]) for r in verdicts.collect()}
    assert got == {1: ("unique", None), 2: ("exact_dup", 1)}
    assert [r["doc_id"] for r in survivors.collect()] == [1]


def test_cross_batch_exact_dedup(spark):
    """A doc exactly equal to an EARLIER batch's survivor is caught: the
    index grew by the survivor between batches."""
    base = spark.createDataFrame([(100, "base only words here and there")], "doc_id long, text string")
    b0 = spark.createDataFrame([(1, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(11, "alpha beta gamma delta epsilon"), (12, "totally fresh unseen content")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["verdict"], r["matched_existing"], r["batch"]) for r in
           ingest_fold([b0, b1], build_signature_index(base)).collect()}
    assert out[1] == ("unique", None, 0)
    assert out[11] == ("exact_dup", 1, 1)
    assert out[12] == ("unique", None, 1)


def test_persisted_ingest_matches_fold(spark, sf_dir, tmp_path):
    """The foreachBatch body over a bootstrapped manifest store
    reproduces the bounded fold verdict-for-verdict, and the corpus holds
    exactly the base plus the unique holders."""
    docs = _docs(spark, sf_dir)
    base = docs.filter(~(F.col("doc_id") % 10).isin(0, 1))
    batches = in1_planted_batches(docs)
    fold = ingest_fold(batches, build_signature_index(base))

    store = str(tmp_path / "store")
    bootstrap_store(spark, base, store)
    for i, b in enumerate(batches):
        ingest_batch(spark, b, store, batch_id=i)

    _idx, corpus, verdicts = load_ingest_store(spark, store)
    assert _rows(verdicts.filter(F.col("batch") >= 0)) == _rows(fold)
    surv_ids = sorted(
        r["doc_id"]
        for r in fold.filter(F.col("verdict") == "unique").collect()
    )
    base_ids = sorted(r["doc_id"] for r in base.collect())
    assert sorted(r["doc_id"] for r in corpus.collect()) == sorted(base_ids + surv_ids)
    # a bootstrap over live state must refuse
    with pytest.raises(ValueError, match="bootstrap"):
        bootstrap_store(spark, base, store)


def test_replay_is_noop(spark, tmp_path):
    """A replayed micro-batch whose previous attempt committed leaves the
    store untouched (no manifest bump, no duplicate rows)."""
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame([(1, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    ingest_batch(spark, b0, store, batch_id=0)
    v1 = _manifest(store)["version"]
    n1 = load_ingest_store(spark, store)[2].count()
    ingest_batch(spark, b0, store, batch_id=0)  # replay, same batch
    ingest_batch(spark, b0, store, batch_id=7)  # replay under a new id
    assert _manifest(store)["version"] == v1
    assert load_ingest_store(spark, store)[2].count() == n1


def test_stream_ingest_exactly_once(spark, tmp_path):
    """The checkpointed file source discovers each input file exactly
    once across TWO stream runs (stop + restart with a new backlog) —
    the reference's completed-file cache, subsumed by the checkpoint."""
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def feed(name, rows):
        tmp = str(tmp_path / ("_tmp_" + name))
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, part), str(input_dir / (name + ".parquet")))

    feed("f1", [(1, "alpha beta gamma delta epsilon")])
    feed("f2", [(2, "alpha beta gamma delta epsilon"), (3, "other novel text body")])
    q = stream_ingest(spark, str(input_dir), store, ckpt, available_now=True)
    q.awaitTermination(120)

    _i, corpus1, verdicts1 = load_ingest_store(spark, store)
    got1 = {r["doc_id"]: r["verdict"] for r in verdicts1.collect()}
    # doc 2 duplicates doc 1 — caught whether they share a micro-batch
    # (in-batch holder collapse) or not (index growth between batches)
    assert got1 == {1: "unique", 2: "exact_dup", 3: "unique"}

    # restart with a new backlog: old files must NOT be re-ingested
    feed("f3", [(4, "other novel text body"), (5, "yet another unseen doc")])
    q2 = stream_ingest(spark, str(input_dir), store, ckpt, available_now=True)
    q2.awaitTermination(120)
    _i, corpus2, verdicts2 = load_ingest_store(spark, store)
    got2 = {r["doc_id"]: r["verdict"] for r in verdicts2.collect()}
    assert set(got2) == {1, 2, 3, 4, 5}
    assert verdicts2.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert got2[4] == "exact_dup"  # dup of doc 3, an earlier run's survivor
    assert got2[5] == "unique"


def test_compaction_preserves_rows(spark, tmp_path):
    """compact_ingest_store merges delta dirs to one per table without
    changing a single row."""
    store = str(tmp_path / "store")
    texts = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "one more different body text"),
        (3, "third unique content string here"),
    ]
    for i, row in enumerate(texts):
        ingest_batch(
            spark,
            spark.createDataFrame([row], "doc_id long, text string"),
            store,
            batch_id=i,
        )

    def snapshot():
        idx, corpus, verdicts = load_ingest_store(spark, store)
        tables = {
            "hashes": idx.hashes,
            "signatures": idx.signatures,
            "bands": idx.bands,
            "corpus": corpus,
            "verdicts": verdicts,
        }
        return {kind: _rows(df, df.columns) for kind, df in tables.items()}

    before = snapshot()
    assert compact_ingest_store(spark, store) == 5
    manifest = _manifest(store)
    assert all(len(v) == 1 for v in manifest["tables"].values())
    assert snapshot() == before
    # idempotent: nothing left to merge
    assert compact_ingest_store(spark, store) == 0


def test_empty_batch_is_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    empty = spark.createDataFrame([], "doc_id long, text string")
    ingest_batch(spark, empty, store, batch_id=0)
    assert not os.path.exists(os.path.join(store, "MANIFEST.json"))


def test_revision_is_refused(spark, tmp_path):
    """A seen doc_id arriving with DIFFERENT text is a revision — the
    batch is refused loudly, never silently dropped (the replay guard
    only swallows identical-text replays)."""
    store = str(tmp_path / "store")
    ingest_batch(
        spark,
        spark.createDataFrame([(1, "original text body")], "doc_id long, text string"),
        store,
        batch_id=0,
    )
    revised = spark.createDataFrame([(1, "revised text body")], "doc_id long, text string")
    with pytest.raises(ValueError, match="rebuild"):
        ingest_batch(spark, revised, store, batch_id=1)
    assert _manifest(store)["version"] == 1  # nothing committed


def test_duplicate_doc_ids_in_batch_refused(spark, tmp_path):
    store = str(tmp_path / "store")
    bad = spark.createDataFrame(
        [(1, "text one"), (1, "text two")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="identity key"):
        ingest_batch(spark, bad, store, batch_id=0)


def test_fold_empty_batches_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        ingest_fold([], build_signature_index(
            spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        ))


# ---------------------------------------------------------------------------
# The persisted decontamination composition (ingest_benchmarks + the
# nightly batch probe): interleave semantics, replay idempotency at both
# cadences, the revision refusal, and the mode guard.  The bounded-fold
# VALUES are gated by IN3 (plans/nightly_queries.py) against DC1's SQL.
# ---------------------------------------------------------------------------
NSCHEMA = "doc_id long, text string, domain string"
DBASE = [(100, "alpha beta gamma delta epsilon zeta", "a.org")]
DB0 = [
    (1, "alpha beta gamma delta epsilon completely new", "a.org"),
    (2, "nothing in common with benchmarks here", "b.org"),
]
DB1 = [(11, "xx1 xx2 xx3 nothing in common with benchmarks yy1 yy2", "b.org")]
BSCHEMA = "bench_id long, text string"
BENCH1 = [(500, "alpha beta gamma delta epsilon shared tail")]
BENCH2 = [(600, "nothing in common with benchmarks here")]


def test_decontam_composition_interleaved_cadences(spark, tmp_path):
    """Corpus batches and benchmark releases interleave; the ledger must
    equal the from-scratch DC1 report over (store corpus × all
    benchmarks), with each pair recorded by the correct cadence: batch
    tags for benchmark-first pairs, BENCH_RELEASE_BATCH for corpus-first
    (retroactive) pairs.  Replays of either cadence commit nothing."""
    from oc_meta_spark.plans.decontam_index import build_decontam_index, decontaminate
    from oc_meta_spark.streaming.ingest import (
        BENCH_RELEASE_BATCH,
        compact_ingest_store,
        ingest_benchmarks,
        load_decontam_view,
    )

    store = str(tmp_path / "night")
    bootstrap_store(spark, spark.createDataFrame(DBASE, NSCHEMA), store, nightly=True)
    ingest_benchmarks(spark, spark.createDataFrame(BENCH1, BSCHEMA), store)
    ingest_batch(spark, spark.createDataFrame(DB0, NSCHEMA), store, 0, nightly=True)
    ingest_benchmarks(spark, spark.createDataFrame(BENCH2, BSCHEMA), store)
    ingest_batch(spark, spark.createDataFrame(DB1, NSCHEMA), store, 1, nightly=True)
    v = _manifest(store)["version"]

    _, corpus, _ = load_ingest_store(spark, store)
    idx, contam = load_decontam_view(spark, store)
    # ledger == from-scratch over the store's ACTUAL corpus — robust to
    # whatever the dedup classification admitted
    scratch = decontaminate(
        corpus, build_decontam_index(spark.createDataFrame(BENCH1 + BENCH2, BSCHEMA))
    )
    got = sorted(tuple(r) for r in contam.select("doc_id", "bench_id", "n_shared_grams").collect())
    assert got == sorted(tuple(r) for r in scratch.collect())
    # cadence tags: bench 500 predates doc 1 (batch probe, tag 0); base
    # doc 100 predates bench 500 and doc 2 predates bench 600 (both
    # retroactive); doc 11 arrives after bench 600 (batch probe, tag 1)
    tags = {(r["doc_id"], r["bench_id"]): r["batch"] for r in contam.collect()}
    assert tags[(100, 500)] == BENCH_RELEASE_BATCH
    assert tags[(1, 500)] == 0
    assert tags[(2, 600)] == BENCH_RELEASE_BATCH
    assert tags[(11, 600)] == 1

    # replayed release and replayed batch: nothing committed
    ingest_benchmarks(spark, spark.createDataFrame(BENCH1, BSCHEMA), store)
    ingest_batch(spark, spark.createDataFrame(DB1, NSCHEMA), store, 1, nightly=True)
    assert _manifest(store)["version"] == v
    _, contam2 = load_decontam_view(spark, store)
    assert sorted(map(tuple, contam2.collect())) == sorted(map(tuple, contam.collect()))

    # a revised benchmark refuses; compaction preserves the ledger
    with pytest.raises(ValueError, match="bench_id 500 .*different text"):
        ingest_benchmarks(
            spark,
            spark.createDataFrame([(500, "revised benchmark body text here")], BSCHEMA),
            store,
        )
    assert compact_ingest_store(spark, store) > 0
    _, contam3 = load_decontam_view(spark, store)
    assert sorted(map(tuple, contam3.collect())) == sorted(map(tuple, contam.collect()))


def test_ingest_benchmarks_refuses_plain_stores(spark, tmp_path):
    """The benchmark index tables exist only under nightly mode — a
    plain store's batches never probe them, so extending one would
    record an index no commit consults (silently missing verdicts)."""
    from oc_meta_spark.streaming.ingest import ingest_benchmarks

    store = str(tmp_path / "plain")
    bootstrap_store(
        spark, spark.createDataFrame(DBASE, NSCHEMA).select("doc_id", "text"), store
    )
    with pytest.raises(ValueError, match="ingest_benchmarks needs a nightly"):
        ingest_benchmarks(spark, spark.createDataFrame(BENCH1, BSCHEMA), store)
