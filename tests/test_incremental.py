"""Incremental-corpus ops: signature-index persistence round-trip, planted
verdict pins for ID1, determinism/sensitivity of the seeded shuffle, and
the shuffled-shard sink contract.

(The gate-vs-oracle equality for ID1/SH1/UF1 runs in test_correctness.py
like every registered gate; these tests pin the parts an SQL oracle can't
— filesystem persistence, cross-run determinism, planted expectations.)
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.incremental import (
    build_signature_index,
    dedup_against_index,
    read_signature_index,
    seeded_shuffle,
    write_signature_index,
)
from oc_meta_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "text")


def _planted_batch(docs):
    # the gate's own plant — single definition, imported, so these pins
    # can never drift from what the gate actually runs
    from oc_meta_spark.plans.incremental_queries import id1_planted_batch

    return id1_planted_batch(docs)


def test_signature_index_persist_round_trip(spark, docs):
    """The nightly shape: build the index, PERSIST it, reload it in a later
    job, dedup the delta against the loaded index — verdicts must be
    identical to an in-memory run, and the planted rows must classify as
    constructed (exact: neighbor's text verbatim → exact_dup matched to
    the donor; near: one appended word → near_dup)."""
    index_docs = docs.filter(F.col("doc_id") % 10 != 0)
    batch = _planted_batch(docs)

    mem_index = build_signature_index(index_docs)
    mem = {r["doc_id"]: (r["verdict"], r["matched_existing"])
           for r in dedup_against_index(batch, mem_index).collect()}

    tmp = tempfile.mkdtemp(prefix="sigidx_")
    try:
        write_signature_index(mem_index, tmp)
        loaded = read_signature_index(spark, tmp)
        got = {r["doc_id"]: (r["verdict"], r["matched_existing"])
               for r in dedup_against_index(batch, loaded).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert got == mem
    verdicts = {v for v, _ in got.values()}
    assert verdicts == {"exact_dup", "near_dup", "unique"}
    for doc_id, (verdict, matched) in got.items():
        if doc_id % 50 == 0:
            # planted exact copy of doc_id+1 (an index doc, and the only
            # holder of that text — testdata has no organic exact dups)
            assert verdict == "exact_dup" and matched == doc_id + 1, (doc_id, verdict, matched)
        elif doc_id % 30 == 0:
            assert verdict == "near_dup", (doc_id, verdict, matched)
            assert matched is not None and matched % 10 != 0  # an index doc


def test_index_config_mismatch_refused(spark, docs):
    """A persisted index carries its MinHash/band config; loading it under
    a different build configuration must fail loudly — mismatched
    signatures would join silently and misclassify."""
    import pyspark.sql.functions as F  # noqa: F811

    index = build_signature_index(docs.filter(F.col("doc_id") < 30))
    tmp = tempfile.mkdtemp(prefix="sigidx_meta_")
    try:
        write_signature_index(index, tmp)
        read_signature_index(spark, tmp)  # matching config loads fine
        spark.createDataFrame(
            [(16, 4)], schema="n_minhash int, n_band_rows int"
        ).write.mode("overwrite").parquet(tmp + "/meta")
        with pytest.raises(ValueError, match="n_minhash=16"):
            read_signature_index(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_extend_index_equals_rebuild(spark, docs):
    """Appending a delta to the index must equal rebuilding the index from
    the full corpus — the invariant that lets the nightly job pay O(delta)
    instead of O(corpus).  Compared via the verdicts a THIRD batch gets
    against both indexes (the index's only contract is what it classifies)."""
    from oc_meta_spark.plans.incremental import extend_signature_index

    old = docs.filter(F.col("doc_id") % 3 == 0)
    delta = docs.filter(F.col("doc_id") % 3 == 1)
    probe = docs.filter(F.col("doc_id") % 3 == 2)

    extended = extend_signature_index(build_signature_index(old), delta)
    rebuilt = build_signature_index(old.unionByName(delta))

    got_ext = {r["doc_id"]: (r["verdict"], r["matched_existing"])
               for r in dedup_against_index(probe, extended).collect()}
    got_reb = {r["doc_id"]: (r["verdict"], r["matched_existing"])
               for r in dedup_against_index(probe, rebuilt).collect()}
    assert got_ext == got_reb and len(got_ext) == probe.count()
    # and the index tables themselves agree
    for attr in ("hashes", "signatures", "bands"):
        e = sorted(tuple(r) for r in getattr(extended, attr).collect())
        r_ = sorted(tuple(r) for r in getattr(rebuilt, attr).collect())
        assert e == r_, attr

    # idempotent: a retried nightly job re-appending the SAME delta must
    # change nothing — duplicated signature rows would double-count
    # n_match in the verify join and fabricate near_dup verdicts
    again = extend_signature_index(extended, delta)
    for attr in ("hashes", "signatures", "bands"):
        e = sorted(tuple(r) for r in getattr(extended, attr).collect())
        a = sorted(tuple(r) for r in getattr(again, attr).collect())
        assert e == a, f"re-append changed {attr}"


def test_seeded_shuffle_deterministic_and_seed_sensitive(spark, docs):
    ids = docs.select("doc_id")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in seeded_shuffle(ids, "s1", 4).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in seeded_shuffle(ids, "s1", 4).collect()}
    assert a == b  # same seed → identical permutation
    c = {r["doc_id"]: (r["shard"], r["pos"]) for r in seeded_shuffle(ids, "s2", 4).collect()}
    assert a != c  # different seed → different permutation
    # a permutation: every doc exactly once, positions contiguous per shard
    assert len(a) == ids.count()
    for shard in {s for s, _ in a.values()}:
        poss = sorted(p for s, p in a.values() if s == shard)
        assert poss == list(range(1, len(poss) + 1))


def test_write_shuffled_shards_round_trip(spark, docs):
    """The sink writes the same seeded permutation the SH1 operator
    defines: hive-partitioned by shard, rows ordered by sort_key within
    each shard file, reproducible across runs of the same seed."""
    from oc_meta_spark.sources.shards import write_shuffled_shards

    sample = docs.limit(200)
    tmp1 = tempfile.mkdtemp(prefix="shuf1_")
    tmp2 = tempfile.mkdtemp(prefix="shuf2_")
    try:
        write_shuffled_shards(sample, tmp1, seed="epoch0", n_shards=4)
        write_shuffled_shards(sample, tmp2, seed="epoch0", n_shards=4)
        r1 = spark.read.parquet(tmp1)
        r2 = spark.read.parquet(tmp2)
        rows1 = [(r["shard"], r["sort_key"], r["doc_id"]) for r in
                 r1.select("shard", "sort_key", "doc_id").orderBy("shard", "sort_key").collect()]
        rows2 = [(r["shard"], r["sort_key"], r["doc_id"]) for r in
                 r2.select("shard", "sort_key", "doc_id").orderBy("shard", "sort_key").collect()]
        assert rows1 == rows2 and len(rows1) == 200
        # the layout matches the operator's permutation
        expect = {(r["shard"], r["sort_key"], r["doc_id"])
                  for r in seeded_shuffle(sample, "epoch0", 4).collect()}
        assert set(rows1) == expect
        # in-FILE order is the sort_key order (the loader contract): parquet
        # preserves row order per file, so read each file's rows in
        # encounter order and assert monotone keys
        per_file = {}
        for r in r1.select(
            F.input_file_name().alias("f"), "sort_key"
        ).collect():
            per_file.setdefault(r["f"], []).append(r["sort_key"])
        assert per_file
        for f, keys in per_file.items():
            assert keys == sorted(keys), f
    finally:
        shutil.rmtree(tmp1, ignore_errors=True)
        shutil.rmtree(tmp2, ignore_errors=True)


def test_hs1_no_near_dup_straddles_splits(spark, sf_dir):
    """The leakage contract: every near-dup pair (the same banded-MinHash
    pairs D16 emits) must land in ONE split, and all three splits must be
    populated."""
    from oc_meta_spark.plans.dedup_queries import d16_minhash_lsh
    from oc_meta_spark.plans.incremental_queries import hs1_leakage_safe_holdout

    split_of = {r["doc_id"]: r["split"]
                for r in hs1_leakage_safe_holdout(spark, sf_dir).collect()}
    assert set(split_of.values()) == {"train", "val", "test"}
    n_train = sum(1 for s in split_of.values() if s == "train")
    assert n_train > len(split_of) // 2  # train is the bulk split
    pairs = [(r["doc_a"], r["doc_b"]) for r in d16_minhash_lsh(spark, sf_dir).collect()]
    assert pairs
    for a, b in pairs:
        assert split_of[a] == split_of[b], (a, b, split_of[a], split_of[b])


def test_uf1_blocklist_and_cap(spark, sf_dir):
    from oc_meta_spark.plans.incremental_queries import (
        _UF1_BLOCKLIST,
        _UF1_CAP,
        uf1_domain_filter,
    )

    rows = uf1_domain_filter(spark, sf_dir).collect()
    domains = {}
    for r in rows:
        assert r["domain"] not in _UF1_BLOCKLIST
        domains[r["domain"]] = domains.get(r["domain"], 0) + 1
    assert domains and max(domains.values()) <= _UF1_CAP
    # the blocklist actually bit: blocked domains exist in the synthesized
    # url space (2 real domains × 5 docs each at any SF)
    assert len(domains) == 98
