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
        # the persisted layout is hive-partitioned on the join-key
        # prefixes (hashes/ by 2-char hash prefix, bands/ by band) so the
        # nightly probe partition-prunes the index scan
        import os

        assert any(d.startswith("hp=") for d in os.listdir(os.path.join(tmp, "hashes")))
        assert sorted(
            d for d in os.listdir(os.path.join(tmp, "bands")) if d.startswith("band=")
        ) == ["band=0", "band=1", "band=2", "band=3"]
        loaded = read_signature_index(spark, tmp)
        # read-back column names/types must match the built ones
        # (partition columns survive type inference; nullability may
        # tighten — irrelevant to extend/union)
        def _shape(df):
            return [(f.name, f.dataType) for f in df.schema]

        assert _shape(loaded.hashes) == _shape(mem_index.hashes)
        assert _shape(loaded.bands) == _shape(mem_index.bands)
        # the whole point of the partitioned layout: the delta probe must
        # DYNAMIC-PARTITION-PRUNE the persisted index scans (hp on
        # hashes/, band on bands/) — possible only because read keeps
        # hp/band true partition attributes instead of recomputing them
        import re

        plan = (
            dedup_against_index(batch, loaded)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert re.search(r"dynamicpruningexpression\(hp#\d+ IN", plan), plan[:3000]
        assert re.search(r"dynamicpruningexpression\(band#\d+L? IN", plan), plan[:3000]
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

    # and the append is delta-KEYED: the corpus-sized index sides are
    # probed via broadcast semi/anti joins (scans), never re-shuffled
    # wholesale the way a full-width dropDuplicates/groupBy would
    for attr in ("hashes", "signatures", "bands"):
        plan = getattr(extended, attr)._jdf.queryExecution().executedPlan().toString()
        anti = [l for l in plan.splitlines() if "LeftAnti" in l]
        assert anti and all("BroadcastHashJoin" in l for l in anti), (attr, plan[:2000])


def test_extend_delta_cp_equals_extend(spark, docs):
    """The folds' delta-materialized extend (r12) must be value-identical
    to the lazy extend_signature_index on every table — the checkpoints
    may only change WHAT is materialized, never what is computed."""
    from oc_meta_spark.plans.incremental import (
        extend_signature_index,
        extend_signature_index_delta_cp,
        materialized_signature_index,
    )

    old = docs.filter(F.col("doc_id") % 3 == 0)
    delta = docs.filter(F.col("doc_id") % 3 == 1)

    base = materialized_signature_index(old)
    # the materialized build equals the lazy build table-for-table
    lazy_base = build_signature_index(old)
    for attr in ("hashes", "signatures", "bands"):
        m = sorted(tuple(r) for r in getattr(base, attr).collect())
        l = sorted(tuple(r) for r in getattr(lazy_base, attr).collect())
        assert m == l, f"materialized build diverged on {attr}"

    via_cp = extend_signature_index_delta_cp(base, delta)
    via_lazy = extend_signature_index(base, delta)
    for attr in ("hashes", "signatures", "bands"):
        c = sorted(tuple(r) for r in getattr(via_cp, attr).collect())
        l = sorted(tuple(r) for r in getattr(via_lazy, attr).collect())
        assert c == l, f"delta-cp extend diverged on {attr}"

    # idempotent like the lazy extend: re-appending the same delta is a no-op
    again = extend_signature_index_delta_cp(via_cp, delta)
    for attr in ("hashes", "signatures", "bands"):
        c = sorted(tuple(r) for r in getattr(via_cp, attr).collect())
        a = sorted(tuple(r) for r in getattr(again, attr).collect())
        assert c == a, f"re-append changed {attr}"


def test_delta_cp_chain_compaction(spark, monkeypatch):
    """Every K batches the delta-cp extend fully checkpoints the hashes
    union (r13, r12 ADVICE: the anti-join chain otherwise grows without
    bound on long streams).  Compaction must be value-neutral and must
    actually reset the chain: depth returns to 0 at the compaction batch
    and counts from 1 afterwards."""
    from oc_meta_spark.plans import incremental as inc

    monkeypatch.setattr(inc, "HASH_CHAIN_COMPACT_EVERY", 2)

    def batch(i):
        return spark.createDataFrame(
            [(i * 10 + j, f"doc {i} row {j} words alpha beta gamma delta") for j in range(3)],
            schema="doc_id long, text string",
        )

    idx_cp = inc.materialized_signature_index(batch(0))
    # the lazy-extend comparison chain must start from a MATERIALIZED base
    # too: each lazy extend references the prior hashes twice, so over an
    # unmaterialized build the 3-batch chain embeds 2^3 copies of the
    # minhash subtree and Catalyst analysis alone took ~9 min (r13 suite
    # run); over LogicalRDD leaves the same comparison runs in seconds
    idx_lazy = inc.materialized_signature_index(batch(0))
    depths = []
    for i in range(1, 4):
        idx_cp = inc.extend_signature_index_delta_cp(idx_cp, batch(i))
        idx_lazy = inc.extend_signature_index(idx_lazy, batch(i))
        depths.append(getattr(idx_cp.hashes, "_ocms_chain_depth", None))
    # K=2: batch1 depth 1, batch2 compacts to 0, batch3 depth 1
    assert depths == [1, 0, 1], depths
    for attr in ("hashes", "signatures", "bands"):
        c = sorted(tuple(r) for r in getattr(idx_cp, attr).collect())
        l = sorted(tuple(r) for r in getattr(idx_lazy, attr).collect())
        assert c == l, f"compacting extend diverged on {attr}"


def test_incremental_holdout_never_reassigns(spark):
    """The HS2 stability contract, on an explicit bridge: yesterday doc 1
    (train, epoch 0) and doc 2 (test, epoch 1) were in SEPARATE clusters;
    today a new doc 3 bridges them into one cluster.  Previously-assigned
    docs must keep their (now straddling) splits — recomputing the merged
    cluster's seeded split would flip one of them and leak across epochs —
    and the new doc inherits the EARLIEST-assigned member's split (doc 1,
    epoch 0 → train).  A new doc in an all-new cluster gets a fresh seeded
    split."""
    from oc_meta_spark.plans.incremental import assign_holdout_incremental

    prior = spark.createDataFrame(
        [(1, "train", 0), (2, "test", 1)],
        schema="doc_id long, split string, assigned_epoch int",
    )
    # today's clustering: 1,2,3 merged (bridge doc 3); 4 alone and new
    clustered = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], schema="doc_id long, cluster long"
    )
    got = {r["doc_id"]: (r["split"], r["status"])
           for r in assign_holdout_incremental(clustered, prior).collect()}
    assert got[1] == ("train", "kept")
    assert got[2] == ("test", "kept")
    assert got[3] == ("train", "inherited")
    assert got[4][1] == "fresh" and got[4][0] in {"train", "val", "test"}

    # epoch tie → min doc_id anchors; and same-epoch different order is a
    # total order, never nondeterministic
    prior2 = spark.createDataFrame(
        [(5, "val", 2), (6, "train", 2)],
        schema="doc_id long, split string, assigned_epoch int",
    )
    clustered2 = spark.createDataFrame(
        [(5, 5), (6, 5), (7, 5)], schema="doc_id long, cluster long"
    )
    got2 = {r["doc_id"]: (r["split"], r["status"])
            for r in assign_holdout_incremental(clustered2, prior2).collect()}
    assert got2[7] == ("val", "inherited")  # doc 5 is the earlier anchor


def test_viral_bucket_cap_bounds_candidates(spark):
    """The viral-document guard: 40 index docs share one text (one hot
    (band,bucket) family); a capped run must classify the batch
    identically to an uncapped one — the cap keeps the SMALLEST index
    ids, which is exactly the min-id match the verdict reports — while
    bounding the per-bucket candidate fanout."""
    viral = "the same viral boilerplate text repeated across the corpus every day"
    rows = [(i, viral) for i in range(1, 41)]
    rows += [(100, "a genuinely unique document about partitioned indexes")]
    index_docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    batch = spark.createDataFrame(
        [(1000, viral + " zzz"), (1001, "completely unrelated content here today")],
        schema="doc_id long, text string",
    )
    index = build_signature_index(index_docs)
    uncapped = {r["doc_id"]: (r["verdict"], r["matched_existing"])
                for r in dedup_against_index(batch, index).collect()}
    capped = {r["doc_id"]: (r["verdict"], r["matched_existing"])
              for r in dedup_against_index(batch, index, max_bucket_width=3).collect()}
    assert uncapped == capped
    assert capped[1000] == ("near_dup", 1)  # min holder survives the cap
    assert capped[1001][0] == "unique"

    # and the cap is actually IN the plan (a silently-ignored parameter
    # would pass every assertion above): capping adds the per-bucket
    # row_number window column, absent from the uncapped plan
    plan_c = dedup_against_index(batch, index, max_bucket_width=3)._jdf.queryExecution().executedPlan().toString()
    plan_u = dedup_against_index(batch, index)._jdf.queryExecution().executedPlan().toString()
    assert "_bw" in plan_c and "_bw" not in plan_u


def test_holdout_assignment_store_round_trip(spark):
    """The nightly holdout cycle as persisted artifact: night N reads the
    history, assigns, appends its new rows at epoch N, overwrite-swaps —
    prior rows byte-identical across the cycle, retried appends no-ops,
    split-partitioned layout, seed-mismatch refused."""
    from oc_meta_spark.plans.incremental import (
        append_holdout_assignments,
        assign_holdout_incremental,
        read_holdout_assignments,
        write_holdout_assignments,
    )

    prior = spark.createDataFrame(
        [(1, "train", 0), (2, "test", 0), (5, "val", 1)],
        schema="doc_id long, split string, assigned_epoch int",
    )
    clustered = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)], schema="doc_id long, cluster long"
    )
    assigned = assign_holdout_incremental(clustered, prior, seed="s9")
    history = append_holdout_assignments(prior, assigned, epoch=2)
    rows = {r["doc_id"]: (r["split"], r["assigned_epoch"]) for r in history.collect()}
    # prior rows immutable; new docs stamped with THIS epoch
    assert rows[1] == ("train", 0) and rows[2] == ("test", 0) and rows[5] == ("val", 1)
    assert rows[3] == ("train", 2)  # inherited doc 1's split (earliest anchor)
    assert rows[4][1] == 2 and len(rows) == 5

    # retried append is a no-op
    again = append_holdout_assignments(history, assigned, epoch=3)
    assert {r["doc_id"]: (r["split"], r["assigned_epoch"]) for r in again.collect()} == rows

    tmp = tempfile.mkdtemp(prefix="holdout_")
    try:
        write_holdout_assignments(history, tmp, seed="s9")
        import os

        parts = {d for d in os.listdir(os.path.join(tmp, "assignments")) if d.startswith("split=")}
        assert parts == {f"split={s}" for s, _ in rows.values()}
        loaded = read_holdout_assignments(spark, tmp, seed="s9")
        assert {r["doc_id"]: (r["split"], r["assigned_epoch"]) for r in loaded.collect()} == rows
        with pytest.raises(ValueError, match="seed=s9"):
            read_holdout_assignments(spark, tmp, seed="other")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # the writer normalizes to the store's pinned schema: a bootstrap
    # history built with a LONG epoch (natural in Spark arithmetic) must
    # round-trip, not crash a later night's schema'd read on INT64→int
    wide = prior.withColumn("assigned_epoch", F.col("assigned_epoch").cast("long"))
    tmp2 = tempfile.mkdtemp(prefix="holdout_wide_")
    try:
        write_holdout_assignments(wide, tmp2, seed="s9")
        back = read_holdout_assignments(spark, tmp2, seed="s9")
        assert {r["doc_id"]: (r["split"], r["assigned_epoch"]) for r in back.collect()} == {
            r["doc_id"]: (r["split"], r["assigned_epoch"]) for r in prior.collect()
        }
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)


def test_nightly_holdout_update_binds_stored_seed(spark):
    """The composed nightly cycle draws fresh splits with the seed the
    STORE records — not whatever default the assignment kernel carries —
    and overwrite-swaps the extended history to a fresh path; prior rows
    are byte-identical across nights."""
    from oc_meta_spark.plans.incremental import (
        nightly_holdout_update,
        read_holdout_assignments,
        write_holdout_assignments,
    )

    prior = spark.createDataFrame(
        [(1, "train", 0), (2, "test", 0)],
        schema="doc_id long, split string, assigned_epoch int",
    )
    # doc 3 bridges 1+2; doc 40 is an all-new singleton → fresh draw
    clustered = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (40, 40)], schema="doc_id long, cluster long"
    )
    night0 = tempfile.mkdtemp(prefix="hnight0_")
    night1 = tempfile.mkdtemp(prefix="hnight1_")
    try:
        write_holdout_assignments(prior, night0, seed="storeseed")
        assigned = nightly_holdout_update(spark, night0, night1, clustered, epoch=1)
        got = {r["doc_id"]: (r["split"], r["status"]) for r in assigned.collect()}
        assert got[1] == ("train", "kept") and got[2] == ("test", "kept")
        assert got[3] == ("train", "inherited")
        # the fresh draw used the STORED seed — recompute it by hand
        b = int(__import__("hashlib").md5(b"storeseed:40").hexdigest()[:12], 16) % 10
        expect = "train" if b < 8 else ("val" if b == 8 else "test")
        assert got[40] == (expect, "fresh")
        # and the swapped-in history carries the night's rows immutably
        hist = {r["doc_id"]: (r["split"], r["assigned_epoch"])
                for r in read_holdout_assignments(spark, night1, seed="storeseed").collect()}
        assert hist[1] == ("train", 0) and hist[2] == ("test", 0)
        assert hist[3] == ("train", 1) and hist[40] == (expect, 1)
    finally:
        shutil.rmtree(night0, ignore_errors=True)
        shutil.rmtree(night1, ignore_errors=True)


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


def test_snapshot_diff_statuses(spark):
    from oc_meta_spark.plans.incremental import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "was this"), (3, "gone soon")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now this"), (4, "brand new")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_text(spark):
    """md5(NULL) is NULL — presence must come from the join side, and the
    hash compare must be null-safe, so NULL-text rows present in both
    snapshots never read as phantom added/removed."""
    from oc_meta_spark.plans.incremental import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "fixed text"), (2, None), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "changed"}


def test_seeded_split_survives_hostile_seed(spark):
    """The seed is DATA (read back from a store's meta table) — a quote
    or SQL metachars in it must not break or alter the split expression
    (seeded_split builds Columns, never interpolates into F.expr)."""
    from oc_meta_spark.plans.incremental import assign_holdout_incremental

    clustered = spark.createDataFrame([(1, 10), (2, 10)], "doc_id long, cluster long")
    prior = spark.createDataFrame([], "doc_id long, split string, assigned_epoch int")
    rows = assign_holdout_incremental(clustered, prior, seed="night's--;drop").collect()
    assert len(rows) == 2 and all(r["status"] == "fresh" for r in rows)
    assert len({r["split"] for r in rows}) == 1  # same cluster, one split


def test_extend_ignores_revision_consistently(spark):
    """Re-adding an existing doc_id with DIFFERENT text (misuse: a
    revision needs a rebuild) must change NOTHING — the hashes side must
    not pick up the new text while signatures/bands keep the old."""
    from oc_meta_spark.plans.incremental import (
        build_signature_index,
        extend_signature_index,
    )

    base = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    idx = build_signature_index(base)
    revised = spark.createDataFrame(
        [(7, "totally different words in here")], "doc_id long, text string"
    )
    ext = extend_signature_index(idx, revised)
    assert sorted(map(tuple, ext.hashes.collect())) == sorted(
        map(tuple, idx.hashes.collect())
    )
    assert ext.signatures.count() == idx.signatures.count()
    assert ext.bands.count() == idx.bands.count()


def test_nightly_update_result_survives_swap(spark, tmp_path):
    """nightly_holdout_update's result must be usable AFTER the caller's
    atomic directory swap invalidates the read path (materialized, not a
    lazy plan over the old files)."""
    import shutil

    from oc_meta_spark.plans.incremental import (
        nightly_holdout_update,
        read_holdout_assignments,
        write_holdout_assignments,
    )

    p1 = str(tmp_path / "v1")
    p2 = str(tmp_path / "v2")
    prior = spark.createDataFrame(
        [(1, "train", 0)], "doc_id long, split string, assigned_epoch int"
    )
    write_holdout_assignments(prior, p1, seed="s1")
    clustered = spark.createDataFrame([(1, 100), (2, 100)], "doc_id long, cluster long")
    assigned = nightly_holdout_update(spark, p1, p2, clustered, epoch=1)
    shutil.rmtree(p1)  # the swap: the old history directory is gone
    got = {r["doc_id"]: (r["split"], r["status"]) for r in assigned.collect()}
    assert got == {1: ("train", "kept"), 2: ("train", "inherited")}
    assert read_holdout_assignments(spark, p2, seed="s1").count() == 2


def test_append_shuffled_shards_grows_without_rewriting(spark, docs):
    """The nightly shard append: membership append≡rebuild exactly (the
    shard is a pure id hash), existing files byte-untouched, retry
    idempotent, seed/epoch guards loud."""
    import os

    import pytest

    from oc_meta_spark.sources.shards import (
        append_shuffled_shards,
        write_shuffled_shards,
    )

    base = docs.limit(150)
    delta = docs.filter(F.col("doc_id") >= 150).limit(80)
    both = base.unionByName(delta)
    store = tempfile.mkdtemp(prefix="shufinc_")
    rebuilt = tempfile.mkdtemp(prefix="shufall_")
    try:
        write_shuffled_shards(base, store, seed="s", n_shards=4, epoch=0)

        def files(root):
            out = {}
            for d, _, fs in os.walk(root):
                for f in fs:
                    p = os.path.join(d, f)
                    if f.endswith(".parquet"):
                        out[p] = os.path.getsize(p)
            return out

        before = files(store)
        append_shuffled_shards(spark, delta, store, seed="s", epoch=1)
        after = files(store)
        # every pre-append file still present with identical size
        assert before == {p: s for p, s in after.items() if p in before}
        assert len(after) > len(before)

        # membership per shard == a full rebuild's (shard is id-hash only)
        write_shuffled_shards(both, rebuilt, seed="s", n_shards=4, epoch=0)
        got = {
            (r["shard"], r["doc_id"])
            for r in spark.read.parquet(store).select("shard", "doc_id").collect()
        }
        want = {
            (r["shard"], r["doc_id"])
            for r in spark.read.parquet(rebuilt).select("shard", "doc_id").collect()
        }
        assert got == want and len(got) == 230

        # retried night (same epoch, same delta): appends nothing
        append_shuffled_shards(spark, delta, store, seed="s", epoch=1)
        assert files(store) == after

        # guards: wrong seed, decreasing epoch
        with pytest.raises(ValueError, match="seed"):
            append_shuffled_shards(spark, delta, store, seed="OTHER", epoch=2)
        with pytest.raises(ValueError, match="epoch"):
            append_shuffled_shards(spark, docs.limit(1), store, seed="s", epoch=0)

        # re-running the BUILD against an existing epoched store is refused
        # (it would silently delete every stored epoch); an explicit
        # overwrite=True is the deliberate-rebuild escape hatch
        with pytest.raises(ValueError, match="append_shuffled_shards"):
            write_shuffled_shards(delta, store, seed="s", n_shards=4, epoch=2)
        assert files(store) == after  # the refused build touched nothing
        write_shuffled_shards(
            base, store, seed="s", n_shards=4, epoch=0, overwrite=True
        )
        assert spark.read.parquet(store).count() == 150  # rebuilt from base

        # a store with no _meta (interrupted build) is refused LOUDLY by
        # the append, with the rebuild instruction in the message
        shutil.rmtree(os.path.join(store, "_meta"))
        with pytest.raises(ValueError, match="_meta"):
            append_shuffled_shards(spark, delta, store, seed="s", epoch=1)

        # epoch-major loader order: within a shard every epoch-0 row
        # precedes epoch-1 rows when sorted by (epoch, sort_key), and
        # within each epoch the seeded order is recoverable
        one = (
            spark.read.parquet(store)
            .filter(F.col("shard") == 0)
            .select("epoch", "sort_key")
            .orderBy("epoch", "sort_key")
            .collect()
        )
        assert [r["epoch"] for r in one] == sorted(r["epoch"] for r in one)
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(rebuilt, ignore_errors=True)


def test_read_shuffled_shards_restores_epoch_major_order(spark, docs):
    from oc_meta_spark.sources.shards import (
        append_shuffled_shards,
        read_shuffled_shards,
        write_shuffled_shards,
    )

    store = tempfile.mkdtemp(prefix="shufread_")
    try:
        write_shuffled_shards(docs.limit(60), store, seed="s", n_shards=2, epoch=0)
        append_shuffled_shards(
            spark, docs.filter(F.col("doc_id") >= 60).limit(40), store, seed="s", epoch=1
        )
        rows = read_shuffled_shards(spark, store, restore_order=True).select(
            "shard", "epoch", "sort_key", "doc_id"
        ).collect()
        keyed = [(r["shard"], r["epoch"], r["sort_key"], r["doc_id"]) for r in rows]
        assert keyed == sorted(keyed) and len(keyed) == 100
    finally:
        shutil.rmtree(store, ignore_errors=True)


def test_hs3_composed_growth_planted_paths(spark, sf_dir):
    """HS3's composition over the real clustering kernel: every old doc
    comes back 'kept' with yesterday's split byte-identical; the rotation
    plants (%30==0 — same shingle set as the old neighbor's repeated
    triple, DIFFERENT md5) merge through the banded near-dup path and
    inherit; the exact-copy plants (%50==0 with a raw-text donor) inherit
    through the exact path; and the rotation docs are provably NOT exact
    duplicates of their donor (text differs), so the inherit really went
    through banding."""
    from oc_meta_spark.plans.incremental import seeded_split
    from oc_meta_spark.plans.incremental_queries import (
        hs3_composed_holdout_growth,
        hs3_planted_corpus,
        lsh_clusters,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    planted = hs3_planted_corpus(docs)
    got = {r["doc_id"]: (r["split"], r["status"])
           for r in hs3_composed_holdout_growth(spark, sf_dir).collect()}

    # yesterday's assignment, re-derived independently here
    old = planted.filter(F.col("doc_id") % 10 != 0)
    prior = {r["doc_id"]: r["split"]
             for r in lsh_clusters(old)
             .select("doc_id", seeded_split("hs3", "cluster").alias("split"))
             .collect()}
    assert set(prior) == {d for d in got if d % 10 != 0}
    for d, split in prior.items():
        assert got[d] == (split, "kept"), d  # old docs NEVER move

    texts = {r["doc_id"]: r["text"] for r in planted.collect()}
    rotated = [d for d in got if d % 30 == 0 and d + 1 in texts
               and len(texts[d + 1].split(" ")) >= 3]
    assert rotated, "no rotation plant at this SF — vacuous"
    # a donor whose leading triple is all one word is rotation-INVARIANT:
    # its rotated plant equals the donor's repeated triple verbatim and
    # legitimately inherits through the exact path instead — count those
    # separately so the banded-path proof is asserted on the remainder
    # only (round-10 ADVICE: the blanket texts-differ assert was
    # fixture-data-dependent)
    variant = [d for d in rotated
               if len(set(texts[d + 1].split(" ")[:3])) > 1]
    assert variant, "every rotation donor is rotation-invariant — vacuous"
    for d in rotated:
        # guaranteed merge into the old neighbor's cluster → the
        # neighbor's (kept) split is inherited ...
        assert got[d] == (prior[d + 1], "inherited"), d
    for d in variant:
        # ... and where the rotation actually changed the text, the
        # exact-hash path cannot have shortcut the banding
        assert texts[d] != texts[d + 1], d

    copied = [d for d in got if d % 50 == 0 and d % 30 != 0 and d + 1 in texts
              and (d + 1) % 30 != 1]
    assert copied, "no exact-copy plant at this SF — vacuous"
    for d in copied:
        assert texts[d] == texts[d + 1], d
        assert got[d] == (prior[d + 1], "inherited"), d

    # the fresh path exists: some new doc in an all-new cluster
    assert any(got[d][1] == "fresh" for d in got if d % 10 == 0)
