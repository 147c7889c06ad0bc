"""Incremental-corpus operations: the production shapes a GROWING corpus
runs nightly, rather than the within-corpus batch ops of dedup_queries.

1.  **Signature-index dedup** — dedup a NEW batch of documents against a
    PERSISTED signature index of the existing corpus, never re-scanning
    the corpus text.  The index holds, per existing document:

    - the exact content hash ``md5(text)`` (one row per distinct hash,
      carrying the minimum holder doc_id — the canonical match target),
    - the k=8 MinHash signature over 3-word shingles (8 small rows/doc),
    - the 4-band × 2-row LSH band buckets (4 rows/doc).

    Dedup of a delta batch is then: exact via a hash equi-join, near-dup
    via a delta-vs-index banded join (candidates only — NEVER
    index-vs-index) verified by signature agreement (≥ ``NEAR_MIN_AGREE``
    of the 8 minhash positions equal — the standard estimated-Jaccard
    verify that needs no stored shingle sets).  This is the corpus-scale
    generalization of the reference's existing-ID row filter
    (reference oc_meta/run/meta/preprocess_input.py:157-193: drop an
    input row when its ids are already in the Redis cache), composing the
    repo's D8 exact dedup with D16's banded MinHash.

    Scale shape (100 TB corpus, ~1 TB nightly delta): the index is
    O(docs × 13) tiny rows — parquet-persisted, ``hashes/`` hive-
    partitioned by the 2-char hash prefix and ``bands/`` by band.  Every
    index side is LEFT-SEMI PREFILTERED on a broadcast of the delta's
    keys (its distinct (hp, h) hashes, its distinct (band, bucket)
    buckets, the candidate i_ids) BEFORE the classification joins — so
    the corpus-sized index is only ever SCANNED (never shuffled), every
    shuffle carries delta-proportional rows, and work is proportional to
    the DELTA, not the corpus; no CartesianProduct anywhere; signature
    verify joins only candidate pairs produced by the banded blocking.
    (At extreme delta sizes where the broadcast probes outgrow the
    driver, bucket the index tables on their join keys instead and let
    SMJ co-locate — the prefilter structure is unchanged.)

2.  **Seeded deterministic corpus shuffle** — a reproducible global
    training permutation: ``sort_key = md5(seed || ':' || doc_id)``,
    shard = first 48 bits (12 hex chars) of the key mod ``n_shards``
    (deterministic
    hash-range split — NOT repartitionByRange, whose sampled boundaries
    are nondeterministic), position = rank of the key within the shard.
    Same seed → identical permutation on every run/cluster; different
    seed → a fresh permutation.  Per-shard windows are partition-parallel
    (no global single-partition sort).

3.  **Incremental holdout assignment** — HS1's leakage-safe split for a
    GROWING corpus: previously-assigned docs never move, new docs inherit
    their cluster's earliest-assigned split, all-new clusters get HS1's
    seeded-hash split (see ``assign_holdout_incremental``); the history
    persists split-partitioned with a seed/rule config guard and appends
    delta-keyed + idempotently (``write/read/append_holdout_assignments``).

4.  **Snapshot diff** — the added/removed/changed/unchanged audit between
    two corpus snapshots (``snapshot_diff``): hash-projected scans + one
    full outer key join, the dataset-versioning check a nightly pipeline
    runs before promoting a new snapshot.

The STREAMING composition of (1) — continuous ingestion with online
dedup over a manifest-committed store — lives in
:mod:`oc_meta_spark.streaming.ingest` and shares this module's kernels.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

N_MINHASH = 8  # k hash functions (md5(s || '#' || k), min per k)
N_BAND_ROWS = 2  # rows per LSH band → 4 bands; P(candidate | s≈0.95) > 0.999
NEAR_MIN_AGREE = 6  # of 8 signature positions must match to verify near-dup
INDEX_LAYOUT = "hp_band_v2"  # meta marker: hashes/ partitioned by hp, bands/ by band
# compact the delta-cp hashes chain every K batches (see
# extend_signature_index_delta_cp) — K trades per-batch probe depth
# against the amortized full-checkpoint write; 8 keeps both O(small)
HASH_CHAIN_COMPACT_EVERY = 8


@dataclass
class SignatureIndex:
    """The persisted dedup index of the existing corpus (see module doc)."""

    hashes: DataFrame  # (h, idx_id): md5(text) → min holder doc_id
    signatures: DataFrame  # (doc_id, k, h): MinHash signature rows
    bands: DataFrame  # (doc_id, band, bucket): LSH band buckets


def minhash_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, k, h): k=8 MinHash rows over 3-word shingles (D16's
    scheme — md5(shingle || '#' || k), min per k; docs shorter than one
    shingle yield no rows and can never near-match)."""
    from oc_meta_spark.plans.dedup_queries import _shingles

    ks = docs.sparkSession.range(N_MINHASH).select(F.col("id").cast("int").alias("k"))
    return (
        _shingles(docs)
        .crossJoin(F.broadcast(ks))
        .select(
            "doc_id",
            "k",
            F.md5(F.concat(F.col("s"), F.lit("#"), F.col("k").cast("string"))).alias("h"),
        )
        .groupBy("doc_id", "k")
        .agg(F.min("h").alias("h"))
    )


def band_buckets(signatures: DataFrame, n_band_rows: int = N_BAND_ROWS) -> DataFrame:
    """(doc_id, band, bucket): band = k div n_band_rows, bucket = md5 of
    the band's minhashes joined in k order.  This (with minhash_signature)
    is the ONE MinHash/banding kernel in the repo — D16's within-corpus
    near-dup uses it at n_band_rows=4, the incremental index at 2."""
    return (
        signatures.withColumn("band", F.expr(f"k div {n_band_rows}"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("k", "h"))), lambda s: s["h"]
                    ),
                    "|",
                )
            ).alias("bucket")
        )
    )


def fresh_only(delta: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """Delta rows whose ``key`` the (corpus-sized) ``existing`` table does
    not already hold — the ONE delta-keyed retry-idempotency guard every
    nightly append uses (signature index, IVF inverted lists, holdout
    history).  Broadcast semi/anti probes keyed on the delta's ids: the
    existing side is scanned, never shuffled; a retried append finds all
    its keys already present and appends nothing."""
    ids = delta.select(key).dropDuplicates()
    already = (
        existing.join(F.broadcast(ids), key, "left_semi").select(key).dropDuplicates()
    )
    return delta.join(F.broadcast(already), key, "left_anti")


def content_hashes(docs: DataFrame) -> DataFrame:
    """(h, idx_id, hp): one row per distinct md5(text) with the minimum
    holder doc_id — the exact-dedup side of the index.  hp = 2-char hash
    prefix: the hive partition column of the persisted hashes/ table
    (256 uniform partitions) and part of the exact-probe join key."""
    return (
        docs.select(F.md5("text").alias("h"), F.col("doc_id"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("idx_id"))
        .withColumn("hp", F.substring("h", 1, 2))
    )


def build_signature_index(docs: DataFrame) -> SignatureIndex:
    """Build the dedup index for an existing-corpus slice: exact content
    hashes (min holder id per distinct hash) + MinHash signatures + band
    buckets."""
    signatures = minhash_signature(docs)
    return SignatureIndex(
        hashes=content_hashes(docs),
        signatures=signatures,
        bands=band_buckets(signatures),
    )


def write_signature_index(index: SignatureIndex, path: str) -> None:
    """Persist the index as three parquet tables under ``path`` —
    ``hashes/`` hive-partitioned by the 2-char hash prefix ``hp`` (256
    uniform md5 partitions; bounded file sizes and prefix-local rebuild/
    compaction), ``bands/`` by ``band`` (each of the 4 band joins reads
    only its own quarter of the index), ``signatures/`` plain — plus a
    one-row ``meta/`` table recording the MinHash/band configuration the
    signatures were built with (the layout a nightly job overwrite-swaps;
    same contract as sources/shards.py: plain parquet dirs, no
    side-channel state)."""
    from oc_meta_spark.plans.store_contract import write_store

    write_store(
        path,
        {
            "hashes": (index.hashes, "hp"),
            "signatures": (index.signatures, None),
            "bands": (index.bands, "band"),
        },
        "n_minhash int, n_band_rows int, layout string",
        (N_MINHASH, N_BAND_ROWS, INDEX_LAYOUT),
    )


def read_signature_index(spark: SparkSession, path: str) -> SignatureIndex:
    """Load a persisted index, refusing one built under a DIFFERENT
    MinHash/band configuration: signatures from mismatched k or band
    geometry would join silently and misclassify (a 4-row-band index
    probed with 2-row-band buckets never candidates; a k=16 index halves
    every agreement count).  Pre-meta indexes (no ``meta/`` dir) load
    unguarded for compatibility."""
    from oc_meta_spark.plans.store_contract import check_meta, read_meta, read_table

    # required=False: pre-meta indexes (no meta/ dir) load unguarded —
    # the contract's any-FS-safe absent probe (the read itself, not a
    # local os.path check)
    meta = read_meta(spark, path, required=False)
    layout = None
    if meta is not None:
        check_meta(
            meta,
            {"n_minhash": N_MINHASH, "n_band_rows": N_BAND_ROWS},
            path,
            "signature index",
        )
        layout = meta.asDict().get("layout")
        if layout is not None:
            check_meta(meta, {"layout": INDEX_LAYOUT}, path, "signature index")
    # EXPLICIT read schemas, not directory-name inference (which would
    # read an all-numeric prefix like 07 as INT and drop the leading
    # zero) and not recomputation: hp must come back as the scan's true
    # PARTITION ATTRIBUTE, because dedup_against_index's (hp, h) probe
    # can only dynamic-partition-prune hashes/ through a partition
    # attribute — a recomputed substring(h, 1, 2) projection would read
    # all 256 partitions every night.  The layout marker in meta/ selects
    # the branch — a one-row read, not a second partition-discovery pass
    # over the corpus-sized hashes/ directory.
    if layout == INDEX_LAYOUT:
        hashes = read_table(spark, path, "hashes", "h string, idx_id bigint, hp string")
    else:  # pre-layout-marker index: unpartitioned — derive hp; no pruning
        hashes = spark.read.parquet(os.path.join(path, "hashes")).withColumn(
            "hp", F.substring("h", 1, 2)
        )
    return SignatureIndex(
        hashes=hashes,
        signatures=read_table(spark, path, "signatures", None),
        bands=read_table(
            spark, path, "bands", "doc_id bigint, band bigint, bucket string"
        ),
    )


def extend_signature_index(index: SignatureIndex, new_docs: DataFrame) -> SignatureIndex:
    """The nightly append: fold the batch's SURVIVING documents (typically
    the 'unique' verdicts of dedup_against_index) into the index so the
    next delta dedups against them too.  Signatures and bands are disjoint
    per doc_id, so they union; exact hashes re-aggregate min holder per
    hash — equivalent to rebuilding from the full corpus (pinned by
    tests/test_incremental.py::test_extend_index_equals_rebuild), but at
    the cost of the DELTA only.

    Idempotent AND revision-inert: docs the index already witnesses —
    any doc_id in signatures, or holding a hash's min-holder slot — are
    dropped at the DOC level before the delta index is built, so a
    retried append changes nothing and a misuse re-add of an existing
    doc_id with DIFFERENT text (a revision, which needs a rebuild) is
    ignored consistently across ALL THREE tables rather than slipping its
    new hash in while its signatures stay stale.  The one unwitnessable
    case — a sub-3-word doc that was never a hash min-holder — has no
    signature rows to contradict; the ingest store's verdict log
    (streaming/ingest.py) closes even that gap by refusing revisions
    outright.

    Delta-keyed like dedup_against_index (round 9): every corpus-sized
    index side is probed with a BROADCAST of delta-derived keys (left-
    semi/anti — a scan, not a shuffle); the only re-aggregation is over
    the delta-bounded ``touched`` hash rows, so the append literally
    costs O(delta).
    """
    known = index.signatures.select("doc_id").unionByName(
        index.hashes.select(F.col("idx_id").alias("doc_id"))
    )
    delta = build_signature_index(fresh_only(new_docs, known, "doc_id"))

    probe = delta.hashes.select("hp", "h")
    # (the equi-join moves its keys to the front — restore build order so
    # the union'd index is column-identical to a rebuilt one)
    touched = index.hashes.join(F.broadcast(probe), ["hp", "h"], "left_semi").select(
        "h", "idx_id", "hp"
    )
    untouched = index.hashes.join(F.broadcast(probe), ["hp", "h"], "left_anti").select(
        "h", "idx_id", "hp"
    )
    merged = (
        touched.unionByName(delta.hashes)
        .groupBy("h")
        .agg(F.min("idx_id").alias("idx_id"))
        .withColumn("hp", F.substring("h", 1, 2))
    )

    # the doc-level guard above already dropped every known doc_id, so
    # the delta's signature/band rows are disjoint from the index's
    return SignatureIndex(
        hashes=untouched.unionByName(merged),
        signatures=index.signatures.unionByName(delta.signatures),
        bands=index.bands.unionByName(delta.bands),
    )


def materialized_signature_index(docs: DataFrame) -> SignatureIndex:
    """``build_signature_index`` with every table ``localCheckpoint``-ed
    in DEPENDENCY order, for callers that are about to probe the index
    repeatedly (the ingest folds).

    The point of the ordering: ``bands`` is derived from the
    CHECKPOINTED signatures frame, so the shingle-explode + 8-way MinHash
    pass — the expensive part of the build — runs exactly once.
    Checkpointing a lazily-built index table-by-table instead runs that
    pass twice, because the bands plan embeds its own copy of the minhash
    subtree (r12 measurement: the double pass was ~40% of the fold's
    index-bootstrap cost).  Frames are tagged so the folds'
    ``_checkpointed_index`` wrapper can skip re-materializing them."""
    sigs = minhash_signature(docs).localCheckpoint()
    idx = SignatureIndex(
        hashes=content_hashes(docs).localCheckpoint(),
        signatures=sigs,
        bands=band_buckets(sigs).localCheckpoint(),
    )
    for df in (idx.hashes, idx.signatures, idx.bands):
        df._ocms_materialized = True  # type: ignore[attr-defined]
    return idx


def extend_signature_index_delta_cp(
    index: SignatureIndex, new_docs: DataFrame
) -> SignatureIndex:
    """``extend_signature_index`` with only the DELTA materialized — the
    in-memory fold's extend step (plans/nightly.py, streaming/ingest.py).

    ``extend_signature_index`` is lazy; the folds used to materialize its
    whole OUTPUT per batch, re-writing the corpus-sized hashes/signatures/
    bands tables every step.  This variant checkpoints the delta-sized
    pieces only (the fresh docs' signatures, bands, hashes, and the
    re-aggregated touched-hash rows) and leaves the unions lazy over the
    already-checkpointed base — exactly what the persisted path does
    structurally (``ingest_batch`` appends O(batch) delta files and never
    rewrites the snapshot).  Probe cost over the result is unchanged:
    ``dedup_against_index`` scans the union pieces with the same
    broadcast semi-prefilters; plan depth grows one thin union/anti layer
    per batch (linear, over shallow LogicalRDD bases — not the
    combinatorial growth the materialization guards against).

    Value-equivalence with ``extend_signature_index`` is pinned by
    tests/test_incremental.py::test_extend_delta_cp_equals_extend.

    The MinHash pass over the delta runs once (bands derive from the
    checkpointed delta signatures — same dependency-order rationale as
    :func:`materialized_signature_index`)."""
    known = index.signatures.select("doc_id").unionByName(
        index.hashes.select(F.col("idx_id").alias("doc_id"))
    )
    fresh = fresh_only(new_docs, known, "doc_id")
    d_sigs = minhash_signature(fresh).localCheckpoint()
    d_bands = band_buckets(d_sigs).localCheckpoint()
    d_hashes = content_hashes(fresh).localCheckpoint()

    probe = d_hashes.select("hp", "h")
    touched = index.hashes.join(F.broadcast(probe), ["hp", "h"], "left_semi").select(
        "h", "idx_id", "hp"
    )
    untouched = index.hashes.join(F.broadcast(probe), ["hp", "h"], "left_anti").select(
        "h", "idx_id", "hp"
    )
    merged = (
        touched.unionByName(d_hashes)
        .groupBy("h")
        .agg(F.min("idx_id").alias("idx_id"))
        .withColumn("hp", F.substring("h", 1, 2))
        .localCheckpoint()
    )
    # Periodic chain compaction (r13, r12 ADVICE): the lazy hashes result
    # is an anti-join LAYER over the previous hashes frame, so a long
    # streaming fold grows a depth-N chain whose every probe re-evaluates
    # all N anti filters over the base — O(batches²) scan work and
    # unbounded plan depth.  Every K batches the union is fully
    # checkpointed, resetting the chain to a shallow LogicalRDD at an
    # amortized O(corpus/K) write per batch; value-neutral
    # (localCheckpoint never changes rows — pinned by
    # tests/test_incremental.py::test_delta_cp_chain_compaction).
    hashes = untouched.unionByName(merged)
    depth = getattr(index.hashes, "_ocms_chain_depth", 0) + 1
    if depth >= HASH_CHAIN_COMPACT_EVERY:
        hashes = hashes.localCheckpoint()
        depth = 0
    hashes._ocms_chain_depth = depth  # type: ignore[attr-defined]
    return SignatureIndex(
        hashes=hashes,
        signatures=index.signatures.unionByName(d_sigs),
        bands=index.bands.unionByName(d_bands),
    )


def dedup_against_index(
    batch: DataFrame, index: SignatureIndex, max_bucket_width: int | None = None
) -> DataFrame:
    """Classify every batch document against the existing-corpus index:
    (doc_id, verdict ∈ exact_dup|near_dup|unique, matched_existing).

    ``max_bucket_width`` is the viral-document guard (off by default): a
    document duplicated across the whole corpus puts thousands of index
    docs into one (band, bucket), and every batch doc landing there would
    candidate against ALL of them — quadratic pair blow-up on the hot
    key.  When set, each bucket keeps only its ``max_bucket_width``
    smallest index doc_ids as candidates.  The reported match is
    unchanged for homogeneous viral buckets (matches report the MIN
    agreeing doc_id, and the cap keeps exactly the smallest ids); exact
    duplicates are never affected (the hash path does not block on
    buckets); heterogeneous mega-buckets trade recall for boundedness —
    the standard LSH production knob.

    exact_dup: content hash present in the index (match = the index's
    canonical min holder).  near_dup: a banded-LSH candidate whose
    signature agrees on ≥ NEAR_MIN_AGREE of 8 positions (match = min
    agreeing existing doc_id).  Precedence: exact > near > unique.

    Nightly-scale discipline (the reference analog is the batched-probe
    loop of oc_meta/run/meta/preprocess_input.py:49-77 — probe the store
    with the batch's keys, never scan the store into the batch): every
    corpus-sized index table is LEFT-SEMI PREFILTERED on a broadcast of
    delta-derived keys before it joins — hashes on the batch's distinct
    (hp, h), bands on the batch's distinct (band, bucket), signatures on
    the candidate i_ids — so the index is scanned once per probe and
    NEVER shuffled; every exchange downstream carries delta-proportional
    rows.
    """
    bhash = batch.select("doc_id", F.md5("text").alias("h"))
    probe_h = bhash.select(F.substring("h", 1, 2).alias("hp"), "h").dropDuplicates()
    # joining on (hp, h) rather than h alone lets dynamic partition
    # pruning skip hashes/ partitions on the persisted-index path
    pruned_hashes = index.hashes.join(F.broadcast(probe_h), ["hp", "h"], "left_semi")
    exact = (
        bhash.join(pruned_hashes.select("h", "idx_id"), "h", "left")
        .select("doc_id", F.col("idx_id").alias("exact_id"))
    )

    bsig = minhash_signature(batch)
    bband = band_buckets(bsig)
    probe_b = bband.select("band", "bucket").dropDuplicates()
    iband = (
        index.bands.select(F.col("doc_id").alias("i_id"), "band", "bucket")
        .join(F.broadcast(probe_b), ["band", "bucket"], "left_semi")
    )
    if max_bucket_width is not None:
        # applied AFTER the delta prefilter, so the rank window runs over
        # delta-touched buckets only; ordering by i_id keeps the smallest
        # ids, preserving the min-id match contract for homogeneous
        # buckets
        w_bw = Window.partitionBy("band", "bucket").orderBy("i_id")
        iband = (
            iband.withColumn("_bw", F.row_number().over(w_bw))
            .filter(F.col("_bw") <= max_bucket_width)
            .drop("_bw")
        )
    cand = (
        bband.join(iband, ["band", "bucket"])
        .select(F.col("doc_id").alias("b_id"), "i_id")
        .dropDuplicates()
    )
    # every iband survivor shares a bucket with the batch, so its i_id IS
    # a candidate — the signature probe set, without recomputing cand
    cand_ids = iband.select("i_id").dropDuplicates()
    isig = (
        index.signatures.select(F.col("doc_id").alias("i_id"), "k", "h")
        .join(F.broadcast(cand_ids), "i_id", "left_semi")
    )
    agree = (
        cand.join(bsig.withColumnRenamed("doc_id", "b_id"), "b_id")
        .join(isig, ["i_id", "k", "h"])
        .groupBy("b_id", "i_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    near = (
        agree.filter(F.col("n_match") >= NEAR_MIN_AGREE)
        .groupBy("b_id")
        .agg(F.min("i_id").alias("near_id"))
        .withColumnRenamed("b_id", "doc_id")
    )

    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_id").isNotNull(), "exact_dup")
            .when(F.col("near_id").isNotNull(), "near_dup")
            .otherwise("unique")
            .alias("verdict"),
            F.coalesce("exact_id", "near_id").cast("long").alias("matched_existing"),
        )
    )


HOLDOUT_RULE = "48bit_mod10_8_1_1"  # the split hash rule the meta table records


def seeded_split(seed: str, key) -> "F.Column":
    """The ONE 80/10/10 seeded split rule (what ``HOLDOUT_RULE`` names):
    bucket = first 48 bits of md5(seed || ':' || key) mod 10 → buckets
    0-7 train, 8 val, 9 test.  HS1, HS2's synthesized prior, and the
    incremental assigner all call this — editing the rule here is the
    only way to change it, and the expression is built from Column
    functions, never an f-string into ``F.expr`` (a seed read back from a
    store's meta table is DATA; interpolating it into SQL text would let
    a quote in the seed break — or alter — the expression)."""
    key_col = (F.col(key) if isinstance(key, str) else key).cast("string")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), key_col)), 1, 12),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    return F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")


def assign_holdout_incremental(
    clustered: DataFrame, prior: DataFrame, seed: str = "hs2"
) -> DataFrame:
    """Split assignment for a GROWING corpus: (doc_id, split, status).

    HS1 recomputes the seeded split from today's cluster representative —
    correct for a one-shot split, but under nightly growth a new document
    that BRIDGES two existing clusters changes the merged cluster's
    representative, which would flip previously-assigned documents into a
    different split and leak yesterday's train set into tomorrow's test
    set.  The incremental rule (the resumable-cache discipline of
    reference oc_meta/run/meta_process.py:183-190 — processed state is
    immutable across runs):

    - previously-assigned documents NEVER move (status ``kept``);
    - a new document whose cluster contains any assigned member inherits
      the split of the EARLIEST-assigned member — min (assigned_epoch,
      doc_id), a total order since doc_id is unique (status
      ``inherited``);
    - a new document in an all-new cluster gets the seeded 48-bit hash
      split of its cluster id, HS1's rule (status ``fresh``).

    A cluster merged ACROSS splits by a bridging doc keeps its old
    members' (differing) splits — the residual straddle is the price of
    stability and is visible to callers via the cluster table; re-splitting
    it would be the leak.

    ``clustered``: (doc_id, cluster) — TODAY's clustering of the full
    corpus.  ``prior``: (doc_id, split, assigned_epoch) — the immutable
    assignment history.

    Scale shape: the new-doc set is one narrow anti-join on doc_id (both
    sides bucketable); the anchor pass is DELTA-KEYED — only clusters
    that actually contain a new doc are anchored.  The touched-cluster
    probe is a broadcast semi (one narrow id per new doc, the same
    delta-bounded class as dedup_against_index's probes); the prior-
    history probe on the touched clusters' MEMBERSHIP is deliberately
    UNHINTED — a mega-cluster or a dense delta can make the membership
    corpus-sized, so AQE broadcasts it when small and falls back to a key
    shuffle when it is not (the round-5 merge-path lesson: never force-
    broadcast a side whose size the data controls).  The join +
    per-cluster window then run over touched-cluster rows only;
    assignment is one left join on cluster.
    """
    kept = prior.select("doc_id", "split", F.lit("kept").alias("status"))
    new_docs = clustered.join(prior.select("doc_id"), "doc_id", "left_anti")
    # anchors are only consumed for clusters holding a new doc — probe
    # down both corpus-sized inputs before the join/window
    touched = new_docs.select("cluster").dropDuplicates()
    members = clustered.join(F.broadcast(touched), "cluster", "left_semi")
    prior_members = prior.join(
        members.select("doc_id").dropDuplicates(), "doc_id", "left_semi"
    )
    w = Window.partitionBy("cluster").orderBy("assigned_epoch", "doc_id")
    anchors = (
        members.join(prior_members, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster", F.col("split").alias("inherited_split"))
    )
    assigned = new_docs.join(anchors, "cluster", "left").select(
        "doc_id",
        F.coalesce(
            F.col("inherited_split"), seeded_split(seed, "cluster")
        ).alias("split"),
        F.when(F.col("inherited_split").isNotNull(), "inherited")
        .otherwise("fresh")
        .alias("status"),
    )
    return kept.unionByName(assigned)


def append_holdout_assignments(
    prior: DataFrame, assigned: DataFrame, epoch: int
) -> DataFrame:
    """Fold one night's NEW assignments (the ``inherited``/``fresh`` rows
    of assign_holdout_incremental's output) into the immutable history:
    prior rows pass through untouched, new docs append with this epoch as
    their assignment time — the tie-break key future inheritances use.

    Delta-keyed and retry-idempotent like the index appends: the corpus-
    sized history is probed with a broadcast of the night's doc_ids
    (left-semi — a scan), and docs already in the history are anti-joined
    away, so a crashed-and-retried night never duplicates or moves an
    assignment."""
    new = assigned.filter(F.col("status") != "kept").select(
        "doc_id", "split", F.lit(epoch).cast("int").alias("assigned_epoch")
    )
    return prior.unionByName(fresh_only(new, prior, "doc_id"))


def write_holdout_assignments(history: DataFrame, path: str, seed: str) -> None:
    """Persist the assignment history — (doc_id, split, assigned_epoch),
    hive-partitioned by ``split`` so a trainer reading one split
    partition-prunes to its own files — plus the one-row ``meta/`` table
    recording the seed and split rule (same overwrite-swap contract as
    the signature index; SCALING.md: the split is computed alongside the
    nightly index refresh and persisted with the shards).

    The write NORMALIZES to the store's pinned schema (doc_id bigint,
    assigned_epoch int, split string) — read_holdout_assignments reads
    with that exact schema, and parquet's vectorized reader refuses an
    INT64→int narrowing, so a bootstrap history built with a long epoch
    must be narrowed here, at write time, not crash a later night's
    read."""
    from oc_meta_spark.plans.store_contract import write_store

    normalized = history.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("split").cast("string").alias("split"),
        F.col("assigned_epoch").cast("int").alias("assigned_epoch"),
    )
    write_store(
        path,
        {"assignments": (normalized, "split")},
        "seed string, rule string",
        (seed, HOLDOUT_RULE),
    )


def _read_holdout_meta(spark: SparkSession, path: str):
    from oc_meta_spark.plans.store_contract import read_meta

    return read_meta(spark, path)


def _read_assignments(spark: SparkSession, path: str) -> DataFrame:
    from oc_meta_spark.plans.store_contract import read_table

    return read_table(
        spark, path, "assignments", "doc_id bigint, assigned_epoch int, split string"
    ).select("doc_id", "split", "assigned_epoch")


def read_holdout_assignments(spark: SparkSession, path: str, seed: str) -> DataFrame:
    """Load the history, refusing one written under a different seed or
    split rule: fresh splits drawn with a different seed would be
    inconsistent with every split already in the history — the silent
    cross-epoch leak this store exists to prevent."""
    from oc_meta_spark.plans.store_contract import check_meta

    meta = _read_holdout_meta(spark, path)
    check_meta(
        meta,
        {"seed": seed, "rule": HOLDOUT_RULE},
        path,
        "holdout history",
        hint="a mismatched seed would assign new docs inconsistently with "
        "the existing history",
    )
    return _read_assignments(spark, path)


def nightly_holdout_update(
    spark: SparkSession,
    read_path: str,
    write_path: str,
    clustered: DataFrame,
    epoch: int,
) -> DataFrame:
    """The composed nightly cycle — read history, assign, append, persist
    — with the SEED BINDING in one place: fresh splits are drawn with the
    seed the store's meta records, so the read guard and the fresh-split
    draw can never silently diverge (wiring the pieces by hand with two
    different seeds is exactly the cross-seed inconsistency the guard
    documents).  The extended history lands at ``write_path`` — a fresh
    directory the caller atomically swaps in — never in place over the
    files being read: Spark refuses overwriting an input path, and a
    mid-write crash must not corrupt the only copy of the history (the
    same overwrite-swap discipline as the signature index).  Returns the
    night's assignment (doc_id, split, status) — MATERIALIZED
    (localCheckpoint), because its lineage reads read_path, which the
    caller's swap is about to invalidate; a lazy return would throw (or
    silently recompute against the new history) when collected after the
    swap.  The rule is re-checked against ``HOLDOUT_RULE`` here (the meta
    is read once; re-calling the guarded reader with a seed copied from
    the same file would re-read it to verify a tautology)."""
    meta = _read_holdout_meta(spark, read_path)
    seed = meta["seed"]
    if meta["rule"] != HOLDOUT_RULE:
        raise ValueError(
            f"holdout history at {read_path} uses rule={meta['rule']}; this "
            f"build implements {HOLDOUT_RULE} — rebuild or migrate the history"
        )
    prior = _read_assignments(spark, read_path)
    assigned = assign_holdout_incremental(
        clustered, prior, seed=seed
    ).localCheckpoint()
    write_holdout_assignments(
        append_holdout_assignments(prior, assigned, epoch), write_path, seed=seed
    )
    return assigned


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "doc_id") -> DataFrame:
    """Corpus snapshot diff — (key, status, old_hash, new_hash) with
    status ∈ added | removed | changed | unchanged: the dataset-versioning
    audit between two corpus snapshots (what did last night's run add,
    drop, or rewrite?).  Content identity is md5 of the text, so the diff
    never compares full documents — the generalization of the reference's
    export-consistency check (oc_meta/run/check_results.py compares a
    dump against the store row-by-row) to whole-corpus versioning.

    Scale shape: one full outer equi-join on the key — both snapshot
    scans project (key, md5) only (narrow), and the join co-locates when
    the snapshots are bucketed/sorted by the key, which a snapshot store
    should be (sources/shards.py writes doc_id-sorted files).

    Presence is keyed on explicit side markers, NOT on the hash's
    nullability: md5(NULL) is NULL, so a NULL-text row present in both
    snapshots must still read as changed/unchanged (null-safe hash
    compare), never as a phantom added/removed."""
    o = old.select(
        F.col(key), F.md5("text").alias("old_hash"), F.lit(True).alias("in_old")
    )
    n = new.select(
        F.col(key), F.md5("text").alias("new_hash"), F.lit(True).alias("in_new")
    )
    return o.join(n, key, "full_outer").select(
        key,
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), "changed")
        .otherwise("unchanged")
        .alias("status"),
        "old_hash",
        "new_hash",
    )


def seeded_shuffle(
    docs: DataFrame, seed: str, n_shards: int, id_col: str = "doc_id", with_pos: bool = True
) -> DataFrame:
    """Append the deterministic training-shuffle columns: ``sort_key`` =
    md5(seed || ':' || id), ``shard`` = the key's first 48 bits mod
    n_shards (uniform for any realistic shard count — a 100 TB corpus at
    512 MB shards needs ~200k shards, far below 2^48; a single-nibble
    split would cap effective shards at 16), ``pos`` = 1-based rank of
    the key within the shard (ties impossible — the key embeds the
    unique id, but doc_id tie-breaks anyway).

    ``with_pos=False`` skips the rank window — the shard sink orders by
    sorting within write partitions instead, so it never needs (or pays
    for) the explicit rank."""
    keyed = docs.withColumn(
        "sort_key", F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    ).withColumn(
        "shard",
        (
            F.expr("cast(conv(substr(sort_key, 1, 12), 16, 10) as bigint)") % n_shards
        ).cast("int"),
    )
    if not with_pos:
        return keyed
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return keyed.withColumn("pos", F.row_number().over(w).cast("long"))
