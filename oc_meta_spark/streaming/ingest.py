"""Streaming corpus ingestion with ONLINE dedup: the continuous form of
the nightly ID1 loop (plans/incremental.py).

A feed of new documents arrives as files; each micro-batch is classified
against the PERSISTED signature index of everything ingested so far
(exact content hash + banded MinHash with signature-agreement verify —
``dedup_against_index``), survivors join the corpus, and the index grows
by exactly the survivors' signature rows.  This is the streaming
composition of the reference's two disciplines: the existing-ID row
filter (reference oc_meta/run/meta/preprocess_input.py:157-193 — drop
input rows the store already knows) and the resumable completed-file
cache (reference oc_meta/run/meta_process.py:181-193 — work is never
redone after a crash), re-expressed as Structured Streaming +
``foreachBatch`` over a manifest-committed parquet store (the shared
write-new + atomic-swap machinery of streaming/store.py, which
micro_batch.py's curation store also runs on).

Semantics (mirrored 1:1 by the IN1 gate's DuckDB oracle):

- **in-batch exact dedup first**: each micro-batch collapses to one
  holder per distinct content hash (min doc_id); non-holders report
  ``exact_dup`` with ``matched_existing`` = the holder's own resolution
  (the corpus doc the holder matched, else the holder itself — the doc
  that actually enters the corpus);
- **cross-index classification**: holders are classified by
  ``dedup_against_index`` — ``exact_dup`` / ``near_dup`` /
  ``unique`` with the canonical matched corpus doc;
- **survivors** (unique holders) extend the corpus and the index, so a
  later micro-batch deduplicates against them too;
- **granularity contract**: near-duplicate pairs WITHIN one micro-batch
  are not deduplicated here — that is the within-corpus D16 pass's job
  at compaction time; the stream guarantees no exact duplicate ever
  enters the corpus and no exact/near duplicate of any PRIOR corpus
  document does.

Crash/replay: the foreachBatch body is guarded by the store's processed
set (the verdict log) — a replayed micro-batch whose previous attempt
committed finds all its doc_ids already logged and appends nothing; an
attempt that crashed before the manifest swap left no visible state at
all.  Store reads always go through the last committed manifest, so a
reader never sees a half-written batch.

Scale shape (continuous ingestion at 100 TB corpus): every index side in
the batch classification is left-semi prefiltered on broadcast
delta-derived keys (see ``dedup_against_index``) — the corpus-sized
index is scanned, never shuffled; each batch appends O(batch) delta
files; ``compact_ingest_store`` periodically merges the accumulated
delta directories into one key-laid-out snapshot per table (the Delta
OPTIMIZE analog, same manifest swap) so per-read file counts stay
bounded.

``nightly=True`` composes EVERY persisted corpus store into the same
commit: the batch's survivors also produce postings, LM-count and
domain-stat deltas (plans/nightly.py is the bounded in-memory form; the
IN2 gate pins the composition's values), all landing under the ONE
manifest swap — corpus, index and derived stores update together or not
at all, and the verdict-log replay guard protects every table at once.
The DECONTAMINATION composition rides the same commits at two cadences:
each batch's survivors are probed against the persisted benchmark gram
index (contamination verdicts land with the batch), and
``ingest_benchmarks`` extends the index on eval-set releases with a
retroactive probe of the existing corpus — every (doc, benchmark)
collision recorded exactly once however the cadences interleave
(plans/nightly.py::nightly_decontam_fold is the bounded form; the IN3
gate pins the values against DC1's from-scratch SQL).

The manifest records the store's MODE (plain | nightly) at its first
commit; every ingest/read call checks it (``check_store_mode`` /
``_require_nightly``) — mixing modes would maintain the derived tables
for only some commits, silently under-counting the other mode's
documents.
"""

from __future__ import annotations

import os
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.incremental import (
    SignatureIndex,
    band_buckets,
    build_signature_index,
    content_hashes,
    dedup_against_index,
    extend_signature_index_delta_cp,
    fresh_only,
    minhash_signature,
)
from oc_meta_spark.streaming.store import (
    commit_manifest,
    compact_tables,
    read_manifest,
    table_df,
)

# pinned store schemas: delta writes NORMALIZE to these and reads declare
# them explicitly, so parquet's vectorized reader never faces a silent
# int32/int64 drift between a batch-built delta and a compacted snapshot.
# The verdict log carries each doc's content hash ``h`` — the processed
# SET for the replay guard AND the reference the revision guard compares
# a reused doc_id's text against (classified-away docs are not in the
# corpus table, so the log is the only place their content is witnessed).
STORE_SCHEMAS = {
    "hashes": "h string, idx_id bigint, hp string",
    "signatures": "doc_id bigint, k int, h string",
    "bands": "doc_id bigint, band bigint, bucket string",
    "corpus": "doc_id bigint, text string",
    "verdicts": "doc_id bigint, verdict string, matched_existing bigint, batch bigint, h string",
    # the nightly=True composition's extra tables (absent from a plain
    # ingest store — table_df returns empty frames and compaction skips
    # them).  postings rows are per-doc disjoint (plain union on read);
    # the LM/domain tables are ADDITIVE delta rows — each batch appends
    # its survivors' counts and the read AGGREGATES per key (the KMV
    # mergeable-state discipline: additive deltas union losslessly), so a
    # batch never rewrites vocabulary-sized tables in place.
    "postings": "term string, doc_id bigint, tf bigint, tp string",
    "lm_heads": "w1 string, c1 bigint, gp string",
    "lm_bigrams": "w1 string, w2 string, c12 bigint, gp string",
    "domain_stats": "domain string, n_docs bigint, sum_uniq bigint, sum_words bigint",
    "prefix_domain": "prefix5 string, domain string, n_docs bigint, pp string",
    # the decontamination composition (nightly mode): the benchmark gram
    # index (extended by ingest_benchmarks at eval-release cadence, read
    # by every batch's survivor probe) and the contamination verdict log
    # — batch >= 0 rows from survivor probes, batch = -2 rows from the
    # retroactive probe a benchmark release runs over the existing corpus
    # (together: every (corpus doc, benchmark) gram collision exactly
    # once, however their arrivals interleave)
    "bench_grams": "bench_id bigint, g string, gp string",
    "bench_docs": "bench_id bigint, h string",
    "contam": "doc_id bigint, bench_id bigint, n_shared_grams bigint, batch bigint",
}

# contamination rows recorded by a benchmark release's retroactive probe
# of the already-ingested corpus (vs batch >= 0 for survivor probes and
# -1 for bootstrap rows in the verdict log)
BENCH_RELEASE_BATCH = -2

# leading sort key per table: delta files and compacted snapshots are
# laid out so row-group min/max stats prune the probe joins
_STORE_SORT = {
    "hashes": ["hp", "h"],
    "signatures": ["doc_id", "k"],
    "bands": ["band", "bucket"],
    "corpus": ["doc_id"],
    "verdicts": ["doc_id"],
    "postings": ["tp", "term"],
    "lm_heads": ["gp", "w1"],
    "lm_bigrams": ["gp", "w1", "w2"],
    "domain_stats": ["domain"],
    "prefix_domain": ["pp", "prefix5"],
    "bench_grams": ["gp", "g"],
    "bench_docs": ["bench_id"],
    "contam": ["doc_id"],
}


def check_store_mode(manifest: dict, nightly: bool, store_dir: str) -> str:
    """The manifest records the store's MODE (``plain`` | ``nightly``) at
    its first commit; every later call must match — mixing modes on one
    store would extend the derived tables for only some commits, leaving
    postings/LM/domain views whose docs witness is the full corpus but
    whose counts silently miss the other mode's documents (the
    check-meta-or-refuse discipline of plans/store_contract.py, applied
    to the manifest).  Returns the mode string for the caller's commit.
    A versioned store with NO recorded mode predates the marker and must
    be rebuilt, not guessed at."""
    mode = "nightly" if nightly else "plain"
    if manifest["version"] == 0:
        return mode
    stored = manifest.get("mode")
    if stored is None:
        raise ValueError(
            f"ingest store at {store_dir} predates mode recording (no 'mode' "
            "in its manifest) — rebuild it; guessing would risk derived "
            "tables that cover only part of the corpus"
        )
    if stored != mode:
        raise ValueError(
            f"ingest store at {store_dir} was committed with mode={stored}; "
            f"this call requests mode={mode} — mixing modes would leave the "
            "derived stores covering only part of the corpus; use one mode "
            "per store (rebuild to switch)"
        )
    return mode


def ingest_step(batch: DataFrame, index: SignatureIndex) -> tuple[DataFrame, DataFrame]:
    """Pure classification kernel for ONE micro-batch (no IO): returns
    ``(verdicts, survivors)`` where verdicts is (doc_id, verdict,
    matched_existing) for EVERY batch doc and survivors is the
    (doc_id, text) subset that should enter the corpus.

    In-batch exact duplicates collapse to the min-doc_id holder per
    content hash; only holders are probed against the index (the batch's
    distinct-content set — the probe stays delta-proportional even for a
    feed full of repeats)."""
    hashed = batch.select("doc_id", "text", F.md5("text").alias("h"))
    holder = hashed.groupBy("h").agg(F.min("doc_id").alias("holder_id"))
    with_holder = hashed.join(holder, "h")
    holders = with_holder.filter(F.col("doc_id") == F.col("holder_id")).select(
        "doc_id", "text"
    )
    cross = dedup_against_index(holders, index)
    holder_res = cross.select(
        F.col("doc_id").alias("holder_id"),
        F.col("matched_existing").alias("holder_match"),
    )
    dups = (
        with_holder.filter(F.col("doc_id") != F.col("holder_id"))
        .join(holder_res, "holder_id")
        .select(
            "doc_id",
            F.lit("exact_dup").alias("verdict"),
            F.coalesce("holder_match", "holder_id").cast("long").alias("matched_existing"),
        )
    )
    verdicts = cross.unionByName(dups)
    survivors = holders.join(
        cross.filter(F.col("verdict") == "unique").select("doc_id"), "doc_id", "left_semi"
    )
    return verdicts, survivors


def ingest_fold(
    batches: list[DataFrame], index: SignatureIndex
) -> DataFrame:
    """Bounded path (the IN1 gate and the foreachBatch body share
    ``ingest_step``): fold the micro-batches through classify → extend in
    order, returning every batch's verdicts tagged with its position —
    (doc_id, verdict, matched_existing, batch).

    Each step's index and verdicts are ``localCheckpoint``-ed: a lazy
    fold would embed batch N−1's ENTIRE classification plan into every
    one of batch N's index probes — the plan tree grows combinatorially
    with batch count (measured ~5× slower at just two gate-sized
    batches; deeper folds diverge).  The checkpoint is the in-memory
    analog of what the persisted path does structurally: ``ingest_batch``
    re-reads the index from parquet each batch, so its plans are born
    shallow."""
    if not batches:
        raise ValueError("ingest_fold needs at least one micro-batch")
    index = SignatureIndex(
        hashes=index.hashes.localCheckpoint(),
        signatures=index.signatures.localCheckpoint(),
        bands=index.bands.localCheckpoint(),
    )
    outs = []
    for pos, batch in enumerate(batches):
        # one classification evaluation per batch (r12): survivors are
        # recovered from the CHECKPOINTED verdicts (survivor set ≡ the
        # 'unique' verdicts by construction), and the extend materializes
        # its delta only — the corpus-sized index union stays lazy over
        # checkpointed pieces, mirroring the persisted path's append-only
        # delta files (see extend_signature_index_delta_cp)
        verdicts, _ = ingest_step(batch, index)
        v = verdicts.withColumn("batch", F.lit(pos).cast("long")).localCheckpoint()
        outs.append(v)
        if pos + 1 < len(batches):
            survivors = batch.join(
                v.filter(F.col("verdict") == "unique").select("doc_id"),
                "doc_id",
                "left_semi",
            )
            index = extend_signature_index_delta_cp(index, survivors)
    return reduce(lambda a, b: a.unionByName(b), outs)


def _store_df(spark: SparkSession, store_dir: str, manifest: dict, kind: str) -> DataFrame:
    return table_df(
        spark, store_dir, manifest, kind, STORE_SCHEMAS[kind], explicit_schema=True
    )


def load_ingest_store(
    spark: SparkSession, store_dir: str
) -> tuple[SignatureIndex, DataFrame, DataFrame]:
    """(index, corpus, verdict log) as of the last committed manifest.

    Hash uniqueness across delta directories is an invariant, not a read-
    time fix-up: a batch only appends hashes its survivors introduced,
    and a doc whose hash the index already held was classified exact_dup
    and never survived — so the union of delta dirs IS the index."""
    manifest = read_manifest(store_dir)
    index = SignatureIndex(
        hashes=_store_df(spark, store_dir, manifest, "hashes"),
        signatures=_store_df(spark, store_dir, manifest, "signatures"),
        bands=_store_df(spark, store_dir, manifest, "bands"),
    )
    corpus = _store_df(spark, store_dir, manifest, "corpus")
    verdicts = _store_df(spark, store_dir, manifest, "verdicts")
    return index, corpus, verdicts


def _normalize(df: DataFrame, kind: str) -> DataFrame:
    cols = [
        F.col(name).cast(dtype).alias(name)
        for name, dtype in (
            part.strip().rsplit(" ", 1) for part in STORE_SCHEMAS[kind].split(",")
        )
    ]
    out = df.select(*cols)
    keys = _STORE_SORT.get(kind)
    return out.sortWithinPartitions(*keys) if keys else out


def _nightly_deltas(survivors: DataFrame, batch_df: DataFrame) -> dict[str, DataFrame]:
    """The nightly=True composition's extra delta tables, all derived
    from ONE batch's survivors: postings rows (per-doc disjoint), LM
    head/bigram counts and domain accumulators (ADDITIVE rows — the read
    aggregates per key).  The survivor set is the replay guard for every
    one of them: a replayed batch has no survivors, so the additive
    tables cannot double — the single-guard property the composition
    exists to provide (each store's standalone ``docs`` witness becomes
    redundant here, not load-bearing)."""
    from oc_meta_spark.plans.domain_stats import build_domain_stats
    from oc_meta_spark.plans.lm_counts import build_lm_counts
    from oc_meta_spark.plans.postings_index import build_postings_index

    if "domain" not in batch_df.columns:
        raise ValueError(
            "nightly ingest needs a domain column on the feed (the "
            "domain-stats tables are keyed on it)"
        )
    surv_dom = survivors.join(batch_df.select("doc_id", "domain"), "doc_id").select(
        "doc_id", "domain", "text"
    )
    lm = build_lm_counts(survivors)
    dom = build_domain_stats(surv_dom)
    return {
        "postings": build_postings_index(survivors).postings,
        "lm_heads": lm.heads,
        "lm_bigrams": lm.bigrams,
        "domain_stats": dom.domain_stats,
        "prefix_domain": dom.prefix_domain,
    }


def load_nightly_stores(spark: SparkSession, store_dir: str):
    """(PostingsIndex, LmCounts, DomainStats) views over a nightly store's
    committed manifest.  Postings union directly (per-doc disjoint); the
    additive tables aggregate per key on read — delta-count-bounded until
    ``compact_ingest_store`` rolls them into one pre-aggregated snapshot,
    after which the read-side agg is a near-no-op re-pass over already-
    unique keys.  Every store's ``docs`` witness is the corpus membership
    itself: a doc is in a store iff it survived into the corpus — the
    cross-store consistency invariant the composition pins."""
    from oc_meta_spark.plans.domain_stats import DomainStats
    from oc_meta_spark.plans.lm_counts import LmCounts
    from oc_meta_spark.plans.postings_index import PostingsIndex

    manifest = read_manifest(store_dir)
    _require_nightly(manifest, store_dir, "load_nightly_stores")
    corpus_ids = _store_df(spark, store_dir, manifest, "corpus").select("doc_id")
    heads = (
        _store_df(spark, store_dir, manifest, "lm_heads")
        .groupBy("w1")
        .agg(F.sum("c1").alias("c1"))
        .withColumn("gp", F.substring(F.md5("w1"), 1, 2))
    )
    bigrams = (
        _store_df(spark, store_dir, manifest, "lm_bigrams")
        .groupBy("w1", "w2")
        .agg(F.sum("c12").alias("c12"))
        .withColumn("gp", F.substring(F.md5("w1"), 1, 2))
    )
    dstats = (
        _store_df(spark, store_dir, manifest, "domain_stats")
        .groupBy("domain")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_uniq").alias("sum_uniq"),
            F.sum("sum_words").alias("sum_words"),
        )
    )
    pdom = (
        _store_df(spark, store_dir, manifest, "prefix_domain")
        .groupBy("prefix5", "domain")
        .agg(F.sum("n_docs").alias("n_docs"))
        .withColumn("pp", F.substring(F.md5("prefix5"), 1, 2))
    )
    return (
        PostingsIndex(
            postings=_store_df(spark, store_dir, manifest, "postings"),
            docs=corpus_ids,
        ),
        LmCounts(heads=heads, bigrams=bigrams, docs=corpus_ids),
        DomainStats(domain_stats=dstats, prefix_domain=pdom, docs=corpus_ids),
    )


def _require_nightly(manifest: dict, store_dir: str, caller: str) -> None:
    """Refuse a non-nightly (or empty/pre-mode) store: its manifest has
    never committed the derived tables this caller is about to read —
    returning empty postings/LM/domain/benchmark views over a full docs
    witness would be silently wrong, not merely incomplete."""
    mode = manifest.get("mode")
    if mode != "nightly":
        raise ValueError(
            f"{caller} needs a nightly-mode ingest store; {store_dir} has "
            f"mode={mode!r} (version {manifest['version']}) — its derived "
            "tables were never maintained, so the views would be silently "
            "empty for a fully-populated corpus"
        )


def _load_bench_index(spark: SparkSession, store_dir: str, manifest: dict):
    """The persisted benchmark gram index as a DecontamIndex view (empty
    frames before the first ingest_benchmarks call)."""
    from oc_meta_spark.plans.decontam_index import DecontamIndex

    return DecontamIndex(
        grams=_store_df(spark, store_dir, manifest, "bench_grams"),
        benchmarks=_store_df(spark, store_dir, manifest, "bench_docs"),
    )


def load_decontam_view(spark: SparkSession, store_dir: str):
    """(DecontamIndex, contamination log) as of the last committed
    manifest — the benchmark index plus every recorded (doc_id, bench_id,
    n_shared_grams, batch) collision; batch >= 0 rows came from survivor
    probes, BENCH_RELEASE_BATCH rows from retroactive release probes."""
    manifest = read_manifest(store_dir)
    _require_nightly(manifest, store_dir, "load_decontam_view")
    return (
        _load_bench_index(spark, store_dir, manifest),
        _store_df(spark, store_dir, manifest, "contam"),
    )


def ingest_benchmarks(
    spark: SparkSession, bench_df: DataFrame, store_dir: str
) -> None:
    """Extend the store's benchmark gram index with a newly-released eval
    set — the OTHER cadence of the decontamination composition: corpus
    batches probe survivors against the index as it stands; this call
    indexes the new benchmarks AND retroactively probes the existing
    corpus against exactly the NEW grams, so every (corpus doc,
    benchmark) collision is recorded exactly once no matter how corpus
    batches and benchmark releases interleave.

    Same commit discipline as ingest_batch: gram rows, benchmark
    witnesses and retroactive contamination rows land under ONE manifest
    swap.  Replay-idempotent via the benchmark witness (``decontam_delta``
    drops known bench_ids, so a retried release indexes nothing and
    probes nothing); a known bench_id with REVISED text is refused loudly
    (decontam_delta's guard — the one store where a silent miss is most
    costly).  Nightly-mode stores only.

    Scale shape: the delta index is release-sized and BROADCASTS into the
    corpus probe (DC1's documented shape); the corpus is scanned once per
    release, never shuffled."""
    os.makedirs(store_dir, exist_ok=True)
    manifest = read_manifest(store_dir)
    _require_nightly(manifest, store_dir, "ingest_benchmarks")
    from oc_meta_spark.plans.decontam_index import (
        DecontamIndex,
        decontam_delta,
        decontaminate,
    )

    index = _load_bench_index(spark, store_dir, manifest)
    delta = decontam_delta(index, bench_df.select("bench_id", "text"))
    # materialized ONCE: the gram delta feeds its own write AND the
    # retroactive probe (lazily each would re-run the delta derivation)
    grams = delta.grams.localCheckpoint()
    bdocs = delta.benchmarks.localCheckpoint()
    if not bdocs.take(1):
        return  # fully-replayed release: nothing new, store untouched
    corpus = _store_df(spark, store_dir, manifest, "corpus")
    retro = decontaminate(
        corpus, DecontamIndex(grams=grams, benchmarks=bdocs)
    ).withColumn("batch", F.lit(BENCH_RELEASE_BATCH).cast("long"))
    version = manifest["version"] + 1
    tables = {k: list(v) for k, v in manifest["tables"].items()}
    for kind, df in (("bench_grams", grams), ("bench_docs", bdocs), ("contam", retro)):
        rel = os.path.join(kind, f"d{version:06d}")
        _normalize(df, kind).write.mode("overwrite").parquet(
            os.path.join(store_dir, rel)
        )
        tables.setdefault(kind, []).append(rel)
    commit_manifest(store_dir, {"version": version, "tables": tables, "mode": "nightly"})


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    batch_id: int,
    nightly: bool = False,
) -> None:
    """The foreachBatch body: classify one micro-batch against the store,
    append survivor + verdict deltas, swap the manifest.

    Identity guards (doc_id is the store's identity key):

    - a micro-batch carrying the SAME doc_id twice is refused — two rows
      claiming one identity in one commit is a broken feed, and the
      holder collapse would log both;
    - a doc_id already in the verdict log arriving with IDENTICAL text is
      a checkpoint replay — dropped silently, the store is untouched;
    - a seen doc_id arriving with DIFFERENT text is a REVISION — refused
      loudly (``extend_signature_index``'s contract: a revision needs a
      store rebuild, not an append), never silently discarded.

    Replay-idempotent: a batch whose previous attempt committed becomes
    empty after the guard and commits nothing; nothing the current
    manifest references is ever rewritten, so a crash before the final
    swap leaves the previous commit fully intact.

    The classification is materialized ONCE (``localCheckpoint``) before
    the guard and the delta writes — lazily, each write would re-run
    the whole ingest_step plan (~6× the intended per-batch cost)."""
    os.makedirs(store_dir, exist_ok=True)
    # mode guard FIRST (check_store_mode): a plain call on a nightly
    # store (or vice versa) must refuse before anything is spent
    mode = check_store_mode(read_manifest(store_dir), nightly, store_dir)
    if nightly and "domain" not in batch_df.columns:
        # fail before the classification spends anything (_nightly_deltas
        # re-checks as a backstop for direct callers)
        raise ValueError(
            "nightly ingest needs a domain column on the feed (the "
            "domain-stats tables are keyed on it)"
        )
    index, _corpus, seen = load_ingest_store(spark, store_dir)
    hashed = batch_df.select("doc_id", "text", F.md5("text").alias("bh"))

    dup_ids = hashed.groupBy("doc_id").count().filter(F.col("count") > 1)
    first_dup = dup_ids.take(1)
    if first_dup:
        raise ValueError(
            f"micro-batch {batch_id} carries doc_id {first_dup[0]['doc_id']} "
            "more than once — doc_id is the store's identity key; fix the feed"
        )
    # delta-keyed probe of the corpus-sized log: scan, not shuffle
    seen_hits = seen.join(
        F.broadcast(hashed.select("doc_id")), "doc_id", "left_semi"
    ).select("doc_id", "h")
    conflict = hashed.join(seen_hits, "doc_id").filter(F.col("bh") != F.col("h"))
    first_conflict = conflict.take(1)
    if first_conflict:
        raise ValueError(
            f"doc_id {first_conflict[0]['doc_id']} was already ingested with "
            "different text — a revision needs a store rebuild, not an append "
            "(see extend_signature_index); refusing the batch"
        )

    batch = fresh_only(hashed.select("doc_id", "text", "bh"), seen, "doc_id")
    verdicts, _survivors = ingest_step(batch.select("doc_id", "text"), index)
    log = (
        verdicts.withColumn("batch", F.lit(batch_id).cast("long"))
        .join(batch.select("doc_id", F.col("bh").alias("h")), "doc_id")
        .localCheckpoint()
    )
    if not log.take(1):
        return
    # survivors re-derived from the MATERIALIZED verdicts (unique verdicts
    # only ever name holders), so no write re-runs the classification
    survivors = batch.select("doc_id", "text").join(
        log.filter(F.col("verdict") == "unique").select("doc_id"),
        "doc_id",
        "left_semi",
    ).localCheckpoint()
    sigs = minhash_signature(survivors).localCheckpoint()
    manifest = read_manifest(store_dir)
    version = manifest["version"] + 1
    tables = {k: list(v) for k, v in manifest["tables"].items()}
    deltas = {
        "hashes": content_hashes(survivors),
        "signatures": sigs,
        "bands": band_buckets(sigs),
        "corpus": survivors,
        "verdicts": log,
    }
    if nightly:
        # the composed tables ride the SAME manifest swap: one atomic
        # commit updates corpus + index + postings + LM counts + domain
        # stats + contamination verdicts together or not at all (the
        # reference's meta_process discipline: data, provenance and
        # counters land as one unit)
        deltas.update(_nightly_deltas(survivors, batch_df))
        # probe the batch's survivors against the CURRENT benchmark gram
        # index (extended by ingest_benchmarks at its own cadence);
        # pairs whose benchmark arrives later are caught by that
        # release's retroactive probe — together, exactly once each
        from oc_meta_spark.plans.decontam_index import decontaminate

        deltas["contam"] = decontaminate(
            survivors, _load_bench_index(spark, store_dir, manifest)
        ).withColumn("batch", F.lit(batch_id).cast("long"))
    for kind, df in deltas.items():
        rel = os.path.join(kind, f"d{version:06d}")
        _normalize(df, kind).write.mode("overwrite").parquet(
            os.path.join(store_dir, rel)
        )
        tables.setdefault(kind, []).append(rel)
    commit_manifest(store_dir, {"version": version, "tables": tables, "mode": mode})


def bootstrap_store(
    spark: SparkSession,
    corpus_df: DataFrame,
    store_dir: str,
    nightly: bool = False,
) -> None:
    """Initialize a store from an EXISTING corpus WITHOUT classification —
    the migration path (the corpus predates the stream; its members are
    axiomatically in, including any internal near-duplicates, exactly as
    ``build_signature_index`` indexes them for the nightly ID1 path).
    Every doc is logged with verdict ``bootstrap`` at batch −1, so the
    replay and revision guards treat it as processed.  Refuses a
    non-empty store: a bootstrap over live state would fork the corpus's
    identity."""
    manifest = read_manifest(store_dir)
    if manifest["version"] != 0:
        raise ValueError(
            f"store at {store_dir} already has committed state (version "
            f"{manifest['version']}); bootstrap only initializes empty stores"
        )
    os.makedirs(store_dir, exist_ok=True)
    corpus = corpus_df.select("doc_id", "text")
    delta = build_signature_index(corpus)
    verdicts = corpus.select(
        "doc_id",
        F.lit("bootstrap").alias("verdict"),
        F.lit(None).cast("long").alias("matched_existing"),
        F.lit(-1).cast("long").alias("batch"),
        F.md5("text").alias("h"),
    )
    tables: dict[str, list[str]] = {}
    deltas = {
        "hashes": delta.hashes,
        "signatures": delta.signatures,
        "bands": delta.bands,
        "corpus": corpus,
        "verdicts": verdicts,
    }
    if nightly:
        deltas.update(_nightly_deltas(corpus, corpus_df))
    for kind, df in deltas.items():
        rel = os.path.join(kind, "d000001")
        _normalize(df, kind).write.mode("overwrite").parquet(
            os.path.join(store_dir, rel)
        )
        tables[kind] = [rel]
    # the mode marker is born with the store: every later ingest_batch /
    # ingest_benchmarks / load_nightly_stores call checks it
    commit_manifest(
        store_dir,
        {"version": 1, "tables": tables, "mode": "nightly" if nightly else "plain"},
    )


def compact_ingest_store(spark: SparkSession, store_dir: str) -> int:
    """Merge each table's accumulated delta directories into ONE snapshot
    laid out on its probe key (hashes by hash prefix, bands by
    (band, bucket), signatures/corpus/verdicts by doc_id) — the shared
    ``compact_tables`` discipline (streaming/store.py).  Set-semantics
    tables keep their rows unchanged, only re-laid-out (pinned by
    tests); the nightly composition's ADDITIVE tables roll up per key —
    lossless under their aggregate-on-read contract, and the true
    OPTIMIZE analog: after compaction the read-side agg re-passes
    already-unique keys.  Returns the number of tables rewritten."""
    # per-key rollups for the additive nightly tables; every other kind
    # loads verbatim
    _additive = {
        "lm_heads": (["w1"], {"c1": F.sum}, ("gp", "w1")),
        "lm_bigrams": (["w1", "w2"], {"c12": F.sum}, ("gp", "w1")),
        "domain_stats": (
            ["domain"],
            {"n_docs": F.sum, "sum_uniq": F.sum, "sum_words": F.sum},
            None,
        ),
        "prefix_domain": (["prefix5", "domain"], {"n_docs": F.sum}, ("pp", "prefix5")),
    }

    def load(manifest: dict, kind: str) -> DataFrame:
        df = _store_df(spark, store_dir, manifest, kind)
        if kind not in _additive:
            return df
        keys, aggs, prefix = _additive[kind]
        out = df.groupBy(*keys).agg(
            *[fn(c).alias(c) for c, fn in aggs.items()]
        )
        if prefix is not None:
            out = out.withColumn(prefix[0], F.substring(F.md5(prefix[1]), 1, 2))
        return out

    def layout(df: DataFrame, kind: str) -> DataFrame:
        return _normalize(df.repartitionByRange(_STORE_SORT[kind][0]), kind)

    return compact_tables(store_dir, STORE_SCHEMAS, load, layout)


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    nightly: bool = False,
):
    """Start the streaming ingestion job: a checkpointed parquet file
    source (each input file discovered exactly once — the reference's
    cache.txt, subsumed by the checkpoint) feeding ``ingest_batch``.
    ``available_now`` drains the current backlog then stops (the
    batch-resume mode); False keeps it running continuously.
    ``nightly`` composes every persisted corpus store into the same
    foreachBatch commit (the feed must carry a domain column)."""
    schema = "doc_id bigint, text string" + (", domain string" if nightly else "")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, store_dir, batch_id, nightly=nightly)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
