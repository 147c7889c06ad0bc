"""Training-shard sink: the last step of the corpus pipeline — write the
mixed/deduped/packed corpus as parquet shards a data loader streams.

Layout contract (the public convention used by large-corpus loaders à la
WebDataset / HuggingFace datasets sharding):

- one directory per source (``source=.../`` hive partitioning, so a loader
  or a downstream Spark job can partition-prune a single source),
- bounded shard size via ``maxRecordsPerFile`` (shards must fit a loader
  worker's memory and shuffle-buffer granularity),
- rows carry their MX2 packing bin so a loader can reassemble fixed
  token-budget blocks without re-scanning text,
- deterministic order WITHIN a shard (sorted by ``doc_id`` inside each
  partition) — reproducible iteration without a global sort.

Scale shape: ``partitionBy`` shuffles once on the partition column;
``sortWithinPartitions`` is a local sort (no range exchange).  At 100 TB
add a ``shard = doc_id % k`` split per source (same call, composite
partition column) so no single source serializes into one writer task —
mirrored from the MX2 giant-source note (SCALING.md).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_training_shards(
    df: DataFrame,
    path: str,
    records_per_shard: int = 100_000,
    source_col: str = "source",
    order_col: str = "doc_id",
    shards_per_source: int = 1,
) -> None:
    """Write a prepared corpus as partition-pruned parquet shards.

    ``shards_per_source > 1`` adds a hash sub-split so one giant source
    does not serialize into a single writer task — the partition column
    set becomes (source, shard).
    """
    out = df
    partition_cols = [source_col]
    if shards_per_source > 1:
        out = out.withColumn(
            "shard", (F.abs(F.xxhash64(order_col)) % shards_per_source).cast("int")
        )
        partition_cols.append("shard")
    (
        out.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    seed: str,
    n_shards: int = 16,
    records_per_shard: int = 100_000,
    id_col: str = "doc_id",
    epoch: int | None = None,
    overwrite: bool = False,
) -> None:
    """Write the corpus in a REPRODUCIBLE seeded training order: the
    deterministic global permutation of plans/incremental.py's
    seeded_shuffle (sort_key = md5(seed || ':' || id), shard = first
    48 bits (12 hex chars) of the key mod n_shards) partitioned by shard
    and sorted by
    the key within each shard.  Same seed → bitwise-identical layout on
    every run and cluster (a partitionBy shuffle plus local sorts — no
    repartitionByRange, whose sampled boundaries are nondeterministic);
    a new seed → a fresh permutation for the next epoch.

    ``epoch is not None`` selects the APPENDABLE layout —
    ``shard=K/epoch=E/`` sub-partitions plus a one-row ``_meta`` parquet
    recording (seed, n_shards): the store `append_shuffled_shards` grows
    nightly.  The underscore prefix keeps ``_meta`` INVISIBLE to parquet
    partition discovery (Spark's `_`-file convention), so the store stays
    one plain readable directory.  The default (None) keeps the original
    single-shot layout.

    This is a BUILD, not an append: the write is ``mode('overwrite')`` on
    the whole store path.  Re-running it against an EXISTING epoched
    store (a natural misuse given the epoch parameter — and just as
    destructive through the original epoch-less call shape) would
    silently delete every prior epoch and the ``_meta`` — so whenever the
    path already holds a ``_meta``, the write is REFUSED unless
    ``overwrite=True``: growth goes through ``append_shuffled_shards``; a
    deliberate rebuild says so explicitly.  Only a clean
    path-not-found/empty probe (AnalysisException) counts as "no store":
    any OTHER failure reading ``_meta`` propagates loudly rather than
    being read as permission to destroy whatever is there.

    Crash contract: the data overwrite lands before ``_meta`` is
    rewritten, so a store whose ``_meta`` is missing is an INTERRUPTED
    build — ``append_shuffled_shards`` refuses it loudly; rebuild with
    ``overwrite=True``.  (Writing ``_meta`` first would be worse: a crash
    after the old data is deleted would leave a meta that vouches for
    data that is not there.)

    Scale shape: one shuffle on shard; per-shard sorts are local.  At
    100 TB pick n_shards ≈ corpus_bytes / target_shard_bytes — the 48-bit
    hash split is uniform so no shard hot-spots."""
    from oc_meta_spark.plans.incremental import seeded_shuffle

    if not overwrite:
        from pyspark.errors import AnalysisException

        spark = df.sparkSession
        existing_meta = None
        try:  # any-FS-safe probe: the read itself, not a local os.path check
            existing_meta = spark.read.parquet(os.path.join(path, "_meta")).first()
        except AnalysisException:
            pass  # no _meta → fresh (or interrupted) path: the build may proceed
        if existing_meta is not None:
            raise ValueError(
                f"shard store at {path} already exists (seed="
                f"{existing_meta['seed']}, n_shards={existing_meta['n_shards']}); "
                "write_shuffled_shards would DELETE every stored epoch — grow "
                "the store with append_shuffled_shards, or pass overwrite=True "
                "for a deliberate rebuild"
            )

    out = seeded_shuffle(df, seed, n_shards, id_col=id_col, with_pos=False)
    partition_cols = ["shard"]
    if epoch is not None:
        out = out.withColumn("epoch", F.lit(epoch).cast("int"))
        partition_cols.append("epoch")
    # shard leads the local sort: FileFormatWriter requires its input
    # ordered by the partition columns, so sorting (shard, key) satisfies
    # it in ONE sort — sorting (key) alone would make the writer insert
    # its own sort on shard and leave in-file key order to unspecified
    # sort stability
    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions(*partition_cols, "sort_key", id_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    if epoch is not None:
        df.sparkSession.createDataFrame(
            [(seed, n_shards)], schema="seed string, n_shards int"
        ).write.mode("overwrite").parquet(os.path.join(path, "_meta"))


def append_shuffled_shards(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    seed: str,
    epoch: int,
    records_per_shard: int = 100_000,
    id_col: str = "doc_id",
) -> None:
    """The nightly append to an epoched shuffled-shard store: new
    documents land in the SAME shard a full rebuild would put them in
    (the shard is a pure hash of the id — membership append≡rebuild is
    EXACT), as new ``epoch=E`` files; existing files are never touched.

    Order contract: a loader streams each shard epoch-major — old epochs
    in their original seeded order, then the new epoch's docs in seeded
    order among themselves.  A full rebuild would instead interleave new
    docs into the global key order; the divergence is deliberate (the
    HS2 stability doctrine: what was already written never moves — a
    mid-training job can keep consuming yesterday's files).

    Guards (the signature-index contract, plans/incremental.py):
    - seed/n_shards are read from the store's ``_meta`` and must match —
      a mismatched seed would send a doc to a different shard than the
      one its rebuild belongs to, silently breaking append≡rebuild;
    - already-stored doc ids are dropped via a broadcast probe of the
      delta's ids (`fresh_only` — the store is scanned id-only and never
      shuffled), so a crashed-and-retried night appends nothing twice;
    - ``epoch`` must be >= every stored epoch: equal re-enters the SAME
      night (the crash-retry path — fresh_only writes only the missing
      docs), smaller is a mis-wired pipeline and is refused.  After a
      partial-crash repair an epoch holds two file groups, each sorted —
      a loader that wants the seeded order within a repaired epoch sorts
      (shard, epoch) groups by ``sort_key`` on read (one local sort;
      epochs written in one pass stream in file order as-is).
    """
    from pyspark.errors import AnalysisException

    from oc_meta_spark.plans.incremental import fresh_only, seeded_shuffle

    try:
        meta = spark.read.parquet(os.path.join(path, "_meta")).first()
    except AnalysisException as e:
        raise ValueError(
            f"shard store at {path} has no _meta — an interrupted build "
            "(write_shuffled_shards crashed between the data overwrite and "
            "the _meta write); rebuild it with "
            "write_shuffled_shards(..., overwrite=True) before appending"
        ) from e
    if meta["seed"] != seed:
        raise ValueError(
            f"shard store at {path} was written with seed={meta['seed']}; "
            f"append got seed={seed} — a mismatched seed scatters docs to "
            "the wrong shards (rebuild≠append)"
        )
    n_shards = meta["n_shards"]
    existing = spark.read.parquet(path)
    max_epoch = existing.agg(F.max("epoch")).first()[0]
    if max_epoch is not None and epoch < max_epoch:
        raise ValueError(
            f"shard store at {path} already holds epoch {max_epoch}; "
            f"append got epoch={epoch} — epochs must not decrease "
            "(a crash retry re-enters the SAME epoch; only new nights "
            "advance it)"
        )
    fresh = fresh_only(delta, existing.select(id_col), id_col)
    out = seeded_shuffle(fresh, seed, n_shards, id_col=id_col, with_pos=False)
    (
        out.withColumn("epoch", F.lit(epoch).cast("int"))
        .repartition(F.col("shard"))
        .sortWithinPartitions("shard", "epoch", "sort_key", id_col)
        .write.mode("append")
        .option("maxRecordsPerFile", records_per_shard)
        .partitionBy("shard", "epoch")
        .parquet(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, sources: list[str] | None = None
) -> DataFrame:
    """Read shards back; a ``sources`` filter partition-prunes the scan
    (the directory layout makes it free — no file of another source is
    even listed)."""
    df = spark.read.parquet(path)
    if sources is not None:
        df = df.filter(F.col("source").isin(sources))
    return df


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """One row per shard file: (source, file, n_docs, n_tokens) — the
    loader-facing index, computed from the files themselves (never a
    side-channel that can drift)."""
    df = spark.read.parquet(path).select(
        "source",
        F.input_file_name().alias("file"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    return (
        df.groupBy("source", "file")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("source", "file")
    )


def read_shuffled_shards(
    spark: SparkSession, path: str, restore_order: bool = False
) -> DataFrame:
    """Read an epoched shuffled-shard store.  ``restore_order=True``
    returns rows ordered by (shard, epoch, sort_key, doc_id) — the
    loader contract even for epochs repaired by a crash retry (whose two
    file groups are each sorted but interleave in file order); it costs
    one sort, so loaders streaming only cleanly-written epochs skip it
    and consume file order directly."""
    df = spark.read.parquet(path)
    if restore_order:
        df = df.orderBy("shard", "epoch", "sort_key", "doc_id")
    return df
