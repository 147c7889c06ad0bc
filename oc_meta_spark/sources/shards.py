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

    Scale shape: one shuffle on shard; per-shard sorts are local.  At
    100 TB pick n_shards ≈ corpus_bytes / target_shard_bytes — the 48-bit
    hash split is uniform so no shard hot-spots."""
    from oc_meta_spark.plans.incremental import seeded_shuffle

    out = seeded_shuffle(df, seed, n_shards, id_col=id_col, with_pos=False)
    # shard leads the local sort: FileFormatWriter requires its input
    # ordered by the partition columns, so sorting (shard, key) satisfies
    # it in ONE sort — sorting (key) alone would make the writer insert
    # its own sort on shard and leave in-file key order to unspecified
    # sort stability
    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "sort_key", id_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .partitionBy("shard")
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
