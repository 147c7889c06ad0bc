"""Resumable micro-batch ingestion as Structured Streaming (SURVEY §2.9).

The reference is a resumable batch system: per-file sequential processing
with a completed-file cache (cache.txt, oc_meta/run/meta_process.py:181-193,
688-712), graceful stop files, and Redis-cached uploads.  The Spark-native
equivalent is a Structured Streaming file source with a checkpoint — the
checkpoint subsumes cache.txt (exactly-once per input file), and
``Trigger.AvailableNow`` gives "process everything currently there, then
stop", which is precisely the reference's batch-resume semantics.

Each micro-batch runs the full curation pipeline against the current
catalog and appends the entity deltas to parquet tables — the foreachBatch
body is the same ``curate()`` plan as the batch path, so batch and
streaming share one implementation (no semantic drift).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.schemas import ENTITY_TABLES, META_INPUT_SCHEMA

ENTITY_KINDS = ("br", "ra", "id", "entity_id", "ar", "re", "prov")


def load_catalog(spark: SparkSession, store_dir: str) -> EntityCatalog:
    """Catalog from parquet tables under store_dir (empty where missing)."""
    kwargs = {}
    for kind in ENTITY_KINDS:
        p = os.path.join(store_dir, kind)
        if os.path.isdir(p):
            kwargs[kind] = spark.read.parquet(p)
        else:
            kwargs[kind] = spark.createDataFrame([], ENTITY_TABLES[kind])
    return EntityCatalog(**kwargs)


def append_result(result, store_dir: str) -> None:
    # Given-name enrichment mutates existing RA rows: read-modify-overwrite
    # (localCheckpoint first — we read and rewrite the same path).
    ra_path = os.path.join(store_dir, "ra")
    import pyspark.sql.functions as F

    if os.path.isdir(ra_path) and result.ra_updates.take(1):
        spark = result.ra_updates.sparkSession
        upd = result.ra_updates.withColumnRenamed("omid", "u_omid").withColumnRenamed("given", "u_given")
        merged = (
            spark.read.parquet(ra_path)
            .join(upd, F.col("omid") == F.col("u_omid"), "left")
            .withColumn("given", F.coalesce(F.nullif("given", F.lit("")), "u_given"))
            .drop("u_omid", "u_given")
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(ra_path)
    deltas = {
        "br": result.br_new,
        "ra": result.ra_new,
        "id": result.id_new,
        "entity_id": result.entity_id_new,
        "ar": result.ar_new,
        "re": result.re_new,
        "prov": result.prov_new,
    }
    for kind, df in deltas.items():
        df.write.mode("append").parquet(os.path.join(store_dir, kind))


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    prefix: str = "060",
    available_now: bool = True,
):
    """Start the streaming curation job.

    - file source discovers new CSVs exactly once (checkpointed — the
      reference's cache.txt);
    - each micro-batch curates against the catalog as of that batch and
      appends deltas (single-writer per store: minting stays serialized,
      SURVEY hard part §7.4.4);
    - ``available_now`` drains the backlog then stops (batch-resume mode);
      False keeps it running for continuous ingestion.
    """
    stream = (
        spark.readStream.schema(META_INPUT_SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", 8)
        .csv(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        catalog = load_catalog(spark, store_dir)
        result = curate(batch_df, catalog, prefix=prefix, batch_ts=f"batch-{batch_id}")
        append_result(result, store_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
