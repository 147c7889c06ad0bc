"""Resumable micro-batch ingestion as Structured Streaming (SURVEY §2.9)
over a MANIFEST-committed parquet store (S7).

The reference is a resumable batch system: per-file sequential processing
with a completed-file cache (cache.txt, oc_meta/run/meta_process.py:181-193,
688-712), graceful stop files, and a transactional SPARQL endpoint for
updates.  The Spark-native equivalent:

- a Structured Streaming file source with a checkpoint — the checkpoint
  subsumes cache.txt (exactly-once per input file), and
  ``Trigger.AvailableNow`` gives "process everything currently there, then
  stop", which is precisely the reference's batch-resume semantics;
- a MERGE-shaped store commit: every batch writes NEW parquet directories
  only (append deltas for the append-only tables, a full rewritten
  snapshot for tables the batch mutates — RA given-name enrichment — and
  the counters snapshot), then swaps ONE manifest file into place with an
  atomic ``os.replace``.  A crash mid-batch leaves the previous manifest —
  and therefore a fully consistent store — in effect; the streaming
  checkpoint replays the batch on restart and the re-written directories
  are simply re-committed (orphan directories from the failed attempt are
  never referenced).  This is the write-new + atomic-swap design the
  SURVEY calls for where Delta's MERGE INTO is unavailable.

Each micro-batch runs the full curation pipeline against the current
catalog — the foreachBatch body is the same ``curate()`` plan as the batch
path, so batch and streaming share one implementation (no semantic drift).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.schemas import COUNTER_SCHEMA, ENTITY_TABLES, META_INPUT_SCHEMA
from oc_meta_spark.streaming.store import (
    MANIFEST,  # noqa: F401  (re-export: tests and callers name the file through here)
    commit_manifest as _commit_manifest,
    compact_tables,
    read_manifest as _read_manifest,
    table_df as _table_df,
)

# append-only entity tables (deltas accumulate); 'ra' and 'counters' are
# snapshot tables (rewritten per batch when touched)
APPEND_KINDS = ("br", "id", "entity_id", "ar", "re", "prov")
ENTITY_KINDS = ("br", "ra", "id", "entity_id", "ar", "re", "prov")


def load_catalog(spark: SparkSession, store_dir: str) -> EntityCatalog:
    """Catalog as of the last committed manifest (empty where missing)."""
    manifest = _read_manifest(store_dir)
    kwargs = {
        kind: _table_df(spark, store_dir, manifest, kind, ENTITY_TABLES[kind])
        for kind in ENTITY_KINDS
    }
    kwargs["counters"] = _table_df(spark, store_dir, manifest, "counters", COUNTER_SCHEMA)
    return EntityCatalog(**kwargs)


# Physical sort key per table (SURVEY O3: the reference's PO→S reverse
# index becomes a storage-layout decision).  Single source of truth for
# both the per-delta file sort and compaction's range partitioning (which
# uses the leading key only).
_SORT_KEYS = {
    "id": ["schema", "value"],
    "entity_id": ["entity_omid"],
    "ar": ["br_omid", "role", "pos"],
    "br": ["omid"],
    "re": ["omid"],
    "prov": ["entity_omid", "snapshot"],
}


def _layout(df: DataFrame, kind: str) -> DataFrame:
    """Sort each written file by its resolution key so parquet min/max
    row-group stats prune the hot joins: ``id`` probes on (schema, value),
    ``entity_id``/``ar`` fan out from an entity omid."""
    keys = _SORT_KEYS.get(kind)
    return df.sortWithinPartitions(*keys) if keys else df


def compact_store(spark: SparkSession, store_dir: str) -> int:
    """Merge each append-only table's accumulated delta directories into
    ONE key-sorted snapshot and swap the manifest (the shared
    ``compact_tables`` discipline — see streaming/store.py).  Returns the
    number of tables rewritten."""

    def load(manifest: dict, kind: str) -> DataFrame:
        return _table_df(spark, store_dir, manifest, kind, ENTITY_TABLES[kind])

    def layout(df: DataFrame, kind: str) -> DataFrame:
        keys = _SORT_KEYS.get(kind)
        return _layout(df.repartitionByRange(keys[0]) if keys else df, kind)

    return compact_tables(store_dir, APPEND_KINDS, load, layout)


def append_result(result, store_dir: str) -> None:
    """Commit one batch's deltas: write new directories, swap the manifest.

    Nothing referenced by the CURRENT manifest is touched — a failure at
    any point before the final ``os.replace`` leaves the store exactly as
    it was (kill-mid-write safe), and a replayed batch converges because
    the commit is a pure function of (previous manifest, batch result).
    """
    os.makedirs(store_dir, exist_ok=True)
    manifest = _read_manifest(store_dir)
    version = manifest["version"] + 1
    tables = {k: list(v) for k, v in manifest["tables"].items()}
    spark = result.br_new.sparkSession

    deltas = {
        "br": result.br_new,
        "id": result.id_new,
        "entity_id": result.entity_id_new,
        "ar": result.ar_new,
        "re": result.re_new,
        "prov": result.prov_new,
    }
    for kind, df in deltas.items():
        rel = os.path.join(kind, f"d{version:06d}")
        _layout(df, kind).write.mode("overwrite").parquet(os.path.join(store_dir, rel))
        tables.setdefault(kind, []).append(rel)

    # RA: snapshot = previous snapshot + given-name enrichment + new rows
    # (written to a NEW directory — the old snapshot stays readable until
    # the manifest swap).
    prev_ra = _table_df(spark, store_dir, manifest, "ra", ENTITY_TABLES["ra"])
    upd = result.ra_updates.withColumnRenamed("omid", "u_omid").withColumnRenamed("given", "u_given")
    ra_next = (
        prev_ra.join(upd, prev_ra.omid == upd.u_omid, "left")
        .withColumn("given", F.coalesce(F.nullif("given", F.lit("")), "u_given"))
        .drop("u_omid", "u_given")
        .unionByName(result.ra_new)
    )
    ra_rel = os.path.join("ra", f"v{version:06d}")
    ra_next.write.mode("overwrite").parquet(os.path.join(store_dir, ra_rel))
    tables["ra"] = [ra_rel]

    counters_rel = os.path.join("counters", f"v{version:06d}")
    result.counters_new.write.mode("overwrite").parquet(os.path.join(store_dir, counters_rel))
    tables["counters"] = [counters_rel]

    _commit_manifest(store_dir, {"version": version, "tables": tables})


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
    - each micro-batch curates against the catalog as of the last
      committed manifest and commits its deltas atomically (single-writer
      per store: minting stays serialized, SURVEY hard part §7.4.4);
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
