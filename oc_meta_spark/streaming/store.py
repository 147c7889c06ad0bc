"""Manifest-committed parquet store: the shared machinery under BOTH
streaming stores (micro_batch's curation catalog and ingest's corpus +
signature index).

Design (SURVEY's write-new + atomic-swap where Delta's MERGE INTO is
unavailable): every commit writes NEW parquet directories only and then
swaps ONE manifest file into place with an atomic ``os.replace``.  A
crash mid-commit leaves the previous manifest — and therefore a fully
consistent store — in effect; readers resolve tables through the last
committed manifest, so they never see a half-written batch.  Single
writer per store (minting/append order stays serialized); directories no
longer referenced are left for external garbage collection so a reader
holding the previous manifest stays consistent.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST.json"


def read_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, MANIFEST)
    if not os.path.exists(path):
        return {"version": 0, "tables": {}}
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def commit_manifest(store_dir: str, manifest: dict) -> None:
    """Atomic swap: the manifest becomes visible all-or-nothing."""
    tmp = os.path.join(store_dir, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(store_dir, MANIFEST))


def table_df(
    spark: SparkSession,
    store_dir: str,
    manifest: dict,
    kind: str,
    schema,
    explicit_schema: bool = False,
):
    """The union of a table's manifest-listed directories (empty frame of
    ``schema`` when none exist).  ``explicit_schema=True`` declares the
    schema on the scan too — for stores whose delta writes NORMALIZE to a
    pinned schema (ingest), so the vectorized reader never faces an
    int32/int64 drift between deltas and compacted snapshots."""
    dirs = manifest["tables"].get(kind, [])
    paths = [os.path.join(store_dir, d) for d in dirs]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema) if explicit_schema else spark.read
    return reader.parquet(*paths)


def compact_tables(
    store_dir: str,
    kinds: Iterable[str],
    load: Callable[[dict, str], DataFrame],
    layout: Callable[[DataFrame, str], DataFrame],
) -> int:
    """Merge each multi-directory table into ONE ``c{version}`` snapshot
    directory and swap the manifest (same all-or-nothing commit as a
    batch) — the Delta OPTIMIZE analog; bounds per-read file counts as
    delta commits accumulate.  ``load`` resolves (manifest, kind) → the
    table's current rows; ``layout`` applies the store's physical layout
    (range partitioning + in-file sort) before the write.  Returns the
    number of tables rewritten."""
    manifest = read_manifest(store_dir)
    version = manifest["version"] + 1
    tables = {k: list(v) for k, v in manifest["tables"].items()}
    rewritten = 0
    for kind in kinds:
        if len(tables.get(kind, [])) <= 1:
            continue
        df = load(manifest, kind)
        rel = os.path.join(kind, f"c{version:06d}")
        layout(df, kind).write.mode("overwrite").parquet(os.path.join(store_dir, rel))
        tables[kind] = [rel]
        rewritten += 1
    if rewritten:
        # spread the OLD manifest first: fields beyond version/tables
        # (e.g. the ingest store's mode marker) must survive compaction —
        # dropping them would strip the very guards they carry
        commit_manifest(store_dir, {**manifest, "version": version, "tables": tables})
    return rewritten
