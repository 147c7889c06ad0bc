"""The ONE persisted-store contract shared by every nightly store —
signature index, IVF inverted lists, postings index, LM count tables,
domain-reputation stats, holdout history (plans/incremental.py,
ivf_index.py, postings_index.py, lm_counts.py, domain_stats.py).

Each store is a directory of plain parquet tables (some hive-partitioned
on their probe key) plus a one-row ``meta/`` table recording the
configuration the data was written under.  The round-10 verdict's
dedup prescription: five modules re-implemented the same
write-tables-then-meta / check-meta-or-refuse / explicit-read-schema
discipline, and a sixth store would drift.  The discipline itself
(unchanged, now in one place):

- **write**: every table written ``mode("overwrite")`` into its own
  subdirectory (the atomicity story is the caller's — nightly jobs
  overwrite-swap whole store directories, streaming stores append delta
  dirs under a manifest, sources/shards.py guards non-overwrite calls);
  ``meta/`` is written LAST, so a torn write leaves a store that the
  reader refuses rather than misreads.
- **check**: the reader compares the meta row's config fields against
  what this build expects and refuses a mismatch loudly — mixed
  configurations join silently and misclassify (a k=16 signature index
  probed with k=32 halves every agreement count).  The error text keeps
  the ``field=value`` form the store tests pin.
- **read**: EXPLICIT schemas, never directory-name inference — an
  all-numeric partition value like ``07`` would otherwise come back as
  INT with its leading zero dropped, and a recomputed projection of the
  partition column could not partition-prune the probe joins (the
  signature-index lesson, see read_signature_index).

The delta-idempotency half of the contract, ``fresh_only``, already has
one implementation (plans/incremental.py:128) — every extend imports it.

Reference analog: the resumable-cache discipline of
oc_meta/run/meta_process.py:183-190 — processed state is immutable
across runs and a run refuses state it cannot interpret.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, Row, SparkSession


def write_store(
    path: str,
    tables: Mapping[str, tuple[DataFrame, str | None]],
    meta_schema: str,
    meta_row: tuple,
) -> None:
    """Persist ``tables`` (name → (df, hive-partition column or None))
    under ``path``, then the one-row ``meta/`` config table — meta last,
    so a torn write is refused by :func:`check_meta`, never misread."""
    spark = next(iter(tables.values()))[0].sparkSession
    for name, (df, part_col) in tables.items():
        writer = df.write.mode("overwrite")
        if part_col is not None:
            writer = writer.partitionBy(part_col)
        writer.parquet(os.path.join(path, name))
    spark.createDataFrame([meta_row], schema=meta_schema).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "meta"))


def read_meta(spark: SparkSession, path: str, required: bool = True) -> Row | None:
    """The store's meta row.  ``required=False`` returns None for a store
    with no ``meta/`` directory (the pre-meta signature-index compat
    path) — probed by the READ itself, not a local os.path check, so the
    probe is any-FS-safe; only AnalysisException means absent."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(os.path.join(path, "meta")).first()
    except AnalysisException:
        if required:
            raise
        return None


def check_meta(
    meta: Row,
    expected: Mapping[str, object],
    path: str,
    store_name: str,
    hint: str = "rebuild the store, do not mix configurations",
) -> None:
    """Refuse a store written under a different configuration.  Compares
    exactly the ``expected`` fields (a meta row may carry more); the
    message keeps the ``field=value`` shape the store tests pin.  ``hint``
    customizes the consequence clause where "rebuild" is not the remedy
    (the holdout history's cross-seed leak explanation)."""
    got = meta.asDict()
    bad = {k: got.get(k) for k in expected if got.get(k) != expected[k]}
    if bad:
        have = ", ".join(f"{k}={got.get(k)}" for k in expected)
        want = ", ".join(f"{k}={v}" for k, v in expected.items())
        raise ValueError(
            f"{store_name} at {path} was written with {have}; this build "
            f"expects {want} — {hint}"
        )


def read_table(spark: SparkSession, path: str, name: str, schema: str | None) -> DataFrame:
    """One store table with an EXPLICIT schema (columns re-selected in
    schema order, so hive partition columns land where the schema says —
    as true partition attributes, prunable by the probe joins).  A None
    schema reads unguarded (tables whose shape the writer alone controls,
    e.g. k-row centroid tables).

    The schema string must be FLAT comma-separated ``name type`` pairs
    whose types contain no commas or spaces (``array<float>`` is fine,
    ``decimal(18, 4)`` or nested structs are not — the column-name
    extraction splits on ',' and the last ' ').  Every store schema today
    qualifies; a store needing a parameterized type should pass the
    parsed StructType instead of growing this parser."""
    target = os.path.join(path, name)
    if schema is None:
        return spark.read.parquet(target)
    cols = [part.strip().rsplit(" ", 1)[0] for part in schema.split(",")]
    return spark.read.schema(schema).parquet(target).select(*cols)
