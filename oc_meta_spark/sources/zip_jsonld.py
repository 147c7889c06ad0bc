"""Zipped JSON-LD containers (SURVEY S4): read zip members as rows, write
per-split zip archives.

The reference stores its RDF dump as zip archives of JSON-LD files
(oc_meta/lib/archive_manager.py — ``zipfile`` members named ``<n>.json``
inside ``<kind>/<dir_split>/`` folders) and reads them back member by
member.  Spark-side equivalent:

- ``read_zip_jsonld`` — ``binaryFile`` scan of ``*.zip`` + ``mapInPandas``
  unpacking each archive's members into one row per JSON-LD entity line.
  Archives unpack independently per partition, so a dump of many zips
  parallelizes across executors; one giant zip is the degenerate case and
  should be split upstream (the writer here never produces it).
- ``write_zip_jsonld`` — groups entity rows by ``(kind, dir_split)`` and
  writes one zip per group via ``applyInPandas`` (executor-local writes;
  the target must be a shared filesystem, which is also the reference's
  operating assumption for its output directory).

The JSON-LD payload dialect is the engine's own export (sources/export.py
``entity_jsonld_rows``), parseable by ``plans/generate_csv.parse_jsonld``.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_READ_SCHEMA = "src string, member string, jsonld string"


def read_zip_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """All JSON lines of every ``*.zip`` member under ``path``.

    Returns columns ``src`` (archive file), ``member`` (zip member name),
    ``jsonld`` (one JSON document per row — members may hold one document
    per line, the writer's layout, or a single document).
    """
    bins = spark.read.format("binaryFile").option("pathGlobFilter", "*.zip").option(
        "recursiveFileLookup", "true"
    ).load(path)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_src, out_member, out_doc = [], [], []
            for src, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in zf.namelist():
                        if name.endswith("/"):
                            continue
                        text = zf.read(name).decode("utf-8")
                        for line in text.splitlines():
                            line = line.strip()
                            if line:
                                out_src.append(src)
                                out_member.append(name)
                                out_doc.append(line)
            yield pd.DataFrame({"src": out_src, "member": out_member, "jsonld": out_doc})

    return bins.select("path", "content").mapInPandas(unpack, _READ_SCHEMA)


def write_zip_jsonld(catalog, path: str) -> None:
    """One ``<kind>/<dir_split>.zip`` per split, members ``<file_n>.json``
    holding one JSON-LD document per line (the reference's archived-dump
    layout, zip-per-split granularity)."""
    from oc_meta_spark.sources.export import entity_jsonld_rows

    rows = entity_jsonld_rows(catalog)
    os.makedirs(path, exist_ok=True)

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        kind = pdf["kind"].iloc[0]
        dir_split = int(pdf["dir_split"].iloc[0])
        os.makedirs(os.path.join(path, kind), exist_ok=True)
        target = os.path.join(path, kind, f"{dir_split}.zip")
        with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
            for file_n, grp in pdf.groupby("file_n"):
                payload = "\n".join(grp.sort_values("omid")["jsonld"]) + "\n"
                zf.writestr(f"{int(file_n)}.json", payload)
        return pd.DataFrame({"kind": [kind], "dir_split": [dir_split], "n": [len(pdf)]})

    (
        rows.repartition("kind", "dir_split")
        .groupBy("kind", "dir_split")
        .applyInPandas(write_group, "kind string, dir_split long, n long")
        .collect()
    )
