"""Metadata-CSV source with sanitization (SURVEY S1/S5).

Reference: ``get_csv_data`` strips NUL bytes, normalizes unicode spaces and
grows the field-size limit (oc_meta/lib/file_manager.py:99-120);
``collect_files`` walks directories for inputs (:47-96).  Spark-native:
one multiline-aware csv scan over a glob (recursive lookup replaces the
directory walk) followed by a sanitization projection — the scan stays
columnar and parallel instead of the reference's row-dict reader.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.functions.cleaning import SPACES
from oc_meta_spark.schemas import META_INPUT_COLUMNS, META_INPUT_SCHEMA


def read_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read one file, a directory, or a glob of metadata CSVs, sanitized.

    Quoted multiline fields are honored; NULs and unicode spaces are
    normalized in the same projection (pushed into the scan stage by
    whole-stage codegen, no extra pass).
    """
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.csv")
        .schema(META_INPUT_SCHEMA)
        .csv(path)
    )
    clean = lambda c: F.translate(F.col(c), "\x00" + SPACES, " " * (1 + len(SPACES)))
    return df.select([clean(c).alias(c) for c in META_INPUT_COLUMNS])
