"""Parquet table loading for the synthetic benchmark tables.

Mirrors the reference's recursive file collection + scan operators
(S1/S5, ``oc_meta/lib/file_manager.py:47-120``) as plain columnar scans:
``spark.read.parquet`` gives predicate pushdown + column pruning for free,
which the reference's row-oriented ``list[dict]`` reader cannot do.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    # Spark 4 rejects INT64(TIMESTAMP(NANOS)) parquet columns by default; the
    # events table is nanosecond-precision.  Read nanos as long, then rebuild
    # a TIMESTAMP_NTZ from epoch arithmetic.  NTZ + integer `div` truncation
    # keeps values bit-identical to DuckDB's ns→µs read, independent of the
    # session time zone (a TIMESTAMP_LTZ round-trip would shift wall time).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so plans can be written in SQL."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
