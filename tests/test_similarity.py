"""ANN scale-shape assertions (SURVEY §7.2 M6; VERDICT round-1 item 6).

The multi-table sign-bit LSH default must keep buckets small relative to
N — the property that makes the per-bucket self-join survive a 100×
scale-up.  The correctness of the candidate/top-1 semantics is covered by
the X3 oracle gate; this file pins the PLAN-SHAPE property.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from oc_meta_spark.plans.similarity_queries import LSH_BITS, LSH_TABLES, _bucket
from oc_meta_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_default_bits_bound_bucket_size(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    n = emb.count()
    for t in range(LSH_TABLES):
        top = (
            emb.select(_bucket("embedding", LSH_BITS, t * LSH_BITS).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
        )
        # no bucket holds more than 1% of rows (allow a floor for tiny SFs)
        assert top <= max(2, 0.01 * n), f"table {t}: max bucket {top} of {n}"


def test_default_configuration_is_scale_safe():
    # 2^bits buckets must dwarf any realistic per-partition row count —
    # the 4-bit variant (16 buckets) is a test configuration only.
    assert LSH_BITS >= 16
    assert LSH_TABLES >= 2
