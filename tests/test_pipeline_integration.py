"""End-to-end training-data pipeline integration: the individual gates
prove each stage against DuckDB; this drives the stages COMPOSED through
real execution — classify → exact-dedup → pack → shard-write → read-back
— and checks cross-stage invariants on the materialized output."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
from pyspark.sql import Window

from oc_meta_spark.sources.shards import read_training_shards, write_training_shards
from oc_meta_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_BUDGET = 2048


def test_full_corpus_prep_pipeline(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "text")
    n_in = docs.count()

    # stage 1 — quality classification (T7's model, keep = z >= 0)
    ws = F.split("text", " ")
    feats = docs.select(
        "doc_id", "source", "text",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_uniq"),
        F.size(F.filter(ws, lambda w: w.isin("the", "a", "of", "and", "to", "in"))).alias("n_stop"),
    )
    z = (
        F.lit(-2.1)
        + F.lit(0.015) * F.col("n_words")
        + F.lit(2.4) * (F.col("n_uniq").cast("double") / F.col("n_words"))
        + F.lit(1.8) * (F.col("n_stop").cast("double") / F.col("n_words"))
    )
    kept = feats.filter(z >= 0)
    n_kept = kept.count()
    assert 0 < n_kept < n_in, (n_kept, n_in)  # the filter actually cuts

    # stage 2 — exact dedup (D8: one survivor per text hash)
    deduped = (
        kept.withColumn("h", F.md5("text"))
        .withColumn("rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id")))
        .filter(F.col("rn") == 1)
        .drop("h", "rn")
    )
    assert deduped.groupBy(F.md5("text")).count().agg(F.max("count")).first()[0] == 1

    # stage 3 — greedy token packing per source (MX2's bin assignment)
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = deduped.withColumn("cum", F.sum("n_words").over(w)).withColumn(
        "bin", F.floor((F.col("cum") - 1) / _BUDGET)
    )
    # bins are dense from 0 and contiguous per source
    bins = packed.groupBy("source").agg(
        F.min("bin").alias("mn"), F.max("bin").alias("mx"), F.countDistinct("bin").alias("nd")
    )
    for r in bins.collect():
        assert r.mn == 0 and r.nd == r.mx + 1, r

    # stage 4 — shard sink + read-back
    out = str(tmp_path / "shards")
    write_training_shards(
        packed.select("doc_id", "source", "text", "n_words", "bin"),
        out,
        records_per_shard=50,
    )
    back = read_training_shards(spark, out)
    assert back.count() == deduped.count()
    # every (source, bin) group survives the round trip with its token sum
    a = {
        (r.source, r.bin): r.t
        for r in packed.groupBy("source", "bin").agg(F.sum("n_words").alias("t")).collect()
    }
    b = {
        (r.source, int(r.bin)): r.t
        for r in back.groupBy("source", "bin").agg(F.sum("n_words").alias("t")).collect()
    }
    assert a == b
    # no shard file exceeds the record bound
    for f in glob.glob(out + "/source=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 50, f
