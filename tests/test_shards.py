"""Training-shard sink round-trip: layout, bounded shard size, partition
pruning, and manifest consistency."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from oc_meta_spark.sources.shards import (
    read_training_shards,
    shard_manifest,
    write_training_shards,
)
from oc_meta_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_shard_roundtrip_and_layout(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "text")
    n = docs.count()
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, records_per_shard=10)

    # hive layout: one directory per source, each parquet file ≤ 10 rows
    src_dirs = sorted(os.path.basename(p) for p in glob.glob(out + "/source=*"))
    assert src_dirs and all(d.startswith("source=") for d in src_dirs)
    for f in glob.glob(out + "/source=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 10, f

    back = read_training_shards(spark, out)
    assert back.count() == n
    # row content survives (source comes back from the directory name)
    a = {(r.doc_id, r.source, r.text) for r in docs.collect()}
    b = {(r.doc_id, r.source, r.text) for r in back.collect()}
    assert a == b


def test_shard_source_filter_partition_prunes(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, records_per_shard=1000)
    one = read_training_shards(spark, out, sources=["src1"])
    assert one.count() == docs.filter("source = 'src1'").count()
    # the source filter must be a partition filter, not a row filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "src1" in plan, plan[:2000]


def test_shard_subsplit_bounds_writer_tasks(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, records_per_shard=1000, shards_per_source=3)
    dirs = glob.glob(out + "/source=*/shard=*")
    assert dirs, "no (source, shard) sub-split"
    back = read_training_shards(spark, out)
    assert back.count() == docs.count()


def test_shard_manifest_matches_corpus(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, records_per_shard=10)
    m = shard_manifest(spark, out)
    tot = m.agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")).first()
    exp = docs.select(F.size(F.split("text", " ")).alias("n")).agg(
        F.count(F.lit(1)).alias("d"), F.sum("n").alias("t")
    ).first()
    assert (tot.d, tot.t) == (exp.d, exp.t)
