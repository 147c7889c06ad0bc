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


def test_ivf_ann_recall_floor_vs_bruteforce(spark, sf_dir):
    """X5's IVF search must retrieve a stable fraction of the true top-10
    (X2 brute force).  The synthetic embeddings are near-random, which is
    the WORST case for cell-probing ANN (cosines concentrate, cells carry
    little signal) — mean recall ~0.5 at nprobe defaults; this pins a 0.4
    floor so a broken cell assignment or probe ordering (which drops
    recall toward 1/IVF_K) fails loudly."""
    from oc_meta_spark.plans.registry import load_all

    qs = load_all()
    sf = sf_dir
    gt: dict[int, set] = {}
    for r in qs["X2_cosine_topk_bruteforce"].builder(spark, sf).collect():
        gt.setdefault(r["qid"], set()).add(r["vec_id"])
    got: dict[int, set] = {}
    for r in qs["X5_ivf_ann"].builder(spark, sf).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [len(gt[q] & got.get(q, set())) / len(gt[q]) for q in gt]
    assert sum(recalls) / len(recalls) >= 0.4, recalls
