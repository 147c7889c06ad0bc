"""Persisted IVF (inverted-file) ANN index: the nightly shape of X5.

X5's gate recomputes centroids and cell assignments per run — correct for
a one-shot search, but a GROWING corpus trains once and appends nightly
(the FAISS train-once / add-many discipline; Sivic & Zisserman ICCV'03 —
public techniques).  This module persists the index like the dedup
signature index (plans/incremental.py, same write/read/config-guard
contract; reference analog: the resumable-cache discipline of
oc_meta/run/meta_process.py:183-190 — processed state is immutable across
runs):

- ``centroids``: the k founding vectors with the smallest md5(vec_id)
  (the deterministic seedless draw X5 established — both engines compute
  it identically), FROZEN at build time.  Appending never re-draws:
  re-training is a rebuild, exactly like re-hashing the signature index.
- ``assignments``: (vec_id, embedding, cid) — every indexed vector in its
  argmax-cosine cell, hive-partitioned by ``cid`` so a probe reads ONLY
  the probed cells' files (the parquet analog of FAISS inverted lists).
- ``meta``: one row recording (k, draw rule); ``read_ivf_index`` refuses
  an index built under a different configuration — mismatched k would
  silently change every cell boundary.

Because centroids are frozen, each vector's cell is independent of every
other vector — so ``extend_ivf_index`` (assign the delta against the
frozen centroids, union) is EXACTLY equivalent to rebuilding assignments
for the full corpus against the same centroids, at the cost of the delta
only (pinned by tests/test_ivf_index.py), and idempotent under retried
appends.

Scale shape (100 TB of vectors, ~1 TB nightly delta): centroids are k
rows — always broadcast; assignment of a delta is one narrow N_delta × k
map + a per-vector window (partition-parallel); search probes nprobe
cells per query — the assignments side is left-semi prefiltered on a
broadcast of the probed cids (delta-keyed, like ID1's index probes), so
the corpus-sized inverted lists are partition-pruned and never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.functions.vectors import cosine

IVF_DRAW = "md5_vec_id"  # the centroid-draw rule the meta table records


@dataclass
class IvfIndex:
    """The persisted ANN index (see module doc)."""

    centroids: DataFrame  # (cid, ce): frozen at build time
    assignments: DataFrame  # (vec_id, embedding, cid): the inverted lists
    k: int


def draw_centroids(vecs: DataFrame, k: int) -> DataFrame:
    """(cid, ce): the k vectors with the smallest md5(vec_id) — X5's
    deterministic seedless draw, computed identically by both engines."""
    return (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    )


def assign_cells(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cid): each vector in its argmax-cosine cell
    (ties → min cid).  One broadcast N×k map + a per-vector window — the
    ONE cell-assignment kernel; X5's gate and the persisted index both
    use it."""
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("cid"))
    return (
        vecs.join(F.broadcast(centroids))
        .withColumn("_cos", cosine("embedding", "ce"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )


def build_ivf_index(vecs: DataFrame, k: int) -> IvfIndex:
    centroids = draw_centroids(vecs, k)
    return IvfIndex(centroids=centroids, assignments=assign_cells(vecs, centroids), k=k)


def extend_ivf_index(index: IvfIndex, new_vecs: DataFrame) -> IvfIndex:
    """The nightly append: assign the delta against the FROZEN centroids
    and union the inverted lists.  Equivalent to rebuilding assignments
    for the full corpus against the same centroids (each vector's cell
    depends only on the centroids), at delta cost; idempotent under a
    retried append (vec_ids are stable — re-adding an existing vec_id
    with a different embedding is a revision and needs a rebuild; its old
    row is kept, never silently doubled).

    Delta-keyed: the corpus-sized assignments are probed with a BROADCAST
    of the delta's vec_ids (left-semi — a scan, not a shuffle) and only
    genuinely-new rows are appended — the retry guard never shuffles the
    corpus the way a full-width dropDuplicates would."""
    from oc_meta_spark.plans.incremental import fresh_only

    delta = assign_cells(new_vecs, index.centroids)
    return IvfIndex(
        centroids=index.centroids,
        assignments=index.assignments.unionByName(
            fresh_only(delta, index.assignments, "vec_id")
        ),
        k=index.k,
    )


def write_ivf_index(index: IvfIndex, path: str) -> None:
    """Persist centroids/ (k rows, plain), assignments/ hive-partitioned
    by cid (probe-pruned inverted lists), and the one-row meta/ config
    table — the shared store contract (plans/store_contract.py)."""
    from oc_meta_spark.plans.store_contract import write_store

    write_store(
        path,
        {
            "centroids": (index.centroids, None),
            "assignments": (index.assignments, "cid"),
        },
        "k int, draw string",
        (index.k, IVF_DRAW),
    )


def read_ivf_index(spark: SparkSession, path: str, k: int) -> IvfIndex:
    """Load a persisted index, refusing one built under a different k or
    draw rule — mismatched centroids silently move every cell boundary.
    Explicit assignments schema (the store contract's rule): cid comes
    back as the scan's bigint PARTITION ATTRIBUTE, so the probed-cid
    semi-join dynamic-partition-prunes the inverted lists without a
    cast."""
    from oc_meta_spark.plans.store_contract import check_meta, read_meta, read_table

    meta = read_meta(spark, path)
    check_meta(meta, {"k": k, "draw": IVF_DRAW}, path, "ivf index")
    return IvfIndex(
        centroids=read_table(spark, path, "centroids", None),
        assignments=read_table(
            spark, path, "assignments", "vec_id bigint, embedding array<float>, cid bigint"
        ),
        k=k,
    )


def search_ivf_index(
    queries: DataFrame, index: IvfIndex, nprobe: int, topk: int
) -> DataFrame:
    """(qid, vec_id, cosine, rank): top-k by exact cosine among the
    vectors in each query's ``nprobe`` best cells.  The probe set is
    query-bounded, so the assignments side is left-semi prefiltered on a
    broadcast of the probed cids — partition-pruned against the persisted
    cid layout, never shuffled at corpus size.  Queries: (qid, qe)."""
    w_probe = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), F.col("cid"))
    probe = (
        queries.join(F.broadcast(index.centroids))
        .withColumn("_cos", cosine("qe", "ce"))
        .withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qe", "cid")
    )
    probed_cells = index.assignments.join(
        F.broadcast(probe.select("cid").dropDuplicates()), "cid", "left_semi"
    )
    scored = (
        probe.join(probed_cells, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine("qe", "embedding").alias("cosine"))
    )
    w_rank = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= topk)
        .select("qid", "vec_id", "cosine", "rank")
    )
