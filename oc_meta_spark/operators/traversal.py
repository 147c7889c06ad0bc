"""Bounded iterative graph traversal operators.

The reference's recursive subgraph fetch walks URIs breadth-first with a
visited set and a depth cap (``process_batch_parallel``,
oc_meta/lib/finder.py:639-710, depth ≤10; subset extraction
oc_meta/run/migration/extract_subset.py:96-157).  Spark-native equivalent:
a driver loop of frontier joins with an anti-join against the visited set —
each round is one shuffle; the loop is bounded by ``max_depth`` exactly like
the reference's cap.

The merge-history pointer chase (A merged into B merged into C ⇒ A resolves
to C; oc_meta/run/find/merged_entities.py:36-102) is ``resolve_chains``:
pointer jumping (mapping := mapping∘mapping) reaches fixpoint in O(log chain
length) rounds — at 100 TB the total work is O(E log L) instead of the
reference's sequential O(E·L) walk.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bfs_frontier(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Breadth-first reachability: returns (node, depth) with the minimum
    depth ≤ max_depth at which each node is reached from the seed set
    (seeds have depth 0).  Directed edges.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).dropDuplicates()
    visited = seeds.select(F.col(node).alias("node")).dropDuplicates().withColumn(
        "depth", F.lit(0)
    ).localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "u").select("u"), "u")
            .select(F.col("v").alias("node"))
            .dropDuplicates()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def resolve_chains(mapping: DataFrame, src: str = "old", dst: str = "new", max_iter: int = 32) -> DataFrame:
    """Resolve merge chains to their final survivor by pointer jumping.

    ``mapping`` holds (old → new) redirect pairs; a node may itself be
    redirected.  Returns (old, final) where final has no outgoing redirect.
    Cycles are broken deterministically by stopping at ``max_iter`` (the
    reference cycle-guards with a visited set; a cycle in merge history is
    data corruption either way).
    """
    m = mapping.select(F.col(src).alias("old"), F.col(dst).alias("cur"))
    for _ in range(max_iter):
        nxt = m.select(F.col("old").alias("j_old"), F.col("cur").alias("j_cur"))
        jumped = (
            m.join(nxt, m.cur == nxt.j_old, "left")
            .select("old", F.coalesce("j_cur", "cur").alias("cur"))
            .localCheckpoint(eager=True)
        )
        progressed = (
            jumped.alias("a")
            .join(m.alias("b"), "old")
            .filter(F.col("a.cur") != F.col("b.cur"))
            .limit(1)
            .count()
        )
        m = jumped
        if progressed == 0:
            break
    return m.select("old", F.col("cur").alias("final"))
