"""Connected components as a reusable DataFrame operator.

Replaces the reference's in-memory union-find (`EntityStore`,
oc_meta/lib/merge_registry.py:8-264; UnionFind in
oc_meta/run/find/duplicated_entities.py:24-52) with distributed min-label
propagation + pointer jumping:

- every node starts labeled with itself;
- each round, a node takes the min label over itself and its neighbors
  (one shuffle on the symmetrized edge list);
- a pointer-jumping step (label := label's label) then compresses paths,
  giving O(log diameter) convergence instead of O(diameter);
- lineage is truncated every round with ``localCheckpoint`` so the plan
  doesn't grow unboundedly — mandatory for iterative DataFrame algorithms.

At 100 TB scale the shuffle key is the node id; skewed hub nodes are handled
by AQE skew-join splitting (enabled in the session factory).  The driver-side
loop only ever collects a single aggregate (the convergence count), never
data rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _local_union_find_rows(spark, edge_rows, edges: DataFrame, src: str) -> DataFrame:
    """Driver-side union-find for small edge sets — the same adaptive
    physical-plan choice as a broadcast join: identical (node, min-node)
    output, none of the per-iteration job overhead.  Only entered below
    ``local_threshold`` edges, so driver memory is bounded.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edge_rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    rows = [(n, find(n)) for n in parent]
    schema = edges.select(F.col(src).alias("node"), F.col(src).alias("comp")).schema
    return spark.createDataFrame(rows, schema)


def _local_union_find(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Back-compat wrapper: collect then solve on the driver."""
    return _local_union_find_rows(
        edges.sparkSession, edges.select(src, dst).collect(), edges, src
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Return (node, component) where component = min node id in the
    weakly-connected component.  Edges are treated as undirected.

    Below ``local_threshold`` edges the computation runs as driver-side
    union-find (identical result, no iterative shuffles); pass
    ``local_threshold=0`` to force the distributed loop.
    """
    if local_threshold:
        # Edge-count alone is not a safe driver-memory proxy: long node
        # labels (token strings) could make 100k edges heavy.  Probe a
        # SMALL sample first and extrapolate to the threshold BEFORE
        # collecting the full head, so the guard prevents the blow-up
        # instead of measuring it post-hoc.  (The sample is the first rows
        # of the plan — cheap but biased if early rows are atypically
        # short; the 64 MB budget leaves ample slack for that.)
        sample = edges.select(src, dst).limit(1000).collect()
        avg = (
            sum(len(str(u)) + len(str(v)) for u, v in sample) / len(sample) if sample else 0
        )
        if avg * local_threshold <= 64 * 1024 * 1024:
            head = edges.select(src, dst).limit(local_threshold + 1).collect()
            if len(head) <= local_threshold:
                return _local_union_find_rows(edges.sparkSession, head, edges, src)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .dropDuplicates()
        # Materialize once: every iteration joins against sym; without this
        # the whole upstream plan (scan + union + distinct) re-executes per
        # round.
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .dropDuplicates()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Min over own label and neighbors' labels (one shuffle).
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            neighbor_labels.union(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # Pointer jumping: comp := comp's comp (path compression).
        mapping = new_labels.select(F.col("node").alias("m_node"), F.col("comp").alias("m_comp"))
        new_labels = (
            new_labels.join(mapping, new_labels.comp == mapping.m_node, "left")
            .select("node", F.coalesce("m_comp", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
