"""Iterative graph plans: connected components, bounded BFS traversal,
merge-chain pointer jumping, sequence-anomaly detection (SURVEY D3/D10/D12/
D13, J2/S12, W2).

The Spark side runs the real iterative operators from
:mod:`oc_meta_spark.operators`; the oracles are recursive CTEs — genuinely
different algorithms arriving at the same fixpoint, which is a much stronger
check than re-stating the same SQL.

The graph is synthesized deterministically from the customer key space:
chain edges (c → c+1 except every 10th) + cross edges (c → c+5 at c≡3
mod 20), giving multi-hop components of bounded size so the recursive
oracle stays polynomial.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.operators.cc import connected_components
from oc_meta_spark.operators.traversal import bfs_frontier, resolve_chains
from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

_EDGES_SQL = """
    edges AS (
      SELECT a.c_custkey AS u, b.c_custkey AS v
      FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
      WHERE a.c_custkey % 10 <> 0
      UNION ALL
      SELECT a.c_custkey AS u, b.c_custkey AS v
      FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 5
      WHERE a.c_custkey % 20 = 3
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    a = cust.select(F.col("c_custkey").alias("u"))
    b = cust.select(F.col("c_custkey").alias("v"))
    chain = a.filter(F.col("u") % 10 != 0).join(b, F.col("v") == F.col("u") + 1)
    cross = a.filter(F.col("u") % 20 == 3).join(b, F.col("v") == F.col("u") + 5)
    return chain.select("u", "v").union(cross.select("u", "v"))


# ---------------------------------------------------------------------------
# G1 — connected components: distributed min-label propagation + pointer
# jumping vs a recursive-CTE transitive closure (SURVEY D3/D10/D12;
# union-find at oc_meta/lib/merge_registry.py:25-51).
# ---------------------------------------------------------------------------
@register(
    "G1_connected_components",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, s.v FROM reach JOIN sym s ON s.u = reach.r
    )
    SELECT node, MIN(r) AS component FROM reach GROUP BY node ORDER BY node
    """,
    doc="Connected components via iterative min-label + pointer jumping (SURVEY D3/D10).",
)
def g1_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    # local_threshold=0 forces the distributed min-label loop — this entry
    # exists to verify the scale path, not the small-graph fast path.
    labels = connected_components(_edges(spark, sf_dir), src="u", dst="v", local_threshold=0)
    return labels.select("node", F.col("comp").alias("component")).orderBy("node")


# ---------------------------------------------------------------------------
# G2 — bounded frontier traversal: BFS min-depth ≤3 from a seed set
# (SURVEY J2/S12; depth-capped recursive fetch, oc_meta/lib/finder.py:694-708).
# ---------------------------------------------------------------------------
@register(
    "G2_bounded_bfs",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    walk(node, depth) AS (
      SELECT c_custkey, 0 FROM customer WHERE c_custkey % 100 = 1
      UNION ALL
      SELECT e.v, w.depth + 1 FROM walk w JOIN edges e ON e.u = w.node WHERE w.depth < 3
    )
    SELECT node, CAST(MIN(depth) AS INT) AS depth FROM walk GROUP BY node ORDER BY node
    """,
    doc="Depth-capped BFS reachability with visited-set anti-joins (SURVEY J2/S12/SO4).",
)
def g2_bounded_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    seeds = cust.filter(F.col("c_custkey") % 100 == 1).select(F.col("c_custkey").alias("node"))
    out = bfs_frontier(_edges(spark, sf_dir), seeds, max_depth=3, src="u", dst="v")
    return out.select("node", F.col("depth").cast("int").alias("depth")).orderBy("node")


# ---------------------------------------------------------------------------
# G3 — merge-chain resolution by pointer jumping: (old → new) redirects
# followed to the final survivor in O(log L) rounds (SURVEY D13;
# oc_meta/run/find/merged_entities.py:36-102).
# ---------------------------------------------------------------------------
@register(
    "G3_merge_chain_resolution",
    f"""
    WITH RECURSIVE mapping AS (
      SELECT a.c_custkey AS old, b.c_custkey AS new
      FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
      WHERE a.c_custkey % 10 <> 0
    ),
    chase(old, cur) AS (
      SELECT old, new FROM mapping
      UNION
      SELECT chase.old, m.new FROM chase JOIN mapping m ON m.old = chase.cur
    )
    SELECT old, cur AS final FROM chase
    WHERE NOT EXISTS (SELECT 1 FROM mapping m WHERE m.old = chase.cur)
    ORDER BY old
    """,
    doc="Pointer-jumping merge-history resolution (SURVEY D13).",
)
def g3_merge_chain_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    a = cust.select(F.col("c_custkey").alias("old"))
    b = cust.select(F.col("c_custkey").alias("new"))
    mapping = a.filter(F.col("old") % 10 != 0).join(b, F.col("new") == F.col("old") + 1)
    return resolve_chains(mapping.select("old", "new"), src="old", dst="new").orderBy("old")


# ---------------------------------------------------------------------------
# W2 — sequence anomaly detection over corrupted positions (SURVEY W2;
# hasNext lints, oc_meta/run/find/hasnext_anomalies.py:82-238).  Positions
# are deterministically corrupted (every event_id ≡ 0 mod 97 shifts +1),
# then gaps/duplicates are detected with window lag.
# ---------------------------------------------------------------------------
@register(
    "W2_sequence_anomalies",
    """
    WITH pos0 AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               + CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    d AS (
      SELECT user_id, event_id, pos,
             pos - LAG(pos) OVER (PARTITION BY user_id ORDER BY pos, event_id) AS delta
      FROM pos0
    )
    SELECT user_id, event_id, pos,
           CASE WHEN delta = 0 THEN 'duplicate' ELSE 'gap' END AS anomaly
    FROM d WHERE delta IS NOT NULL AND delta <> 1
    ORDER BY user_id, pos, event_id
    """,
    doc="Chain-anomaly lint: gaps and duplicate positions via lag (SURVEY W2).",
)
def w2_sequence_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w0 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos0 = ev.withColumn(
        "pos",
        F.row_number().over(w0) + F.when(F.col("event_id") % 97 == 0, 1).otherwise(0),
    )
    w1 = Window.partitionBy("user_id").orderBy("pos", "event_id")
    d = pos0.withColumn("delta", F.col("pos") - F.lag("pos").over(w1))
    return (
        d.filter(F.col("delta").isNotNull() & (F.col("delta") != 1))
        .select(
            "user_id",
            "event_id",
            "pos",
            F.when(F.col("delta") == 0, "duplicate").otherwise("gap").alias("anomaly"),
        )
        .orderBy("user_id", "pos", "event_id")
    )
