"""Core relational plans: scans, filters, joins, aggregations, windows,
set operations — the generic analogs of SURVEY §2.2/§2.3/§2.5/§2.6/§2.7
exercised on the synthetic star schema.

Every builder is a declarative DataFrame plan: Catalyst handles predicate
pushdown into the parquet scan, column pruning, join reordering and (with
AQE) runtime broadcast selection — the optimizations the reference hand-rolls
(SURVEY §4 O1/O2) come from the planner here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# A1 — aggregation over the fact table (TPC-H Q1 shape).
# Reference analog: entity counts / verification rollups
# (oc_meta/run/count/meta_entities.py:78-116, run/meta/check_results.py).
# ---------------------------------------------------------------------------
@register(
    "A1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Fact-table aggregation with exact decimal arithmetic (SURVEY A1/A6).",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# J6 — fixed-depth hierarchy traversal: lineitem→orders→customer→nation→region
# (reference: venue hierarchy article→issue→volume→journal,
# oc_meta/lib/finder.py:495-529 — ≤3 chained lookups, here chained joins).
# ---------------------------------------------------------------------------
@register(
    "J6_hierarchy_revenue",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region_name, nation_name
    """,
    doc="Containment-hierarchy rollup via chained equi-joins (SURVEY J6).",
)
def j6_hierarchy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# J1 — batched identifier→entity resolution: a small batch of keys joined
# against a big table, broadcast on the batch side (reference: VALUES-batched
# SPARQL lookups, oc_meta/lib/finder.py:765-833; batching constants
# oc_meta/constants.py:38).  In Spark the join IS the batch.
# ---------------------------------------------------------------------------
@register(
    "J1_batch_key_resolution",
    """
    WITH batch AS (
      SELECT c_custkey, c_name FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 100
    )
    SELECT b.c_custkey AS custkey, b.c_name AS name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
    FROM batch b LEFT JOIN orders o ON b.c_custkey = o.o_custkey
    GROUP BY b.c_custkey, b.c_name
    ORDER BY custkey
    """,
    doc="Broadcast batch-side lookup join replacing point queries (SURVEY J1/J4, O1/O2).",
)
def j1_batch_key_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    batch = cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")).limit(100).select("c_custkey", "c_name")
    return (
        F.broadcast(batch)
        .join(orders, batch.c_custkey == orders.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0)).cast(DEC)).cast("double").alias("total_spend"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# J3 — composite-key equi-join (reference: venue/volume/issue 3-key
# resolution, oc_meta/lib/finder.py:835-1004).
# ---------------------------------------------------------------------------
@register(
    "J3_composite_key_join",
    """
    SELECT c.c_nationkey AS nationkey,
           CAST(FLOOR(c.c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(DISTINCT s.s_suppkey) AS n_suppliers
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND CAST(FLOOR(c.c_acctbal / 1000) AS BIGINT) = CAST(FLOOR(s.s_acctbal / 1000) AS BIGINT)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Multi-column equi-join on a derived composite key (SURVEY J3).",
)
def j3_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    cb = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    sb = F.floor(F.col("s_acctbal") / 1000).cast("bigint")
    c = cust.withColumn("bal_bucket", cb)
    s = supp.withColumn("bal_bucket", sb)
    return (
        c.join(s, (c.c_nationkey == s.s_nationkey) & (c["bal_bucket"] == s["bal_bucket"]))
        .groupBy(c.c_nationkey.alias("nationkey"), c["bal_bucket"].alias("bal_bucket"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("nationkey", "bal_bucket")
    )


# ---------------------------------------------------------------------------
# SO3 — anti-join: inputs minus already-processed set (reference: cache.txt
# completed-file subtraction, oc_meta/run/meta_process.py:183-190; Redis
# existing-id filter run/meta/preprocess_input.py:157-193).
# ---------------------------------------------------------------------------
@register(
    "SO3_anti_join_unprocessed",
    """
    SELECT c.c_custkey AS custkey, c.c_name AS name, c.c_mktsegment AS segment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY custkey
    """,
    doc="left_anti join as set-difference (SURVEY SO3/SO4, F5).",
)
def so3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# SO5 — semi-join: keep rows with at least one match (reference: visited-set
# membership, files-to-process intersection).
# ---------------------------------------------------------------------------
@register(
    "SO5_semi_join_active",
    """
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 45
    )
    ORDER BY suppkey
    """,
    doc="left_semi join membership probe (SURVEY SO4).",
)
def so5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# F1 — type-dependent row-validity predicate as one boolean expression
# (reference: is_a_valid_row, oc_meta/core/curator.py:1468-1535 — with-id
# vs without-id branches with per-type required fields).
# ---------------------------------------------------------------------------
@register(
    "F1_validity_filter",
    """
    SELECT o_orderstatus AS status, valid, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM (
      SELECT *,
        CASE WHEN o_orderstatus = 'F' THEN o_totalprice > 50000
             WHEN o_orderstatus = 'O' THEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             ELSE o_totalprice > 100000 AND o_orderpriority <> '5-LOW'
        END AS valid
      FROM orders
    )
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Branching validity predicate compiled to one when/otherwise expression (SURVEY F1-F4).",
)
def f1_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    valid = (
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice") > 50000)
        .when(F.col("o_orderstatus") == "O", F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .otherwise((F.col("o_totalprice") > 100000) & (F.col("o_orderpriority") != "5-LOW"))
    )
    return (
        orders.withColumn("valid", valid)
        .groupBy(F.col("o_orderstatus").alias("status"), "valid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy("status", "valid")
    )


# ---------------------------------------------------------------------------
# W1 — sequence position assignment: the explicit-`pos` replacement for the
# reference's hasNext linked lists (oc_meta/lib/finder.py:340-408; SURVEY
# §1.2 "oco:hasNext ⇒ pos column").  row_number gives the pos; lead()
# reconstructs the chain (`has_next`) for export.
# ---------------------------------------------------------------------------
@register(
    "W1_sequence_positions",
    """
    SELECT user_id, pos, event_id, event_type, next_event_id
    FROM (
      SELECT user_id,
             ROW_NUMBER() OVER w AS pos,
             event_id, event_type,
             LEAD(event_id) OVER w AS next_event_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE user_id < 100
    ORDER BY user_id, pos
    """,
    doc="Linked-list ⇄ pos conversion via window functions (SURVEY W1/J5).",
)
def w1_sequence_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("pos", F.row_number().over(w))
        .withColumn("next_event_id", F.lead("event_id").over(w))
        .filter(F.col("user_id") < 100)
        .select("user_id", "pos", "event_id", "event_type", "next_event_id")
        .orderBy("user_id", "pos")
    )


# ---------------------------------------------------------------------------
# W4 — top-1 per group (reference: max-numbered file selection,
# oc_meta/run/infodir/gen.py:24-45).
# ---------------------------------------------------------------------------
@register(
    "W4_latest_event_per_user",
    """
    SELECT user_id, event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Deterministic top-1 per key via row_number (SURVEY W4).",
)
def w4_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# A2 — grouped distinct counts (reference: role counts,
# oc_meta/run/count/meta_entities.py:91-116).
# ---------------------------------------------------------------------------
@register(
    "A2_grouped_distinct_counts",
    """
    SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="groupBy + countDistinct (SURVEY A1/A2/D14).",
)
def a2_grouped_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# J11 — multi-assignment detection: keys mapped to >1 distinct entity
# (reference: multi-OMID detection, oc_meta/run/meta/check_results.py:131-199).
# ---------------------------------------------------------------------------
@register(
    "J11_multi_assignment_check",
    """
    SELECT l_partkey AS partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(DISTINCT l_suppkey) > 1
    ORDER BY n_suppliers DESC, partkey
    LIMIT 500
    """,
    doc="Integrity check: entities with more than one assignment (SURVEY J11/D9).",
)
def j11_multi_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .filter(F.col("n_suppliers") > 1)
        .orderBy(F.col("n_suppliers").desc(), F.col("partkey"))
        .limit(500)
    )


# ---------------------------------------------------------------------------
# W5 — first-non-null propagation within a group (reference: canonical-row
# value propagation to duplicates, oc_meta/core/curator.py:1382-1386).
# NULLs are synthesized deterministically (every 3rd event's props is null).
# ---------------------------------------------------------------------------
@register(
    "W5_first_non_null_propagation",
    """
    SELECT event_id, user_id,
           COALESCE(props_masked,
                    FIRST_VALUE(props_masked IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS props_filled
    FROM (SELECT *, CASE WHEN event_id % 3 = 0 THEN NULL ELSE props END AS props_masked FROM events)
    WHERE user_id < 100
    ORDER BY event_id
    """,
    doc="first(ignorenulls) over a window — duplicate-propagation (SURVEY W5/D4).",
)
def w5_first_non_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "props_masked", F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("props"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.withColumn("props_filled", F.coalesce(F.col("props_masked"), F.first("props_masked", ignorenulls=True).over(w)))
        .filter(F.col("user_id") < 100)
        .select("event_id", "user_id", "props_filled")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# A5 — benchmark statistics: mean/min/max/stddev over groups (reference:
# oc_meta/run/benchmark/statistics.py:97-177).  stddev is computed from
# exact decimal sums (sum, sum of squares) so both engines agree bitwise.
# ---------------------------------------------------------------------------
@register(
    "A5_group_statistics",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS min_v,
           CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean_v,
           CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_sq
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact-arithmetic summary statistics (SURVEY A5).",
)
def a5_group_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast(DEC)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).cast("double").alias("min_v"),
            F.max(v).cast("double").alias("max_v"),
            (F.sum(v).cast("double") / F.count(F.lit(1))).alias("mean_v"),
            F.sum(v * v).cast("double").alias("sum_sq"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# J10 — reconciliation join: per-group max from one source vs another
# (reference: counter/infodir reconciliation, oc_meta/run/infodir/check.py).
# ---------------------------------------------------------------------------
@register(
    "J10_counter_reconciliation",
    """
    WITH o AS (SELECT o_custkey, MAX(o_orderkey) AS max_order, COUNT(*) AS n FROM orders GROUP BY o_custkey)
    SELECT c.c_custkey AS custkey, o.max_order, o.n AS n_orders,
           (o.o_custkey IS NOT NULL) AS has_orders
    FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey <= 300
    ORDER BY custkey
    """,
    doc="Max-counter reconciliation across two sources (SURVEY J10/A4).",
)
def j10_counter_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    o = orders.groupBy("o_custkey").agg(F.max("o_orderkey").alias("max_order"), F.count(F.lit(1)).alias("n"))
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left")
        .filter(F.col("c_custkey") <= 300)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("max_order"),
            F.col("n").alias("n_orders"),
            F.col("o_custkey").isNotNull().alias("has_orders"),
        )
        .orderBy("custkey")
    )
