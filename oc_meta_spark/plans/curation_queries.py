"""Gate entries for the remaining SURVEY §2 operators: citation resolution
(J8), publisher inheritance (J7), merge-neighborhood discovery (J9),
counting ops (A3/A4), array set operations (SO1/SO2), and the end-to-end
curation pipeline itself.  The whole-pipeline gates come in pairs: a
rows-only raw gate (CUR1/CUR2, RT1, VR1 — minted omids make the raw
output un-hashable) plus a mint-independent invariant ORACLE derived by
a DuckDB CTE from the same raw tables (CUR3/CUR4, RT2, VR2, VD2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# J8 — citation-id → OMID mapping with orphan accounting (reference
# convert_citations, oc_meta/run/meta/convert_citations.py:33-108).
# Citations are synthesized from lineitem (order cites part); the part-side
# mapping is deliberately partial so orphans exist.
# ---------------------------------------------------------------------------
@register(
    "J8_citation_resolution",
    """
    WITH citations AS (
      SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR) AS citing_id,
                      'part:' || CAST(l_partkey AS VARCHAR) AS cited_id
      FROM lineitem
    ),
    map_citing AS (
      SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS id_key,
             'br/' || CAST(o_orderkey AS VARCHAR) AS omid
      FROM orders
    ),
    map_cited AS (
      SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS id_key,
             'br/p' || CAST(p_partkey AS VARCHAR) AS omid
      FROM part WHERE p_partkey % 4 <> 0
    ),
    joined AS (
      SELECT c.citing_id, c.cited_id, mc.omid AS citing_omid, md.omid AS cited_omid
      FROM citations c
      LEFT JOIN map_citing mc ON c.citing_id = mc.id_key
      LEFT JOIN map_cited md ON c.cited_id = md.id_key
    )
    SELECT COUNT(*) AS n_citations,
           CAST(SUM(CASE WHEN citing_omid IS NOT NULL AND cited_omid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_resolved,
           CAST(SUM(CASE WHEN citing_omid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_citing,
           CAST(SUM(CASE WHEN cited_omid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_cited
    FROM joined
    """,
    doc="Citation OMID mapping ×2 + anti-join orphan report (SURVEY J8).",
)
def j8_citation_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    citations = li.select(
        F.concat(F.lit("order:"), F.col("l_orderkey").cast("string")).alias("citing_id"),
        F.concat(F.lit("part:"), F.col("l_partkey").cast("string")).alias("cited_id"),
    ).dropDuplicates()
    mc = orders.select(
        F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")).alias("citing_id"),
        F.concat(F.lit("br/"), F.col("o_orderkey").cast("string")).alias("citing_omid"),
    )
    md = part.filter(F.col("p_partkey") % 4 != 0).select(
        F.concat(F.lit("part:"), F.col("p_partkey").cast("string")).alias("cited_id"),
        F.concat(F.lit("br/p"), F.col("p_partkey").cast("string")).alias("cited_omid"),
    )
    joined = citations.join(mc, "citing_id", "left").join(md, "cited_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_citations"),
        F.sum(F.when(F.col("citing_omid").isNotNull() & F.col("cited_omid").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_resolved"),
        F.sum(F.when(F.col("citing_omid").isNull(), 1).otherwise(0)).cast("bigint").alias("n_orphan_citing"),
        F.sum(F.when(F.col("cited_omid").isNull(), 1).otherwise(0)).cast("bigint").alias("n_orphan_cited"),
    )


# ---------------------------------------------------------------------------
# J7 — publisher inheritance: value looked up on the entity AND its two
# ancestor containers, nearest wins (reference lib/finder.py:560-599).
# Analog chain: order → customer → nation with deliberately sparse
# order/customer-level values.
# ---------------------------------------------------------------------------
@register(
    "J7_publisher_inheritance",
    """
    SELECT o.o_orderkey AS orderkey,
           COALESCE(CASE WHEN o.o_orderkey % 3 = 0 THEN o.o_orderpriority END,
                    CASE WHEN c.c_custkey % 2 = 0 THEN c.c_mktsegment END,
                    n.n_name) AS inherited,
           CASE WHEN o.o_orderkey % 3 = 0 THEN 'self'
                WHEN c.c_custkey % 2 = 0 THEN 'parent'
                ELSE 'grandparent' END AS source_level
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderkey <= 2000
    ORDER BY orderkey
    """,
    doc="Nearest-ancestor attribute inheritance through the containment chain (SURVEY J7).",
)
def j7_publisher_inheritance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    self_v = F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority"))
    parent_v = F.when(F.col("c_custkey") % 2 == 0, F.col("c_mktsegment"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.coalesce(self_v, parent_v, F.col("n_name")).alias("inherited"),
            F.when(F.col("o_orderkey") % 3 == 0, "self")
            .when(F.col("c_custkey") % 2 == 0, "parent")
            .otherwise("grandparent")
            .alias("source_level"),
        )
        .orderBy("orderkey")
    )


# ---------------------------------------------------------------------------
# J9 — merge-related-entity discovery: all entities ≤1 hop from the merge
# targets, both edge directions (reference core/editor.py:195-242).
# ---------------------------------------------------------------------------
@register(
    "J9_merge_neighborhood",
    """
    WITH edges AS (
      SELECT a.c_custkey AS u, b.c_custkey AS v
      FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
      WHERE a.c_custkey % 10 <> 0
      UNION ALL
      SELECT a.c_custkey AS u, b.c_custkey AS v
      FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 5
      WHERE a.c_custkey % 20 = 3
    ),
    seeds AS (SELECT c_custkey AS seed FROM customer WHERE c_custkey % 97 = 0)
    SELECT DISTINCT s.seed AS seed, n.neighbor, n.direction FROM seeds s
    JOIN (
      SELECT u AS seed, v AS neighbor, 'out' AS direction FROM edges
      UNION ALL
      SELECT v AS seed, u AS neighbor, 'in' AS direction FROM edges
    ) n ON n.seed = s.seed
    ORDER BY seed, neighbor, direction
    """,
    doc="1-hop neighborhood in both directions from merge targets (SURVEY J9).",
)
def j9_merge_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.graph_queries import _edges

    cust = _t(spark, sf_dir, "customer")
    seeds = cust.filter(F.col("c_custkey") % 97 == 0).select(F.col("c_custkey").alias("seed"))
    e = _edges(spark, sf_dir)
    out = e.select(F.col("u").alias("seed"), F.col("v").alias("neighbor"), F.lit("out").alias("direction"))
    inc = e.select(F.col("v").alias("seed"), F.col("u").alias("neighbor"), F.lit("in").alias("direction"))
    return (
        F.broadcast(seeds)
        .join(out.unionByName(inc), "seed")
        .dropDuplicates()
        .orderBy("seed", "neighbor", "direction")
    )


# ---------------------------------------------------------------------------
# A3/A4 — structural counting + max-counter aggregation (reference
# run/count/triples.py, run/infodir/gen.py).
# ---------------------------------------------------------------------------
@register(
    "A3_table_counts",
    """
    SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'events', COUNT(*) FROM events
    ORDER BY tbl
    """,
    doc="Per-source structural counts (SURVEY A3).",
)
def a3_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl in ("lineitem", "orders", "customer", "events"):
        part = _t(spark, sf_dir, tbl).agg(F.count(F.lit(1)).alias("n")).select(F.lit(tbl).alias("tbl"), "n")
        out = part if out is None else out.unionByName(part)
    return out.orderBy("tbl")


@register(
    "A4_max_counter_per_kind",
    """
    SELECT event_type AS kind, MAX(event_id) AS max_counter, COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY kind
    """,
    doc="Max entity counter per kind — the counter-reconciliation aggregate (SURVEY A4/W4).",
)
def a4_max_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("kind"))
        .agg(F.max("event_id").alias("max_counter"), F.count(F.lit(1)).alias("n"))
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# SO1/SO2 — id-set union / intersection-then-union-or-replace semantics as
# array algebra (reference merge_registry.py:150-198, curator.py:1433-1446).
# ---------------------------------------------------------------------------
@register(
    "SO1_idset_algebra",
    """
    WITH pos AS (
      SELECT c_nationkey, list_sort(list(DISTINCT c_mktsegment)) AS a
      FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey
    ),
    neg AS (
      SELECT c_nationkey, list_sort(list(DISTINCT c_mktsegment)) AS b
      FROM customer WHERE c_acctbal <= 0 GROUP BY c_nationkey
    )
    SELECT p.c_nationkey AS nationkey,
           array_to_string(p.a, ',') AS set_a,
           COALESCE(array_to_string(n.b, ','), '') AS set_b,
           len(list_intersect(p.a, COALESCE(n.b, []))) AS n_intersect,
           array_to_string(list_sort(list_distinct(p.a || COALESCE(n.b, []))), ',') AS set_union,
           CASE WHEN len(list_intersect(p.a, COALESCE(n.b, []))) > 0
                THEN array_to_string(list_sort(list_distinct(p.a || COALESCE(n.b, []))), ',')
                ELSE COALESCE(array_to_string(n.b, ','), '') END AS merged_or_replaced
    FROM pos p LEFT JOIN neg n ON p.c_nationkey = n.c_nationkey
    ORDER BY nationkey
    """,
    doc="array_union / array_intersect id-set algebra incl. overlap-then-union-else-replace (SURVEY SO1/SO2).",
)
def so1_idset_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .groupBy("c_nationkey")
        .agg(F.array_sort(F.collect_set("c_mktsegment")).alias("a"))
    )
    neg = (
        cust.filter(F.col("c_acctbal") <= 0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.array_sort(F.collect_set("c_mktsegment")).alias("b"))
    )
    j = pos.join(neg, pos.c_nationkey == neg.nk, "left").withColumn(
        "b", F.coalesce("b", F.array().cast("array<string>"))
    )
    inter = F.array_intersect("a", "b")
    uni = F.array_sort(F.array_union("a", "b"))
    return j.select(
        F.col("c_nationkey").alias("nationkey"),
        F.array_join("a", ",").alias("set_a"),
        F.array_join("b", ",").alias("set_b"),
        F.size(inter).cast("bigint").alias("n_intersect"),
        F.array_join(uni, ",").alias("set_union"),
        F.when(F.size(inter) > 0, F.array_join(uni, ",")).otherwise(F.array_join("b", ",")).alias(
            "merged_or_replaced"
        ),
    ).orderBy("nationkey")


def _cur_meta(part: DataFrame) -> DataFrame:
    """Synthetic 11-column metadata batch derived from the part table
    (shared input of the CUR1 fresh and CUR2 update gates)."""
    return part.select(
        F.concat(F.lit("doi:10."), (4000 + F.col("p_partkey") % 100).cast("string"), F.lit("/p"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_name").alias("title"),
        F.concat(F.lit("Maker, "), F.col("p_brand")).alias("author"),
        F.lit("2024-01").alias("pub_date"),
        F.concat(F.col("p_type"), F.lit(" [issn:2049-3630]")).alias("venue"),
        (F.col("p_size") % 5 + 1).cast("string").alias("volume"),
        F.lit("").alias("issue"),
        F.lit("").alias("page"),
        F.lit("journal article").alias("type"),
        F.col("p_brand").alias("publisher"),
        F.lit("").alias("editor"),
    )


# ---------------------------------------------------------------------------
# CUR1 — the full curation pipeline end-to-end on synthesized metadata rows
# (rows-only check: the oracle cannot express the whole pipeline in one SQL
# statement; its component operators are oracle-checked individually as
# D1/D2/D3/D4/D5/C1-C10/W1/J1/J3 entries).
# ---------------------------------------------------------------------------
@register(
    "CUR1_curation_end_to_end",
    None,
    doc="Full curate(): parse→resolve→mint→hierarchy→agents→prov on synthetic metadata (SURVEY §3.1).",
)
def cur1_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch size scales with SF (whole part table: 2k rows at sf0.01,
    20k at sf0.1).  curate() pays a FIXED ~250-stage dispatch cost
    (~30 s on local[8]) regardless of rows — the marginal per-row cost is
    near zero, so the honest benchmark shape is a bulk batch, mirroring
    the reference's own rec/s framing (BASELINE.md: 51.4 rec/s fresh).
    Spark is a poor fit for 200-row micro-batches and that is a
    documented trade, not an accident; golden tests cover tiny batches."""
    from oc_meta_spark.plans.curation import curate
    from oc_meta_spark.schemas import META_INPUT_SCHEMA

    meta = _cur_meta(_t(spark, sf_dir, "part"))
    result = curate(meta)
    return result.curated.drop("row_id").orderBy("id")


# ---------------------------------------------------------------------------
# CUR2 — UPDATE-scenario curation (rows-only): BASELINE.md's second headline
# number is the reference's preloaded-store run (46.28 rec/s with 2700
# preexisting entities).  Here a tenth of the batch is curated first and its
# deltas become the catalog; the FULL batch is then curated against that
# store, so the timed run exercises every update path at once — explicit
# id hits, venue/volume/issue resolution against preexisting hierarchy,
# agent-chain reuse, equalizer field precedence, and silencer-free
# modification provenance.
# ---------------------------------------------------------------------------
@register(
    "CUR2_curation_update_scenario",
    None,
    doc="curate() against a preloaded catalog (10% preload, full-batch update) — the reference's update benchmark shape.",
)
def cur2_curation_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog = cur2_preload_catalog(spark, sf_dir)
    return cur2_update_only(spark, sf_dir, catalog)


def cur2_preload_catalog(spark: SparkSession, sf_dir: str):
    """Build + MATERIALIZE the preload catalog (the store that exists before
    the update batch arrives).  Split out so bench.py can time the update
    pass alone — the preload is store-construction cost, not update
    throughput, and folding it in understated CUR2 by ~2× (round-2 VERDICT
    item 6).  Materialization persists every table and forces it with a
    count, so the update pass reads settled in-memory tables exactly like a
    store loaded from parquet."""
    from oc_meta_spark.plans.curation import EntityCatalog, curate

    meta = _cur_meta(_t(spark, sf_dir, "part"))
    preload = meta.filter(F.col("id").rlike(r"/p\d*0$"))
    catalog = EntityCatalog.empty(spark).union(curate(preload))
    for tname in ("br", "ra", "id", "entity_id", "ar", "re", "prov", "counters"):
        t = getattr(catalog, tname)
        if t is not None:
            t.persist().count()
    return catalog


def cur2_update_only(spark: SparkSession, sf_dir: str, catalog) -> DataFrame:
    """The timed half of CUR2: curate the FULL batch against the preloaded
    store (explicit id hits, hierarchy resolution, agent-chain reuse,
    equalizer precedence, modification provenance)."""
    from oc_meta_spark.plans.curation import curate

    meta = _cur_meta(_t(spark, sf_dir, "part"))
    result = curate(meta, catalog)
    return result.curated.drop("row_id").orderBy("id")


# ---------------------------------------------------------------------------
# RT1 — inverse ETL round trip: curate a small batch, export the catalog to
# JSON-LD rows, re-import them through the RDF→CSV dump (rows-only: the
# full pipeline is not one SQL statement; its components are gated above).
# RT2 projects the same trip to DuckDB-checkable fixpoint invariants.
# ---------------------------------------------------------------------------
def _rt_meta(part: DataFrame, constant_venue: bool) -> DataFrame:
    """The round-trip input batch synthesized from part (p_partkey ≤ 50).

    ``constant_venue=False`` (RT1) keeps each row's own p_type as the venue
    display name — exercising the dump's canonical-name resolution, which
    makes the venue column deliberately NOT a fixpoint.  ``True`` (RT2)
    pins one display name so every column round-trips exactly; RT2 also
    plants a shared ORCID on every 5th author so external-id ordering
    across the trip (curator appends the omid, the dump leads with it) is
    exercised under the canonicalized comparison."""
    venue = (
        F.lit("Reference Venue [issn:2049-3630]")
        if constant_venue
        else F.concat(F.col("p_type"), F.lit(" [issn:2049-3630]"))
    )
    author = F.concat(F.lit("Maker, "), F.col("p_brand"))
    if constant_venue:
        # two-entry chains: the dump must rebuild the hasNext order, and
        # check_export_consistency's entry-order-significant comparison
        # (round-6) verifies it survives the trip
        author = F.concat(
            author,
            F.when(F.col("p_partkey") % 5 == 0, F.lit(" [orcid:0000-0001-5109-3700]")).otherwise(
                F.lit("")
            ),
            F.lit("; Helper, H"),
            (F.col("p_partkey") % 7).cast("string"),
        )
    tag = "rt2" if constant_venue else "rt"
    return part.filter(F.col("p_partkey") <= 50).select(
        F.col("p_partkey").alias("row_id"),
        F.concat(F.lit("doi:10."), (4000 + F.col("p_partkey") % 100).cast("string"), F.lit(f"/{tag}"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_name").alias("title"),
        author.alias("author"),
        F.lit("2024-01").alias("pub_date"),
        venue.alias("venue"),
        (F.col("p_size") % 5 + 1).cast("string").alias("volume"),
        F.lit("").alias("issue"),
        F.lit("").alias("page"),
        F.lit("journal article").alias("type"),
        F.col("p_brand").alias("publisher"),
        F.lit("").alias("editor"),
    )


def _rt_trip(spark: SparkSession, sf_dir: str, constant_venue: bool):
    """curate → JSON-LD export → parse → CSV dump; returns (curated, dumped)."""
    from oc_meta_spark.plans.curation import EntityCatalog, curate
    from oc_meta_spark.plans.generate_csv import dump_csv, parse_jsonld
    from oc_meta_spark.sources.export import entity_jsonld_rows

    meta = _rt_meta(_t(spark, sf_dir, "part"), constant_venue)
    result = curate(meta)
    catalog = EntityCatalog.empty(spark).union(result)
    jsonld = entity_jsonld_rows(catalog).select("jsonld")
    return result.curated, dump_csv(parse_jsonld(jsonld))


@register(
    "RT1_rdf_csv_round_trip",
    None,
    doc="curate → JSON-LD export → generate_csv dump; returns the dumped 11-column rows (S9/S11 inverse ETL).",
)
def rt1_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, dumped = _rt_trip(spark, sf_dir, constant_venue=False)
    return dumped.orderBy("id")


# ---------------------------------------------------------------------------
# RT2 — the round-trip FIXPOINT oracle (round-6: the RT1 partial oracle,
# CUR3/CUR4 invariant-projection technique).  The trip's output cannot
# hash-match a SQL recompute (minted omids), but its fixpoint structure is
# derivable from the raw part table: every curated article row must come
# back from the export→import trip with identical cell content (compared
# under check_export_consistency's bracket-token canonicalization), the
# only extra dumped row is the ONE venue journal entity (the dump emits
# Journal BRs as rows and skips JournalVolume/JournalIssue — reference
# run/meta/generate_csv.py:383-390), and nothing goes missing or
# malformed.  A lossy export, a mis-parsed JSON-LD field, a broken chain
# reconstruction, or a dropped entity each break a distinct counter.
# ---------------------------------------------------------------------------
@register(
    "RT2_round_trip_fixpoint",
    """
    WITH s AS (
      SELECT COUNT(DISTINCT p_partkey) AS n FROM part WHERE p_partkey <= 50
    )
    SELECT metric, CAST(n AS BIGINT) AS n FROM (
      SELECT 'rows_curated' AS metric, n FROM s
      UNION ALL SELECT 'rows_dumped', n + 1 FROM s
      UNION ALL SELECT 'extra_in_export', 1
      UNION ALL SELECT 'missing_in_export', 0
      UNION ALL SELECT 'value_mismatch', 0
      UNION ALL SELECT 'malformed_id_in_curated', 0
      UNION ALL SELECT 'malformed_id_in_export', 0
    ) ORDER BY metric
    """,
    doc="Round-trip fixpoint invariants: per-kind row counts + zero cross-trip discrepancies — the RT1 partial oracle.",
)
def rt2_round_trip_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.check_results import check_export_consistency

    curated, dumped = _rt_trip(spark, sf_dir, constant_venue=True)
    # The fixpoint projection references `curated` twice (row count +
    # consistency scan) and `dumped` three times (row count + both sides
    # of the discrepancy join) — left lazy, every reference re-ran the
    # whole export→parse→dump chain over the catalog (r13 measurement:
    # the gate collected in ~237 s at sf0.001 while one trip builds in
    # ~44 s).  Cut the chain ONCE per side; value-neutral, inside this
    # single gate's execution (guide §5 / §3.3 — materialize an
    # intermediate a huge plan references repeatedly).
    curated = curated.localCheckpoint()
    dumped = dumped.localCheckpoint()
    disc = check_export_consistency(curated, dumped)
    kinds = (
        "extra_in_export",
        "missing_in_export",
        "value_mismatch",
        "malformed_id_in_curated",
        "malformed_id_in_export",
    )
    base = (
        curated.agg(F.count(F.lit(1)).cast("long").alias("rows_curated"))
        .crossJoin(dumped.agg(F.count(F.lit(1)).cast("long").alias("rows_dumped")))
        .crossJoin(
            disc.agg(
                *[F.count(F.when(F.col("kind") == k, 1)).cast("long").alias(k) for k in kinds]
            )
        )
    )
    stack = ", ".join(f"'{m}', {m}" for m in ("rows_curated", "rows_dumped", *kinds))
    return (
        base.selectExpr(f"stack(7, {stack}) AS (metric, n)")
        .select("metric", F.col("n").cast("long").alias("n"))
        .orderBy("metric")
    )


# ---------------------------------------------------------------------------
# RT3 — the VALUE oracle for RT1's deliberately-non-fixpoint path (round-7:
# the last unoracled value path in the inverse ETL).  With
# constant_venue=False every row mentions the shared ISSN venue under its
# own display name (its p_type), so the batch's mentions merge into ONE
# venue entity whose stored title is the canonical name: clean_title of
# the name from the mention with the smallest row_id (curation.py
# new-venue pick — min(struct(first_row, name, type)) — mirroring the
# reference curator's first-occurrence name, curator.py; the dump then
# shows that stored title for every article, reference
# run/meta/generate_csv.py:299-356).  The gate runs the real trip and
# projects (doi, dumped venue display name); the oracle re-derives the
# canonical name from part.p_type: the testdata's p_type is all-caps, so
# clean_title lowers it then title-cases word-wise (cleaner.py:162-180).
# ---------------------------------------------------------------------------
@register(
    "RT3_round_trip_venue_name",
    """
    WITH b AS (SELECT p_partkey, p_type FROM part WHERE p_partkey <= 50),
    canon AS (
      SELECT array_to_string(
               list_transform(string_split(lower(p_type), ' '),
                 w -> upper(substr(w, 1, 1)) || substr(w, 2)),
               ' ') AS vname
      FROM b ORDER BY p_partkey LIMIT 1
    )
    SELECT 'doi:10.' || CAST(4000 + p_partkey % 100 AS VARCHAR)
             || '/rt' || CAST(p_partkey AS VARCHAR) AS doi,
           (SELECT vname FROM canon) AS venue_name
    FROM b ORDER BY doi
    """,
    doc="RT1 varying-venue value oracle: dumped venue display name = canonical first-mention clean_title(p_type) for every article (S9/S11).",
)
def rt3_round_trip_venue_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, dumped = _rt_trip(spark, sf_dir, constant_venue=False)
    return (
        dumped.filter(F.col("id").rlike("doi:"))
        .select(
            F.regexp_extract("id", r"(doi:[^\s]+)", 1).alias("doi"),
            F.regexp_extract("venue", r"^(.*?)\s*\[", 1).alias("venue_name"),
        )
        .orderBy("doi")
    )


# ---------------------------------------------------------------------------
# VR1 — post-run verification report: the 16-counter check_results rollup
# over a curated batch and its catalog (rows-only; the aggregation shapes
# are oracle-gated generically as A1-A8/J10/J11).
# ---------------------------------------------------------------------------
@register(
    "VR1_check_results_report",
    None,
    doc="check_results counters: id/omid existence, mismatches, data+prov graph probes (A6 domain form).",
)
def vr1_check_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.check_results import check_results
    from oc_meta_spark.plans.curation import EntityCatalog, curate

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    meta = part.select(
        F.col("p_partkey").alias("row_id"),
        F.concat(F.lit("doi:10."), (4000 + F.col("p_partkey") % 100).cast("string"), F.lit("/vr"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_name").alias("title"),
        F.concat(F.lit("Maker, "), F.col("p_brand")).alias("author"),
        F.lit("2024-01").alias("pub_date"),
        F.lit("").alias("venue"),
        F.lit("").alias("volume"),
        F.lit("").alias("issue"),
        F.lit("").alias("page"),
        F.lit("journal article").alias("type"),
        F.lit("").alias("publisher"),
        F.lit("").alias("editor"),
    )
    result = curate(meta)
    catalog = EntityCatalog.empty(spark).union(result)
    return check_results(result.curated, catalog).counters


# ---------------------------------------------------------------------------
# VR2 — the check_results COUNTER oracle (round-6: the VR1 partial oracle,
# MA1's planted-violation pattern).  check_results runs over an
# EntityCatalog the DuckDB oracle cannot build, so this gate synthesizes
# a curated frame + store FROM the customer table with one violation
# family per residue class mod 20 (k = c_custkey < 500; all arithmetic
# shared by both engines), drives the REAL kernel, and re-derives the
# 15-counter FileResult vector independently in SQL (reference
# run/meta/check_results.py:46-85 counter semantics):
#
# - every row: "doi:10.1/vr<k> omid:br/<k>" with the store linking the
#   doi to br/<k> and one creation snapshot per br;
# - k≡2:  extra unverifiable-schema token  → identifiers_skipped_unverifiable
# - k≡3:  extra pmid absent from the store → identifiers_without_omids
# - k≡5:  extra ISSN with a bad check digit → identifiers_skipped_invalid
# - k≡7:  store links the doi to br/<k+1000> → identifiers_with_omid_mismatch,
#         and br/<k+1000> has no provenance → omids_without_provenance
# - k≡11: csv omid token is br/<k+2000> (absent) → data_graphs_missing +
#         prov_graphs_missing, and the doi probe disagrees → mismatch
# - k≡13: br/<k> has no provenance snapshot → prov_graphs_missing +
#         omids_without_provenance
# ---------------------------------------------------------------------------
@register(
    "VR2_check_results_planted",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 500),
    s AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE k % 20 = 2) AS c2,
             COUNT(*) FILTER (WHERE k % 20 = 3) AS c3,
             COUNT(*) FILTER (WHERE k % 20 = 5) AS c5,
             COUNT(*) FILTER (WHERE k % 20 = 7) AS c7,
             COUNT(*) FILTER (WHERE k % 20 = 11) AS c11,
             COUNT(*) FILTER (WHERE k % 20 = 13) AS c13
      FROM ks
    )
    SELECT CAST(n AS BIGINT) AS total_rows,
           CAST(n AS BIGINT) AS rows_with_ids,
           CAST(2 * n + c2 + c3 + c5 AS BIGINT) AS total_identifiers,
           CAST(n AS BIGINT) AS omid_schema_identifiers,
           CAST(c5 AS BIGINT) AS identifiers_skipped_invalid,
           CAST(c2 AS BIGINT) AS identifiers_skipped_unverifiable,
           CAST(n - c7 - c11 AS BIGINT) AS identifiers_with_omids,
           CAST(c3 AS BIGINT) AS identifiers_without_omids,
           CAST(c7 + c11 AS BIGINT) AS identifiers_with_omid_mismatch,
           CAST(n - c11 AS BIGINT) AS data_graphs_found,
           CAST(c11 AS BIGINT) AS data_graphs_missing,
           CAST(n - c11 - c13 AS BIGINT) AS prov_graphs_found,
           CAST(c11 + c13 AS BIGINT) AS prov_graphs_missing,
           CAST(n - c7 - c13 AS BIGINT) AS omids_with_provenance,
           CAST(c7 + c13 AS BIGINT) AS omids_without_provenance
    FROM s
    """,
    doc="check_results FileResult counters over a synthesized store with one planted violation per residue class — the VR1 partial oracle.",
)
def vr2_check_results_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.check_results import check_results
    from oc_meta_spark.plans.curation import EntityCatalog
    from oc_meta_spark.schemas import ENTITY_TABLES

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500).select(
        F.col("c_custkey").alias("k"), (F.col("c_custkey") % 20).alias("r")
    )
    _br = lambda col: F.concat(F.lit("br/"), col.cast("string"))
    claimed = F.when(F.col("r") == 11, _br(F.col("k") + 2000)).otherwise(_br(F.col("k")))
    extra = (
        F.when(F.col("r") == 2, F.concat(F.lit(" zzz:x"), F.col("k").cast("string")))
        .when(F.col("r") == 3, F.concat(F.lit(" pmid:77"), F.col("k").cast("string")))
        .when(F.col("r") == 5, F.lit(" issn:0000-0002"))
        .otherwise(F.lit(""))
    )
    curated = ks.select(
        F.col("k").alias("row_id"),
        F.concat(
            F.lit("doi:10.1/vr"), F.col("k").cast("string"), F.lit(" omid:"), claimed, extra
        ).alias("id"),
        F.lit("").alias("author"),
        F.lit("").alias("editor"),
        F.lit("").alias("publisher"),
        F.lit("").alias("venue"),
    )
    br = (
        ks.select(_br(F.col("k")).alias("omid"))
        .unionByName(ks.filter(F.col("r") == 7).select(_br(F.col("k") + 1000).alias("omid")))
        .select(
            "omid",
            F.lit("journal article").alias("type"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("pub_date"),
            F.lit(None).cast("string").alias("seq_id"),
            F.lit(None).cast("string").alias("part_of"),
            F.lit(None).cast("string").alias("embodiment"),
        )
    )
    id_tbl = ks.select(
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("omid"),
        F.lit("doi").alias("schema"),
        F.concat(F.lit("10.1/vr"), F.col("k").cast("string")).alias("value"),
    )
    entity_id = ks.select(
        F.when(F.col("r") == 7, _br(F.col("k") + 1000)).otherwise(_br(F.col("k"))).alias("entity_omid"),
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("id_omid"),
    )
    prov = ks.filter(F.col("r") != 13).select(
        _br(F.col("k")).alias("entity_omid"),
        F.lit(1).alias("snapshot"),
        F.lit("2024-01-01T00:00:00").alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array(F.lit("x")).cast("array<string>").alias("derived_from"),
        F.lit(None).cast("string").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    empty = lambda name: spark.createDataFrame([], ENTITY_TABLES[name])
    catalog = EntityCatalog(
        br=br,
        ra=empty("ra"),
        id=id_tbl,
        entity_id=entity_id,
        ar=empty("ar"),
        re=empty("re"),
        prov=prov,
    )
    return check_results(curated, catalog).counters


# ---------------------------------------------------------------------------
# CUR3 / CUR4 — mint-independent curation invariants (round-5: the partial
# oracle for the CUR1/CUR2 whole-pipeline gates, VERDICT r4 prescription #4).
#
# curate()'s minted omids depend on counter state, so the raw output cannot
# hash-match a SQL recompute — but its STRUCTURE is a pure function of the
# input batch, and the reference's own indexer treats it that way
# (core/curator.py:1045-1101: per-kind entity counts and id→entity index
# rows are what the curated CSV + index files must agree on).  Both gates
# project the real curate() result to a tall (metric, key, n) table and the
# DuckDB oracle re-derives every row from the raw `part` table with the
# same synthesis expressions:
#
# - entities: per-kind/per-type entity counts — one article per DISTINCT
#   doi (in-batch dedup), one venue per distinct issn, one volume per
#   distinct (issn, volume), one author + one publisher RA per article
#   (agents without external ids never dedup across rows —
#   curator.py id-less agent semantics), one creation snapshot per entity;
# - id_links: multiset of (schema → #entities linked per distinct value):
#   every distinct id value must link exactly one entity after dedup;
# - curated: row count, per-row omid-reference counts by column, and
#   equality classes of embedded omids (all rows share ONE venue omid;
#   author omids are all distinct — the id-less agent rule again).
# ---------------------------------------------------------------------------
_CUR_INV_SQL_FRESH = """
    WITH m AS (
      SELECT 'doi:10.' || CAST(4000 + p_partkey % 100 AS VARCHAR)
               || '/p' || CAST(p_partkey AS VARCHAR) AS doi,
             CAST(p_size % 5 + 1 AS VARCHAR) AS volume,
             p_partkey % 10 = 0 AS preloaded
      FROM part
    ),
    s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT doi) AS n_doi,
             COUNT(DISTINCT volume) AS n_vol,
             COUNT(DISTINCT doi) FILTER (WHERE preloaded) AS n_pre
      FROM m
    )
"""


@register(
    "CUR3_curation_invariants",
    _CUR_INV_SQL_FRESH
    + """
    SELECT metric, key, CAST(n AS BIGINT) AS n FROM (
      SELECT 'entities' AS metric, 'br:journal article' AS key, n_doi AS n FROM s
      UNION ALL SELECT 'entities', 'br:journal', 1 FROM s
      UNION ALL SELECT 'entities', 'br:journal volume', n_vol FROM s
      UNION ALL SELECT 'entities', 'ra', 2 * n_doi FROM s
      UNION ALL SELECT 'entities', 'id', n_doi + 1 FROM s
      UNION ALL SELECT 'entities', 'ar:author', n_doi FROM s
      UNION ALL SELECT 'entities', 'ar:publisher', n_doi FROM s
      UNION ALL SELECT 'entities', 're', 0 FROM s
      -- one creation snapshot per entity: br (n_doi+1+n_vol) + ra (2n) +
      -- id (n+1) + ar (2n) + re (0)
      UNION ALL SELECT 'entities', 'prov', 6 * n_doi + n_vol + 2 FROM s
      UNION ALL SELECT 'id_links', 'doi:1', n_doi FROM s
      UNION ALL SELECT 'id_links', 'issn:1', 1 FROM s
      UNION ALL SELECT 'curated', 'rows', n_rows FROM s
      UNION ALL SELECT 'curated', 'venue_omids_distinct', 1 FROM s
      UNION ALL SELECT 'curated', 'author_omids_distinct', n_doi FROM s
      UNION ALL SELECT 'curated', 'rows_author_ref_1', n_rows FROM s
      UNION ALL SELECT 'curated', 'rows_publisher_ref_1', n_rows FROM s
      UNION ALL SELECT 'curated', 'rows_editor_ref_0', n_rows FROM s
    ) ORDER BY metric, key
    """,
    doc="Mint-independent invariant projection of the full fresh curate() run — the CUR1 partial oracle.",
)
def cur3_curation_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.curation import curate

    meta = _cur_meta(_t(spark, sf_dir, "part"))
    res = curate(meta)
    return _invariant_projection(
        spark,
        curated=res.curated,
        br=res.br_new,
        ra=res.ra_new,
        id_tbl=res.id_new,
        entity_id=res.entity_id_new,
        ar=res.ar_new,
        re_tbl=res.re_new,
        prov=res.prov_new,
    )


@register(
    "CUR4_curation_update_invariants",
    _CUR_INV_SQL_FRESH
    + """
    SELECT metric, key, CAST(n AS BIGINT) AS n FROM (
      -- deltas of the update pass: only non-preloaded articles mint; the
      -- preloaded rows resolve against the store and reuse their chains
      SELECT 'entities' AS metric, 'br:journal article' AS key,
             n_doi - n_pre AS n FROM s
      UNION ALL SELECT 'entities', 'ra', 2 * (n_doi - n_pre) FROM s
      UNION ALL SELECT 'entities', 'id', n_doi - n_pre FROM s
      UNION ALL SELECT 'entities', 'ar:author', n_doi - n_pre FROM s
      UNION ALL SELECT 'entities', 'ar:publisher', n_doi - n_pre FROM s
      UNION ALL SELECT 'entities', 're', 0 FROM s
      -- no venue/volume deltas (resolved against the preload) and no
      -- modification snapshots (identical data): 6 creation snapshots
      -- per new article
      UNION ALL SELECT 'entities', 'prov', 6 * (n_doi - n_pre) FROM s
      UNION ALL SELECT 'id_links', 'doi:1', n_doi - n_pre FROM s
      UNION ALL SELECT 'curated', 'rows', n_rows FROM s
      -- hierarchy resolution: every curated row points at the ONE venue
      -- entity minted during the preload
      UNION ALL SELECT 'curated', 'venue_omids_distinct', 1 FROM s
      UNION ALL SELECT 'curated', 'author_omids_distinct', n_doi FROM s
      UNION ALL SELECT 'curated', 'rows_author_ref_1', n_rows FROM s
      UNION ALL SELECT 'curated', 'rows_publisher_ref_1', n_rows FROM s
      UNION ALL SELECT 'curated', 'rows_editor_ref_0', n_rows FROM s
    ) ORDER BY metric, key
    """,
    doc="Mint-independent invariant projection of the update-scenario curate() deltas — the CUR2 partial oracle.",
)
def cur4_curation_update_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.curation import curate

    catalog = cur2_preload_catalog(spark, sf_dir)
    meta = _cur_meta(_t(spark, sf_dir, "part"))
    res = curate(meta, catalog)
    out = _invariant_projection(
        spark,
        curated=res.curated,
        br=res.br_new,
        ra=res.ra_new,
        id_tbl=res.id_new,
        entity_id=res.entity_id_new,
        ar=res.ar_new,
        re_tbl=res.re_new,
        prov=res.prov_new,
        skip_entity_kinds=("br:journal", "br:journal volume"),
        skip_issn_links=True,
    )
    # materialize the (tiny) invariant projection BEFORE unpersisting the
    # preload catalog it reads through — otherwise the caller's collect
    # recomputes the whole preload lineage the materialization exists to
    # settle (round-6 ADVICE)
    out = out.localCheckpoint(eager=True)
    for tname in ("br", "ra", "id", "entity_id", "ar", "re", "prov", "counters"):
        t = getattr(catalog, tname)
        if t is not None:
            t.unpersist()
    return out


def _invariant_projection(
    spark: SparkSession,
    *,
    curated: DataFrame,
    br: DataFrame,
    ra: DataFrame,
    id_tbl: DataFrame,
    entity_id: DataFrame,
    ar: DataFrame,
    re_tbl: DataFrame,
    prov: DataFrame,
    skip_entity_kinds: tuple = (),
    skip_issn_links: bool = False,
) -> DataFrame:
    """Project curation outputs to the tall (metric, key, n) invariant
    table (see the CUR3/CUR4 block comment).  Every aggregation is a tiny
    JVM-side groupBy over frames curate() already computed."""
    parts = []
    parts.append(
        br.groupBy("type").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("entities").alias("metric"),
            F.concat(F.lit("br:"), F.col("type")).alias("key"),
            F.col("n").cast("long").alias("n"),
        )
    )
    for key, df in (("ra", ra), ("id", id_tbl), ("re", re_tbl), ("prov", prov)):
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("entities").alias("metric"),
                F.lit(key).alias("key"),
                F.col("n").cast("long").alias("n"),
            )
        )
    parts.append(
        ar.groupBy("role").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("entities").alias("metric"),
            F.concat(F.lit("ar:"), F.col("role")).alias("key"),
            F.col("n").cast("long").alias("n"),
        )
    )
    # id-link multiset: distinct (schema, value) → #linked entities
    links = (
        entity_id.join(id_tbl.withColumnRenamed("omid", "id_omid"), "id_omid")
        .groupBy("schema", "value")
        .agg(F.countDistinct("entity_omid").alias("k"))
        .groupBy("schema", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("id_links").alias("metric"),
            F.concat(F.col("schema"), F.lit(":"), F.col("k").cast("string")).alias("key"),
            F.col("n").cast("long").alias("n"),
        )
    )
    if skip_issn_links:
        links = links.filter(~F.col("key").startswith("issn:"))
    parts.append(links)
    # curated projections: omid-reference counts per column + equality classes
    c = curated.select(
        F.regexp_count(F.col("author"), F.lit(r"omid:ra/")).alias("a_refs"),
        F.regexp_count(F.col("publisher"), F.lit(r"omid:ra/")).alias("p_refs"),
        F.regexp_count(F.col("editor"), F.lit(r"omid:ra/")).alias("e_refs"),
        # [^\]\s] not \S: the omid is usually the LAST token inside the
        # bracket block, and \S+ would swallow the closing "]" (round-6
        # ADVICE — distinct-counts held anyway, but the extracted value
        # must be a clean omid if ever joined against catalog tables)
        F.regexp_extract(F.col("venue"), r"omid:(br/[^\]\s]+)", 1).alias("v_omid"),
        F.regexp_extract(F.col("author"), r"omid:(ra/[^\]\s]+)", 1).alias("a_omid"),
    )
    parts.append(
        c.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("v_omid").alias("venue_omids_distinct"),
            F.countDistinct("a_omid").alias("author_omids_distinct"),
            F.count(F.when(F.col("a_refs") == 1, 1)).alias("rows_author_ref_1"),
            F.count(F.when(F.col("p_refs") == 1, 1)).alias("rows_publisher_ref_1"),
            F.count(F.when(F.col("e_refs") == 0, 1)).alias("rows_editor_ref_0"),
        ).selectExpr(
            "stack(6, 'rows', rows, 'venue_omids_distinct', venue_omids_distinct, "
            "'author_omids_distinct', author_omids_distinct, "
            "'rows_author_ref_1', rows_author_ref_1, "
            "'rows_publisher_ref_1', rows_publisher_ref_1, "
            "'rows_editor_ref_0', rows_editor_ref_0) AS (key, n)"
        ).select(
            F.lit("curated").alias("metric"),
            F.col("key"),
            F.col("n").cast("long").alias("n"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if skip_entity_kinds:
        out = out.filter(
            ~((F.col("metric") == "entities") & F.col("key").isin(*skip_entity_kinds))
        )
    return out.orderBy("metric", "key")


# ---------------------------------------------------------------------------
# VD2 — the export-verification kernel oracle (round-6).  The offline
# export-vs-CSV check (plans/check_results.py::check_export_consistency —
# the run/meta/check_rdf_files.py analog) was pytest-only; this gate
# synthesizes a curated frame and a corrupted "dump" of it FROM the
# customer table with one discrepancy family per residue class mod 16,
# drives the REAL kernel, and re-derives the per-kind discrepancy counts
# in SQL from the same modular predicates:
#
# - k≡1:  row dropped from the dump            → missing_in_export
# - k≡2:  row only in the dump (omid br/<k+5000>) → extra_in_export
# - k≡3:  title corrupted in the dump          → value_mismatch:title
# - k≡4:  the two author entries swapped       → value_mismatch:author
#         (entry ORDER is significant — the hasNext discipline)
# - k≡5:  author ids shuffled INSIDE the bracket → no flag (per-bracket
#         canonicalization accepts both legitimate serializations)
# - k≡6:  dump id cell lost its omid token     → malformed_id_in_export,
#         and the curated partner goes unmatched → missing_in_export too
# ---------------------------------------------------------------------------
@register(
    "VD2_export_check_planted",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 400),
    s AS (
      SELECT COUNT(*) FILTER (WHERE k % 16 = 1) AS c1,
             COUNT(*) FILTER (WHERE k % 16 = 2) AS c2,
             COUNT(*) FILTER (WHERE k % 16 = 3) AS c3,
             COUNT(*) FILTER (WHERE k % 16 = 4) AS c4,
             COUNT(*) FILTER (WHERE k % 16 = 6) AS c6
      FROM ks
    )
    SELECT kind, col, CAST(n AS BIGINT) AS n FROM (
      SELECT 'missing_in_export' AS kind, '' AS col, c1 + c6 AS n FROM s
      UNION ALL SELECT 'extra_in_export', '', c2 FROM s
      UNION ALL SELECT 'malformed_id_in_export', '', c6 FROM s
      UNION ALL SELECT 'value_mismatch', 'title', c3 FROM s
      UNION ALL SELECT 'value_mismatch', 'author', c4 FROM s
    ) ORDER BY kind, col
    """,
    doc="check_export_consistency discrepancy counts over a dump with one planted corruption family per residue class.",
)
def vd2_export_check_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.check_results import check_export_consistency

    ks = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400).select(
        F.col("c_custkey").alias("k"), (F.col("c_custkey") % 16).alias("r")
    )
    kstr = F.col("k").cast("string")
    author_fwd = F.concat(
        F.lit("First, F"), kstr,
        F.lit(" [orcid:0000-0002-1825-0097 omid:ra/"), kstr, F.lit("a]; Second, S"), kstr,
        F.lit(" [omid:ra/"), kstr, F.lit("b]"),
    )
    curated = ks.select(
        F.concat(F.lit("doi:10.2/ec"), kstr, F.lit(" omid:br/"), kstr).alias("id"),
        F.concat(F.lit("Title "), kstr).alias("title"),
        author_fwd.alias("author"),
    )
    author_swapped = F.concat(
        F.lit("Second, S"), kstr, F.lit(" [omid:ra/"), kstr, F.lit("b]; "),
        F.lit("First, F"), kstr,
        F.lit(" [orcid:0000-0002-1825-0097 omid:ra/"), kstr, F.lit("a]"),
    )
    author_shuffled_ids = F.concat(
        F.lit("First, F"), kstr,
        F.lit(" [omid:ra/"), kstr, F.lit("a orcid:0000-0002-1825-0097]; Second, S"), kstr,
        F.lit(" [omid:ra/"), kstr, F.lit("b]"),
    )
    dumped = (
        ks.filter(F.col("r") != 1)  # k≡1 dropped from the dump
        .select(
            F.when(F.col("r") == 6, F.concat(F.lit("doi:10.2/ec"), kstr))  # omid lost
            .otherwise(F.concat(F.lit("omid:br/"), kstr, F.lit(" doi:10.2/ec"), kstr))
            .alias("id"),
            F.when(F.col("r") == 3, F.concat(F.lit("Corrupted "), kstr))
            .otherwise(F.concat(F.lit("Title "), kstr))
            .alias("title"),
            F.when(F.col("r") == 4, author_swapped)
            .when(F.col("r") == 5, author_shuffled_ids)
            .otherwise(author_fwd)
            .alias("author"),
        )
        .unionByName(
            ks.filter(F.col("r") == 2).select(  # rows only the dump has
                F.concat(F.lit("omid:br/"), (F.col("k") + 5000).cast("string")).alias("id"),
                F.lit("Phantom").alias("title"),
                F.lit("").alias("author"),
            )
        )
    )
    return (
        check_export_consistency(curated, dumped)
        .groupBy(
            F.col("kind"), F.coalesce(F.col("column"), F.lit("")).alias("col")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("kind", "col")
    )


# ---------------------------------------------------------------------------
# EQ1 — the equalizer VALUE oracle (D5; reference core/curator.py
# equalizer / indexer precedence).  CUR4 checks the update scenario's
# STRUCTURE (entity counts, link multisets); this gate checks the field
# VALUES the equalizer writes: a catalog preloaded with every 10th
# article under DIFFERENT title/pub_date/author must win those fields in
# the curated output, with the batch's agent APPENDED to the catalog
# chain — all mint-independent once omid brackets are stripped, so the
# DuckDB oracle re-derives every curated row from the part table.
# ---------------------------------------------------------------------------
@register(
    "EQ1_equalizer_field_precedence",
    """
    WITH t AS (
      SELECT *,
             -- clean_title on the all-lowercase p_name: every word
             -- title-cased (reference lib/cleaner.py:162-180; the C3 gate
             -- oracles the full acronym-preserving kernel)
             array_to_string(
               list_transform(string_split(p_name, ' '),
                              w -> upper(w[1:1]) || w[2:]), ' ') AS cleaned
      FROM part
    )
    SELECT 'doi:10.' || CAST(4000 + p_partkey % 100 AS VARCHAR)
             || '/p' || CAST(p_partkey AS VARCHAR) AS doi,
           CASE WHEN p_partkey % 10 = 0 THEN 'Cat ' || cleaned ELSE cleaned END AS title,
           CASE WHEN p_partkey % 10 = 0 THEN '2023-12' ELSE '2024-01' END AS pub_date,
           CAST(p_size % 5 + 1 AS VARCHAR) AS volume,
           CASE WHEN p_partkey % 10 = 0
                THEN 'Curator, Cat; Maker, ' || p_brand
                ELSE 'Maker, ' || p_brand END AS authors
    FROM t ORDER BY doi
    """,
    doc="Equalizer catalog-precedence VALUES: preloaded fields win, batch agents append to the chain (SURVEY D5).",
)
def eq1_equalizer_field_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.curation import EntityCatalog, curate

    part = _t(spark, sf_dir, "part")
    meta = _cur_meta(part)
    preload_meta = _cur_meta(part.filter(F.col("p_partkey") % 10 == 0)).select(
        "id",
        F.concat(F.lit("Cat "), F.col("title")).alias("title"),
        F.lit("Curator, Cat").alias("author"),
        F.lit("2023-12").alias("pub_date"),
        "venue", "volume", "issue", "page", "type", "publisher", "editor",
    )
    catalog = EntityCatalog.empty(spark).union(curate(preload_meta))
    curated = curate(meta, catalog).curated
    strip_ids = lambda c: F.regexp_replace(c, r"\s*\[[^\]]*\]", "")
    return curated.select(
        F.split(F.col("id"), r"\s+").getItem(0).alias("doi"),
        F.col("title"),
        F.col("pub_date"),
        F.col("volume"),
        strip_ids(F.col("author")).alias("authors"),
    ).orderBy("doi")
