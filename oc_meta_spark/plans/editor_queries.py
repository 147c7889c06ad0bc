"""Oracle gates for the editor and patch-tool surfaces (reference
core/editor.py and run/patches) — the operators themselves act on an
EntityCatalog, so each gate SYNTHESIZES catalog tables deterministically
from the parquet tables and runs the PRODUCTION function, while the DuckDB
oracle re-expresses the documented semantics in SQL.

- ED1 — batched property update (MetaEditor.update_property): columnar
  rewrite of the owning table + one numbered modification snapshot per
  touched entity.
- PV1 — provenance se/1 backfill (run/patches/add_missing_provenance.py):
  entities with no chain, or a chain starting past snapshot 1, get a
  creation snapshot.
- PT1 — duplicate-partOf resolution (run/patches/fix_duplicate_part_of.py):
  containers walk to their terminal venue; same venue → keep the most
  specific (issue > volume > other), different venues → manual review.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.schemas import ENTITY_TABLES
from oc_meta_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _empty(spark: SparkSession, name: str) -> DataFrame:
    return spark.createDataFrame([], ENTITY_TABLES[name])


def _catalog_of(spark: SparkSession, **tables: DataFrame):
    from oc_meta_spark.plans.curation import EntityCatalog

    kwargs = {
        k: tables.get(k, _empty(spark, k if k != "entity_id" else "entity_id"))
        for k in ("br", "ra", "id", "entity_id", "ar", "re", "prov")
    }
    kwargs["counters"] = None
    return EntityCatalog(**kwargs)


# ---------------------------------------------------------------------------
# ED1 — update_property: ra.name rewritten for every seventh agent, with a
# modification snapshot numbered after the entity's current max (here: the
# synthesized chain gives agents with custkey%3==0 an existing snapshot 2).
# ---------------------------------------------------------------------------
@register(
    "ED1_editor_update_property",
    """
    WITH ra AS (
      SELECT 'ra/' || CAST(c_custkey AS VARCHAR) AS omid, c_name AS name, c_custkey AS key
      FROM customer WHERE c_custkey <= 700
    ),
    prov AS (   -- creation snapshot for all, plus snapshot 2 for key%3=0
      SELECT omid, 1 AS snapshot FROM ra
      UNION ALL
      SELECT omid, 2 FROM ra WHERE key % 3 = 0
    ),
    upd AS (SELECT omid, 'Edited ' || CAST(key AS VARCHAR) AS new_value FROM ra WHERE key % 7 = 0),
    newra AS (
      SELECT ra.omid, COALESCE(upd.new_value, ra.name) AS name, ra.key,
             upd.omid IS NOT NULL AS touched
      FROM ra LEFT JOIN upd ON ra.omid = upd.omid
    ),
    maxsnap AS (SELECT omid, MAX(snapshot) AS prev_n FROM prov GROUP BY omid)
    SELECT n.omid, n.name,
           CASE WHEN n.touched THEN m.prev_n + 1 END AS new_snapshot
    FROM newra n JOIN maxsnap m ON n.omid = m.omid
    ORDER BY n.key
    """,
    doc="MetaEditor.update_property: columnar rewrite + max-snapshot+1 provenance numbering (editor.py:90-111).",
)
def ed1_editor_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.editor import update_property

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 700)
    ra = cust.select(
        F.concat(F.lit("ra/"), F.col("c_custkey").cast("string")).alias("omid"),
        F.col("c_name").alias("name"),
        F.lit(None).cast("string").alias("family"),
        F.lit(None).cast("string").alias("given"),
    )
    prov_rows = lambda snap_filter, n: cust.filter(snap_filter).select(
        F.concat(F.lit("ra/"), F.col("c_custkey").cast("string")).alias("entity_omid"),
        F.lit(n).cast("int").alias("snapshot"),
        F.lit("t0").alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array().cast("array<string>").alias("derived_from"),
        F.lit("x").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    prov = prov_rows(F.lit(True), 1).unionByName(prov_rows(F.col("c_custkey") % 3 == 0, 2))
    catalog = _catalog_of(spark, ra=ra, prov=prov)
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        F.concat(F.lit("ra/"), F.col("c_custkey").cast("string")).alias("omid"),
        F.concat(F.lit("Edited "), F.col("c_custkey").cast("string")).alias("new_value"),
    )
    r = update_property(catalog, updates, "name", batch_ts="t1")
    snaps = r.prov_delta.select(
        F.col("entity_omid").alias("omid"), F.col("snapshot").alias("new_snapshot")
    )
    key = F.split(F.col("omid"), "/")[1].cast("long")
    return (
        r.catalog.ra.join(snaps, "omid", "left")
        .select("omid", "name", "new_snapshot")
        .orderBy(key)
    )


# ---------------------------------------------------------------------------
# PV1 — provenance backfill: entities with no snapshot (key%5=1) or a chain
# starting at 2 (key%5=2) gain snapshot 1; everyone else is untouched.
# ---------------------------------------------------------------------------
@register(
    "PV1_provenance_backfill",
    """
    WITH br AS (
      SELECT 'br/' || CAST(c_custkey AS VARCHAR) AS omid, c_custkey AS key
      FROM customer WHERE c_custkey <= 700
    ),
    prov AS (
      SELECT omid, 1 AS snapshot FROM br WHERE key % 5 NOT IN (1, 2)
      UNION ALL
      SELECT omid, 2 FROM br WHERE key % 5 = 2
    ),
    firsts AS (SELECT omid, MIN(snapshot) AS first_n FROM prov GROUP BY omid)
    SELECT br.omid, CAST(1 AS INT) AS snapshot, 'entity created' AS description
    FROM br LEFT JOIN firsts ON br.omid = firsts.omid
    WHERE firsts.first_n IS NULL OR firsts.first_n > 1
    ORDER BY br.key
    """,
    doc="se/1 provenance backfill: anti-join + min-snapshot probe (run/patches/add_missing_provenance.py:45-112).",
)
def pv1_prov_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.patches import add_missing_provenance

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 700)
    br = cust.select(
        F.concat(F.lit("br/"), F.col("c_custkey").cast("string")).alias("omid"),
        F.lit(None).cast("string").alias("type"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("pub_date"),
        F.lit(None).cast("string").alias("seq_id"),
        F.lit(None).cast("string").alias("part_of"),
        F.lit(None).cast("string").alias("embodiment"),
    )
    mk_prov = lambda flt, n: cust.filter(flt).select(
        F.concat(F.lit("br/"), F.col("c_custkey").cast("string")).alias("entity_omid"),
        F.lit(n).cast("int").alias("snapshot"),
        F.lit("t0").alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array().cast("array<string>").alias("derived_from"),
        F.lit("x").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    prov = mk_prov(~(F.col("c_custkey") % 5).isin(1, 2), 1).unionByName(
        mk_prov(F.col("c_custkey") % 5 == 2, 2)
    )
    catalog = _catalog_of(spark, br=br, prov=prov)
    r = add_missing_provenance(catalog, batch_ts="t-fix")
    key = F.split(F.col("omid"), "/")[1].cast("long")
    return (
        r.created.select(
            F.col("entity_omid").alias("omid"), "snapshot", "description"
        ).orderBy(key.alias("k"))
    )


# ---------------------------------------------------------------------------
# PT1 — duplicate-partOf resolution over a synthesized 3-level hierarchy:
# venue 'br/v<nation>' ← volume 'br/m<cust>' ← issue 'br/i<cust>'.  Each
# case BR 'br/c<cust>' claims BOTH its volume and its issue (same venue ⇒
# keep the issue); custkey%4==0 cases claim the NEXT customer's volume
# (block-of-50 wrap, so the partner exists at every SF) — manual review
# whenever that partner sits in a different venue.
# ---------------------------------------------------------------------------
@register(
    "PT1_duplicate_part_of_repair",
    """
    WITH cust AS (SELECT c_custkey AS k, c_nationkey AS n FROM customer WHERE c_custkey < 400),
    cases AS (
      -- partner = next customer within the same block of 50 (wraps): block
      -- pairing is closed under every SF's customer count (multiples of 50)
      SELECT a.k, a.n AS own_n,
             CASE WHEN a.k % 4 = 0 THEN b.n ELSE a.n END AS vol_n
      FROM cust a JOIN cust b ON b.k = a.k - (a.k % 50) + ((a.k % 50) + 1) % 50
    )
    SELECT 'br/c' || CAST(k AS VARCHAR) AS br_omid,
           CASE WHEN own_n = vol_n THEN 'fixed' ELSE 'manual_review' END AS status,
           CASE WHEN own_n = vol_n THEN 'br/i' || CAST(k AS VARCHAR) END AS kept,
           CASE WHEN own_n = vol_n THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS n_removed
    FROM cases ORDER BY k
    """,
    doc="Multi-partOf repair: chain-walk to the terminal venue, keep the most specific container on agreement (run/patches/fix_duplicate_part_of.py:234-295).",
)
def pt1_duplicate_part_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.patches import fix_duplicate_part_of

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    k = F.col("c_custkey").cast("string")
    venues = cust.select(
        F.concat(F.lit("br/v"), F.col("c_nationkey").cast("string")).alias("omid"),
        F.lit("journal").alias("type"),
    ).dropDuplicates()
    volumes = cust.select(
        F.concat(F.lit("br/m"), k).alias("omid"),
        F.lit("journal volume").alias("type"),
        F.concat(F.lit("br/v"), F.col("c_nationkey").cast("string")).alias("part_of"),
    )
    issues = cust.select(
        F.concat(F.lit("br/i"), k).alias("omid"),
        F.lit("journal issue").alias("type"),
        F.concat(F.lit("br/m"), k).alias("part_of"),
    )

    def as_br(df: DataFrame) -> DataFrame:
        cols = {c: df[c] if c in df.columns else F.lit(None).cast("string")
                for c in ("omid", "type", "title", "pub_date", "seq_id", "part_of", "embodiment")}
        return df.select(*[cols[c].alias(c) for c in ("omid", "type", "title", "pub_date", "seq_id", "part_of", "embodiment")])

    br = as_br(venues).unionByName(as_br(volumes)).unionByName(as_br(issues))
    partner = (
        F.col("c_custkey") - (F.col("c_custkey") % 50) + ((F.col("c_custkey") % 50) + 1) % 50
    )
    other_vol = F.concat(F.lit("br/m"), partner.cast("string"))
    own_vol = F.concat(F.lit("br/m"), k)
    edges = (
        cust.select(
            F.concat(F.lit("br/c"), k).alias("br_omid"),
            F.concat(F.lit("br/i"), k).alias("container_omid"),
        )
        .unionByName(
            cust.select(
                F.concat(F.lit("br/c"), k).alias("br_omid"),
                F.when(F.col("c_custkey") % 4 == 0, other_vol).otherwise(own_vol).alias("container_omid"),
            )
        )
    )
    catalog = _catalog_of(spark, br=br)
    r = fix_duplicate_part_of(catalog, edges)
    key = F.regexp_extract(F.col("br_omid"), r"c(\d+)$", 1).cast("long")
    return r.report.select(
        "br_omid", "status", "kept", F.size("removed").cast("long").alias("n_removed")
    ).orderBy(key)
