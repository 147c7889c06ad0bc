"""Driver gate for the post-merge integrity audit (MA1).

The audit kernel (``plans/merge_audit.py`` — the
``run/merge/check_merged_{brs,ras,ids}_results`` analogs) runs over an
EntityCatalog, which the DuckDB oracle cannot build; this gate therefore
synthesizes a merged store FROM the customer table with violations of
every family planted at fixed modular positions, drives the REAL kernel
on the Spark side, and re-derives the per-issue counts independently in
SQL from the same modular predicates (the fidelity-gate pattern: the
semantics are expressed twice, not the implementation copied).

Synthesis (k = c_custkey < 400; all arithmetic shared by both engines):
- merge pairs: survivor ``ra/k`` (k≡0 mod 4) absorbs ``ra/k+1``;
- planted violations, one modular set per issue family:
  resurrected merged k≡1 (mod 40) · dangling AR reference k≡1 (mod 100)
  · missing survivor k=200 · nameless survivor k≡80 (mod 160) ·
  identifier-less survivor k≡40 (mod 100) · surviving head invalidated
  k≡0 (mod 120) · first snapshot derived k≡0 (mod 160) · merge snapshot
  not self-derived k≡40 (mod 160) · merge snapshot deriving ONLY from
  itself (not multi-derived) k≡120 (mod 160) · merged creation snapshot
  dropped k≡1 (mod 200) (fires both chain-length checks) · merged head
  left open k≡41 (mod 120).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.curation import EntityCatalog
from oc_meta_spark.plans.merge_audit import audit_merges
from oc_meta_spark.plans.registry import register
from oc_meta_spark.schemas import ENTITY_TABLES
from oc_meta_spark.sources.tables import load_table


def _omid(col) -> F.Column:
    return F.concat(F.lit("ra/"), col.cast("string"))


@register(
    "MA1_merge_audit",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 400),
    surv AS (SELECT k FROM ks WHERE k % 4 = 0),
    mrg AS (SELECT k FROM ks WHERE k % 4 = 1),
    iss AS (
      SELECT 'merged entity still exists' AS issue, COUNT(*) AS n
        FROM mrg WHERE k % 40 = 1
      UNION ALL SELECT 'merged entity still referenced', COUNT(*)
        FROM mrg WHERE k % 100 = 1
      UNION ALL SELECT 'surviving entity does not exist', COUNT(*)
        FROM surv WHERE k = 200
      UNION ALL SELECT 'agent has no name properties', COUNT(*)
        FROM surv WHERE k % 160 = 80
      UNION ALL SELECT 'agent has no identifier', COUNT(*)
        FROM surv WHERE k % 100 = 40
      UNION ALL SELECT 'surviving last snapshot invalidated', COUNT(*)
        FROM surv WHERE k % 120 = 0
      UNION ALL SELECT 'first snapshot has derivation', COUNT(*)
        FROM surv WHERE k % 160 = 0
      UNION ALL SELECT 'snapshot not derived from own chain', COUNT(*)
        FROM surv WHERE k % 160 = 40
      UNION ALL SELECT 'merge snapshot not multi-derived', COUNT(*)
        FROM surv WHERE k % 160 = 120
      UNION ALL SELECT 'merged entity not invalidated', COUNT(*)
        FROM mrg WHERE k % 120 = 41
      UNION ALL SELECT 'fewer than two snapshots', COUNT(*)
        FROM mrg WHERE k % 200 = 1
      UNION ALL SELECT 'non-contiguous snapshot numbers', COUNT(*)
        FROM mrg WHERE k % 200 = 1
    )
    SELECT issue, CAST(n AS BIGINT) AS n FROM iss WHERE n > 0 ORDER BY issue
    """,
    doc="Post-merge integrity audit over a synthesized merged store with planted violations of every family (check_merged_* analogs).",
)
def ma1_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ks = (
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("k"))
        .filter(F.col("k") < 400)
    )
    surv = ks.filter(F.col("k") % 4 == 0)
    mrg = ks.filter(F.col("k") % 4 == 1)

    # live RA table: everyone except merged entities — with the planted
    # resurrections kept alive and one survivor dropped; nameless plant
    ra = (
        ks.filter((F.col("k") % 4 != 1) | (F.col("k") % 40 == 1))
        .filter(F.col("k") != 200)
        .select(
            _omid(F.col("k")).alias("omid"),
            F.when(F.col("k") % 160 == 80, F.lit(None))
            .otherwise(F.concat(F.lit("name-"), F.col("k").cast("string")))
            .alias("name"),
            F.lit(None).cast("string").alias("family"),
            F.lit(None).cast("string").alias("given"),
        )
    )
    # identifier links for survivors (minus the identifier-less plant)
    entity_id = surv.filter(F.col("k") % 100 != 40).select(
        _omid(F.col("k")).alias("entity_omid"),
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("id_omid"),
    )
    # dangling AR references to merged entities
    ar = mrg.filter(F.col("k") % 100 == 1).select(
        F.concat(F.lit("ar/"), F.col("k").cast("string")).alias("omid"),
        F.lit("br/0").alias("br_omid"),
        F.lit("author").alias("role"),
        _omid(F.col("k")).alias("ra_omid"),
        F.lit(1).alias("pos"),
    )

    participants = surv.select("k", F.lit("s").alias("r")).unionByName(
        mrg.select("k", F.lit("m").alias("r"))
    )
    self_arr = F.array(_omid(F.col("k")))
    snap1 = participants.filter(~((F.col("r") == "m") & (F.col("k") % 200 == 1))).select(
        _omid(F.col("k")).alias("entity_omid"),
        F.lit(1).alias("snapshot"),
        F.lit("t0").alias("generated_at"),
        F.lit("t1").alias("invalidated_at"),
        F.when(F.col("k") % 160 == 0, self_arr)
        .otherwise(F.array().cast("array<string>"))
        .alias("derived_from"),
        F.lit("agent").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    partner = _omid(F.col("k") + 1)
    snap2_s = surv.select(
        _omid(F.col("k")).alias("entity_omid"),
        F.lit(2).alias("snapshot"),
        F.lit("t1").alias("generated_at"),
        F.when(F.col("k") % 120 == 0, F.lit("t2"))
        .otherwise(F.lit(None).cast("string"))
        .alias("invalidated_at"),
        F.when(F.col("k") % 160 == 40, F.array(partner, _omid(F.col("k"))))
        .when(F.col("k") % 160 == 120, self_arr)  # merge snapshot deriving only from itself
        .otherwise(F.array(_omid(F.col("k")), partner))
        .alias("derived_from"),
        F.lit("agent").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entities merged").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    snap2_m = mrg.select(
        _omid(F.col("k")).alias("entity_omid"),
        F.lit(2).alias("snapshot"),
        F.lit("t1").alias("generated_at"),
        F.when(F.col("k") % 120 == 41, F.lit(None).cast("string"))
        .otherwise(F.lit("t1"))
        .alias("invalidated_at"),
        self_arr.alias("derived_from"),
        F.lit("agent").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity merged and invalidated").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    prov = snap1.unionByName(snap2_s).unionByName(snap2_m)

    empty = lambda t: spark.createDataFrame([], ENTITY_TABLES[t])  # noqa: E731
    cat = EntityCatalog(
        br=empty("br"),
        ra=ra,
        id=empty("id"),
        entity_id=entity_id,
        ar=ar,
        re=empty("re"),
        prov=prov,
    )
    instr = surv.select(
        _omid(F.col("k")).alias("surviving_entity"),
        _omid(F.col("k") + 1).alias("merged_entity"),
    )
    return (
        audit_merges(cat, instr)
        .groupBy("issue")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("issue")
    )


# ---------------------------------------------------------------------------
# MRG1 — the merge EXECUTOR oracle (round-6).  apply_merges (D11,
# plans/merge.py — the oc_ocdm merge + editor save analog,
# core/editor.py:244-290) was covered by pytest and only indirectly by
# MA1 (which audits a hand-built merged store, not the executor's
# output).  This gate synthesizes a pre-merge RA store from the customer
# table (k < 300; survivor k≡0 mod 3 absorbs k+1, pairs formed by an
# explicit k→k+1 join so both engines see the same set even with key
# gaps), runs the REAL executor, and projects the result to invariants a
# DuckDB CTE re-derives from the same residues:
#
# - merged rows leave the live table, nothing else does;
# - every identifier link survives and none points at a merged entity;
# - inbound AR references are rewritten to the survivor;
# - nameless survivors (k≡0 mod 9) absorb the donor's name;
# - one invalidation snapshot per merged entity and one merge snapshot
#   (derived_from ≥ 2) per survivor land in the provenance delta.
# ---------------------------------------------------------------------------
@register(
    "MRG1_apply_merges_invariants",
    """
    WITH ks AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 300),
    p AS (
      SELECT a.k AS s, b.k AS m FROM ks a JOIN ks b ON b.k = a.k + 1
      WHERE a.k % 3 = 0
    ),
    agg AS (
      SELECT (SELECT COUNT(*) FROM ks) AS n,
             (SELECT COUNT(*) FROM p) AS np,
             (SELECT COUNT(*) FROM p WHERE s % 9 = 0) AS nf
    )
    SELECT metric, CAST(n AS BIGINT) AS n FROM (
      SELECT 'ra_rows' AS metric, n - np AS n FROM agg
      UNION ALL SELECT 'ra_merged_remaining', 0 FROM agg
      UNION ALL SELECT 'ra_filled_from_donor', nf FROM agg
      UNION ALL SELECT 'entity_id_rows', n FROM agg
      UNION ALL SELECT 'links_on_merged', 0 FROM agg
      UNION ALL SELECT 'ar_rows', np FROM agg
      UNION ALL SELECT 'ar_to_merged', 0 FROM agg
      UNION ALL SELECT 'ar_to_survivor', np FROM agg
      UNION ALL SELECT 'prov_invalidation_snaps', np FROM agg
      UNION ALL SELECT 'prov_merge_snaps_derived2', np FROM agg
    ) ORDER BY metric
    """,
    doc="apply_merges executor invariants over a synthesized pre-merge store — the D11 direct oracle.",
)
def mrg1_apply_merges_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.merge import apply_merges

    ks = (
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("k"))
        .filter(F.col("k") < 300)
    )
    pairs = (
        ks.alias("a")
        .join(ks.alias("b"), F.col("b.k") == F.col("a.k") + 1)
        .filter(F.col("a.k") % 3 == 0)
        .select(F.col("a.k").alias("s"), F.col("b.k").alias("m"))
    )
    ra = ks.select(
        _omid(F.col("k")).alias("omid"),
        F.when(F.col("k") % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("N"), F.col("k").cast("string")))
        .alias("name"),
        F.lit(None).cast("string").alias("family"),
        F.lit(None).cast("string").alias("given"),
    )
    id_tbl = ks.select(
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("omid"),
        F.lit("orcid").alias("schema"),
        F.concat(F.lit("v"), F.col("k").cast("string")).alias("value"),
    )
    entity_id = ks.select(
        _omid(F.col("k")).alias("entity_omid"),
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("id_omid"),
    )
    ar = pairs.select(
        F.concat(F.lit("ar/"), F.col("m").cast("string")).alias("omid"),
        F.lit("br/0").alias("br_omid"),
        F.lit("author").alias("role"),
        _omid(F.col("m")).alias("ra_omid"),
        F.lit(1).alias("pos"),
    )
    prov = ks.select(
        _omid(F.col("k")).alias("entity_omid"),
        F.lit(1).alias("snapshot"),
        F.lit("t0").alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array().cast("array<string>").alias("derived_from"),
        F.lit("agent").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    empty = lambda t: spark.createDataFrame([], ENTITY_TABLES[t])  # noqa: E731
    cat = EntityCatalog(
        br=empty("br"), ra=ra, id=id_tbl, entity_id=entity_id,
        ar=ar, re=empty("re"), prov=prov,
    )
    instr = pairs.select(
        _omid(F.col("s")).alias("surviving_entity"),
        _omid(F.col("m")).alias("merged_entity"),
    )
    res = apply_merges(cat, instr)
    merged = pairs.select(_omid(F.col("m")).alias("omid"))
    surv = pairs.select(_omid(F.col("s")).alias("omid"))
    filled = pairs.filter(F.col("s") % 9 == 0).select(
        _omid(F.col("s")).alias("omid"),
        F.concat(F.lit("N"), F.col("m").cast("string")).alias("donor_name"),
    )
    base = (
        res.catalog.ra.agg(F.count(F.lit(1)).alias("ra_rows"))
        .crossJoin(
            res.catalog.ra.join(merged, "omid", "left_semi")
            .agg(F.count(F.lit(1)).alias("ra_merged_remaining"))
        )
        .crossJoin(
            res.catalog.ra.join(filled, "omid")
            .filter(F.col("name") == F.col("donor_name"))
            .agg(F.count(F.lit(1)).alias("ra_filled_from_donor"))
        )
        .crossJoin(res.catalog.entity_id.agg(F.count(F.lit(1)).alias("entity_id_rows")))
        .crossJoin(
            res.catalog.entity_id.join(
                merged.withColumnRenamed("omid", "entity_omid"), "entity_omid", "left_semi"
            ).agg(F.count(F.lit(1)).alias("links_on_merged"))
        )
        .crossJoin(res.catalog.ar.agg(F.count(F.lit(1)).alias("ar_rows")))
        .crossJoin(
            res.catalog.ar.join(
                merged.withColumnRenamed("omid", "ra_omid"), "ra_omid", "left_semi"
            ).agg(F.count(F.lit(1)).alias("ar_to_merged"))
        )
        .crossJoin(
            res.catalog.ar.join(
                surv.withColumnRenamed("omid", "ra_omid"), "ra_omid", "left_semi"
            ).agg(F.count(F.lit(1)).alias("ar_to_survivor"))
        )
        .crossJoin(
            res.prov_delta.filter(F.col("invalidated_at").isNotNull())
            .agg(F.count(F.lit(1)).alias("prov_invalidation_snaps"))
        )
        .crossJoin(
            res.prov_delta.filter(F.size("derived_from") >= 2)
            .agg(F.count(F.lit(1)).alias("prov_merge_snaps_derived2"))
        )
    )
    metrics = (
        "ra_rows", "ra_merged_remaining", "ra_filled_from_donor", "entity_id_rows",
        "links_on_merged", "ar_rows", "ar_to_merged", "ar_to_survivor",
        "prov_invalidation_snaps", "prov_merge_snaps_derived2",
    )
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return (
        base.selectExpr(f"stack({len(metrics)}, {stack}) AS (metric, n)")
        .select("metric", F.col("n").cast("long").alias("n"))
        .orderBy("metric")
    )
