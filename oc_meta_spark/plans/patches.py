"""Patch tools — Spark-native analogs of the reference's ``run/patches``
repair family that operate on entity tables rather than per-file RDF:

- :func:`add_missing_provenance` — backfill the ``se/1`` creation snapshot
  of entities that have no provenance at all, or whose chain starts past
  snapshot 1 (reference run/patches/add_missing_provenance.py:45-112, which
  scans each data zip, probes the prov sidecar for a specializationOf
  snapshot, and generates the missing creation snapshot).
- :func:`fix_duplicate_part_of` — resolve bibliographic resources carrying
  MULTIPLE ``frbr:partOf`` containers (an RDF-level anomaly: the columnar
  catalog stores one container, so duplicates only enter through foreign
  RDF imports).  Mirrors reference run/patches/fix_duplicate_part_of.py:
  scan_duplicate_part_of :109-147 finds the multi-valued BRs,
  build_chain_map/_follow_to_venue :166-232 walks each container up the
  hierarchy to its terminal venue, and resolve_cases :234-295 keeps the
  MOST SPECIFIC container when every container belongs to the same venue
  (issue > volume > anything else) and defers to manual review when the
  containers disagree on the venue.

The remaining reference patches are either already first-class operators
(fix_literal_datatypes → ``VD1_literal_datatype_audit``; has_next → the W1
chain discipline; fix_corrupted_dois → C8 validation + editor updates;
fix_misplaced_editor_ars → the CONTAINER_EDITOR_TYPES routing inside
curate()) or need the network + human review loop the engine deliberately
excludes (fix_omid_mismatches classifies via live DOI resolution and
Crossref lookups — its INPUT, the ``omid_mismatch`` error list, is produced
by plans/check_results.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oc_meta_spark.plans.curation import EntityCatalog

def _specificity() -> F.Column:
    """Container specificity (reference resolve_cases sorts candidate
    containers "most specific first": issue under volume under venue)."""
    return (
        F.when(F.col("c_type") == "journal issue", 3)
        .when(F.col("c_type") == "journal volume", 2)
        .otherwise(1)
    )


@dataclass
class ProvBackfill:
    catalog: EntityCatalog
    created: DataFrame  # the se/1 rows that were added


def add_missing_provenance(
    catalog: EntityCatalog,
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
) -> ProvBackfill:
    """Backfill missing creation snapshots.

    Every live entity (br/ra/id/ar/re) must own a provenance chain starting
    at snapshot 1.  Entities with no chain at all, or whose chain starts at
    snapshot ≥ 2 (the reference's missing-``se/1`` case), get a creation
    snapshot numbered 1 stamped ``batch_ts``.  One anti-join + one min()
    aggregate over the prov table — no per-entity probes.
    """
    live = (
        catalog.br.select("omid")
        .unionByName(catalog.ra.select("omid"))
        .unionByName(catalog.id.select("omid"))
        .unionByName(catalog.ar.select("omid"))
        .unionByName(catalog.re.select("omid"))
        .dropDuplicates()
    )
    first_snap = catalog.prov.groupBy("entity_omid").agg(F.min("snapshot").alias("first_n"))
    missing = (
        live.join(first_snap, live.omid == F.col("entity_omid"), "left")
        .filter(F.col("first_n").isNull() | (F.col("first_n") > 1))
        .select("omid")
    )
    created = missing.select(
        F.col("omid").alias("entity_omid"),
        F.lit(1).alias("snapshot"),
        F.lit(batch_ts).alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array().cast("array<string>").alias("derived_from"),
        F.lit(resp_agent).alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    kwargs = {
        f: getattr(catalog, f)
        for f in ("br", "ra", "id", "entity_id", "ar", "re", "prov", "counters")
    }
    kwargs["prov"] = catalog.prov.unionByName(created)
    return ProvBackfill(EntityCatalog(**kwargs), created)


@dataclass
class PartOfRepair:
    report: DataFrame  # (br_omid, status, kept, removed, venues)
    updates: DataFrame  # (omid, new_value) — feed editor.update_property("part_of")


def fix_duplicate_part_of(
    catalog: EntityCatalog, edges: DataFrame, max_depth: int = 6
) -> PartOfRepair:
    """Resolve multi-valued ``partOf`` anomalies.

    ``edges`` is the raw (br_omid, container_omid) multi-map as read from a
    foreign RDF dump (one row per partOf triple; the columnar catalog keeps
    only one).  For each BR with >1 distinct container:

    - every container is walked up the catalog's (single-valued) part_of
      chain to its terminal venue — ``max_depth`` fixed frontier joins, no
      driver iteration (OCDM hierarchies are ≤ 3 deep: issue→volume→venue);
    - same terminal venue for all containers → keep the most specific
      container (issue > volume > other; omid order breaks ties), drop the
      rest — status ``fixed``;
    - different venues → status ``manual_review``, nothing dropped
      (reference resolve_cases:260-295).

    Returns the case report plus an updates frame applying the kept
    container through the editor surface.
    """
    dup_brs = (
        edges.select(F.col("br_omid"), F.col("container_omid"))
        .dropDuplicates()
        .groupBy("br_omid")
        .agg(F.countDistinct("container_omid").alias("n"))
        .filter(F.col("n") > 1)
        .select("br_omid")
    )
    cand = edges.join(dup_brs, "br_omid", "left_semi").dropDuplicates(
        ["br_omid", "container_omid"]
    )

    # chain-walk every distinct container to its terminal venue
    parents = catalog.br.select(
        F.col("omid").alias("p_omid"), F.col("part_of").alias("p_next")
    )
    cur = cand.select(F.col("container_omid").alias("start")).dropDuplicates().withColumn(
        "cur", F.col("start")
    )
    for _ in range(max_depth):
        cur = (
            cur.join(parents, cur.cur == parents.p_omid, "left")
            .withColumn("cur", F.coalesce("p_next", "cur"))
            .drop("p_omid", "p_next")
        )
    venues = cur.select(F.col("start").alias("container_omid"), F.col("cur").alias("venue"))

    typed = (
        cand.join(venues, "container_omid", "left")
        .join(
            catalog.br.select(F.col("omid").alias("container_omid"), F.col("type").alias("c_type")),
            "container_omid",
            "left",
        )
        .withColumn("spec", _specificity())
    )
    per_br = typed.groupBy("br_omid").agg(
        F.countDistinct(F.coalesce("venue", F.lit("?"))).alias("n_venues"),
        F.array_sort(F.collect_set(F.coalesce("venue", F.lit("?")))).alias("venues"),
        # max (spec, omid-desc) → most specific container, deterministic ties
        F.max(F.struct(F.col("spec"), F.col("container_omid").alias("c"))).alias("best"),
        F.array_sort(F.collect_set("container_omid")).alias("all_containers"),
    )
    report = per_br.select(
        "br_omid",
        F.when(F.col("n_venues") == 1, "fixed").otherwise("manual_review").alias("status"),
        F.when(F.col("n_venues") == 1, F.col("best.c")).alias("kept"),
        F.when(
            F.col("n_venues") == 1,
            F.array_remove(F.col("all_containers"), F.col("best.c")),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("removed"),
        "venues",
    )
    updates = report.filter(F.col("status") == "fixed").select(
        F.col("br_omid").alias("omid"), F.col("kept").alias("new_value")
    )
    return PartOfRepair(report, updates)
