"""Duplicate finding and entity merging over the entity tables
(SURVEY §2.4 D9-D13, §3.3; reference: oc_meta/run/find/duplicated_ids.py,
run/find/duplicated_entities.py, core/editor.py:190-276 merge semantics per
docs/11-merge-overview.md, run/find/merged_entities.py history).

The reference needs union-find + file locks + group packing because it
mutates RDF files; here every step is a declarative plan over the tables
and the whole merge is one transactional batch of table rewrites:

- find_duplicate_ids: ID entities sharing (schema, value) → merge sets;
- find_duplicate_entities: BR/RA sharing an identifier, grouped
  *transitively* via connected components (D10);
- plan_merges: per component pick the surviving entity (min omid — the
  reference keeps the first/lowest), others become merged;
- apply_merges: rewrite every reference (entity_id, ar.ra_omid/br_omid,
  br.part_of/embodiment), union identifier links onto the survivor, drop
  merged rows, and append merge provenance snapshots whose
  ``derived_from`` lists survivor + merged (≥2 ⇒ merge event, the D13
  signal);
- merge_history: reconstruct survivor chains from provenance by pointer
  jumping (D13).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oc_meta_spark.functions.prov_deltas import (
    append_snapshots,
    kind_graph,
    own_triple_rows,
    sparql_update,
    triple,
    uri,
)
from oc_meta_spark.operators.cc import connected_components
from oc_meta_spark.operators.traversal import resolve_chains
from oc_meta_spark.plans.curation import EntityCatalog


def find_duplicate_ids(catalog: EntityCatalog) -> DataFrame:
    """ID entities with the same (schema, value) — D9.

    Returns (schema, value, surviving_id, merged_ids array, n).
    """
    return (
        catalog.id.groupBy("schema", "value")
        .agg(F.sort_array(F.collect_set("omid")).alias("all_ids"))
        .filter(F.size("all_ids") > 1)
        .select(
            "schema",
            "value",
            F.col("all_ids")[0].alias("surviving_id"),
            F.slice("all_ids", 2, F.size("all_ids") - 1).alias("merged_ids"),
            F.size("all_ids").alias("n"),
        )
    )


def find_duplicate_entities(catalog: EntityCatalog, kind_prefix: str = "br/") -> DataFrame:
    """Entities of one kind sharing any identifier, grouped transitively
    (D10: A~B on id1, B~C on id2 ⇒ {A,B,C} one component).

    Returns (entity_omid, component) for entities in non-trivial components.
    """
    links = (
        catalog.entity_id.filter(F.col("entity_omid").startswith(kind_prefix))
        .join(catalog.id.select(F.col("omid").alias("id_omid"), "schema", "value"), "id_omid")
        .select("entity_omid", F.concat_ws(":", "schema", "value").alias("id_key"))
    )
    edges = links.select(
        F.concat(F.lit("e:"), F.col("entity_omid")).alias("src"),
        F.concat(F.lit("i:"), F.col("id_key")).alias("dst"),
    )
    comp = connected_components(edges, "src", "dst")
    ent = comp.filter(F.col("node").startswith("e:")).select(
        F.expr("substring(node, 3)").alias("entity_omid"), F.col("comp").alias("component")
    )
    sizes = ent.groupBy("component").agg(F.count(F.lit(1)).alias("n_entities"))
    return ent.join(sizes.filter(F.col("n_entities") > 1), "component").select("entity_omid", "component")


def plan_merges(duplicates: DataFrame) -> DataFrame:
    """Per component: survivor = min omid, everything else merges into it.

    Returns (surviving_entity, merged_entity) pairs — the reference's merge
    instruction CSV (docs/12-find-duplicates.md "Output format").
    """
    survivors = duplicates.groupBy("component").agg(F.min("entity_omid").alias("surviving_entity"))
    return (
        duplicates.join(survivors, "component")
        .filter(F.col("entity_omid") != F.col("surviving_entity"))
        .select("surviving_entity", F.col("entity_omid").alias("merged_entity"))
    )


@dataclass
class MergeResult:
    catalog: EntityCatalog
    prov_delta: DataFrame
    n_merged: int


def _absorb(
    table: DataFrame, mapping: DataFrame, fields: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Default (non-Expression) merge semantics for one entity table:
    drop merged rows, fill each survivor's EMPTY fields from its merged
    entities (lowest-omid donor per field).  Returns (new_table,
    fill_triples) where fill_triples is (entity_omid, t) — the INSERT
    lines for the survivor's merge-snapshot update_query."""
    donors = (
        mapping.join(
            table.withColumnRenamed("omid", "m_omid"), F.col("m") == F.col("m_omid")
        )
        .groupBy(F.col("s").alias("omid"))
        .agg(
            *[
                F.expr(
                    f"min_by({f}, CASE WHEN {f} IS NOT NULL AND {f} <> '' THEN m END)"
                ).alias(f"_fill_{f}")
                for f in fields
            ]
        )
    )
    kept = table.join(mapping.select(F.col("m").alias("omid")), "omid", "left_anti")
    # No broadcast hint: the donor table has one row per surviving entity,
    # which is unbounded in a corpus-scale dedup campaign (D9/D10 at 10^8
    # ids).  AQE still picks a broadcast join at runtime when the side is
    # actually small; a static F.broadcast hint would force it regardless
    # of size and OOM the executors.
    joined = kept.join(donors, "omid", "left")
    fill_parts = [
        joined.select(
            F.col("omid").alias("entity_omid"),
            F.when(
                F.nullif(F.col(f), F.lit("")).isNull(), triple(F.col("omid"), f, F.col(f"_fill_{f}"))
            ).alias("t"),
        ).filter(F.col("t").isNotNull())
        for f in fields
    ]
    fills = fill_parts[0]
    for p in fill_parts[1:]:
        fills = fills.unionByName(p)
    out = joined
    for f in fields:
        out = out.withColumn(f, F.coalesce(F.nullif(F.col(f), F.lit("")), F.col(f"_fill_{f}")))
    return out.drop(*[f"_fill_{f}" for f in fields]), fills


def apply_merges(
    catalog: EntityCatalog,
    instructions: DataFrame,
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
) -> MergeResult:
    """Execute merge instructions (surviving_entity, merged_entity) — D11.

    Semantics per docs/11-merge-overview.md: the survivor keeps its own
    values and AR chains; identifier links of merged entities move to the
    survivor; every inbound reference is rewritten; merged entities are
    removed from the live tables but preserved in provenance (invalidation
    snapshot + a survivor snapshot with ≥2 derived_from).

    Chains in the instructions (B→A and C→B) are collapsed first by pointer
    jumping so every entity rewrites straight to its final survivor.
    """
    spark = instructions.sparkSession
    # Collapse instruction chains: merged → final survivor.
    final = resolve_chains(
        instructions.select(F.col("merged_entity").alias("old"), F.col("surviving_entity").alias("new"))
    ).select(F.col("old").alias("merged_entity"), F.col("final").alias("surviving_entity"))
    mapping = final.select(F.col("merged_entity").alias("m"), F.col("surviving_entity").alias("s"))

    def rewrite(df: DataFrame, col: str) -> DataFrame:
        # Unhinted join: the merged→survivor mapping is one row per merged
        # entity — small in an incremental batch, unbounded in a full-corpus
        # dedup campaign.  Let AQE choose broadcast vs shuffle at runtime
        # from the mapping's actual size.
        m = mapping.withColumnRenamed("m", col)
        return (
            df.join(m, col, "left")
            .withColumn(col, F.coalesce("s", col))
            .drop("s")
        )

    merged_set = mapping.select(F.col("m").alias("omid"))

    # entity_id: move identifier links to survivors, dedup.
    entity_id = (
        rewrite(catalog.entity_id, "entity_omid").dropDuplicates(["entity_omid", "id_omid"])
    )
    # ar: rewrite both br and ra references; drop ARs that became
    # duplicates of a surviving chain slot (same br, role, ra).
    ar = rewrite(rewrite(catalog.ar, "br_omid"), "ra_omid").dropDuplicates(["br_omid", "role", "ra_omid"])
    # br: merged rows dropped (survivor keeps its own row — the reference's
    # prefer_self, used ONLY when both entities are Expressions,
    # core/editor.py:266-276); containment links rewritten to survivors.
    br = rewrite(catalog.br.join(merged_set, "omid", "left_anti"), "part_of")
    # ra / re: NON-Expression kinds merge with oc_ocdm's default semantics
    # (editor.py:275-276): the merged entity's literals fill the survivor's
    # EMPTY fields (survivor's own values still win — absorption, not
    # overwrite).  Donor value per field = the lowest-omid merged entity
    # that has one (deterministic; the reference applies pairwise merges in
    # instruction order, which plan_merges emits sorted).
    ra, ra_fills = _absorb(catalog.ra, mapping, ["name", "family", "given"])
    re_tbl, re_fills = _absorb(catalog.re, mapping, ["start_page", "end_page"])
    id_tbl = catalog.id  # ID entities themselves are deduped by D9 separately

    # Provenance: invalidation snapshot for merged; merge snapshot for
    # survivors with derived_from = [survivor, merged...] (≥2 ⇒ merge).
    # Both carry SPARQL-update deltas (functions/prov_deltas.py; reference
    # ProvSet via run/meta_process.py:280-288): the merged entity's snapshot
    # DELETEs its own triples; the survivor's snapshot INSERTs what it
    # gained — moved identifier links plus non-Expression absorption fills.
    prev_max = catalog.prov.groupBy("entity_omid").agg(F.max("snapshot").alias("prev_n"))
    gone_triples = (
        own_triple_rows(catalog)
        .join(merged_set.withColumnRenamed("omid", "entity_omid"), "entity_omid", "left_semi")
        .groupBy("entity_omid")
        .agg(F.sort_array(F.collect_list("t")).alias("del_ts"))
    )
    inval = (
        merged_set.withColumnRenamed("omid", "entity_omid")
        .join(prev_max, "entity_omid", "left")
        .join(gone_triples, "entity_omid", "left")
        .select(
            "entity_omid",
            (F.coalesce("prev_n", F.lit(0)) + 1).cast("int").alias("snapshot"),
            F.lit(batch_ts).alias("generated_at"),
            F.lit(batch_ts).alias("invalidated_at"),
            F.array(F.col("entity_omid")).cast("array<string>").alias("derived_from"),
            F.lit(resp_agent).alias("resp_agent"),
            F.lit(None).cast("string").alias("primary_source"),
            F.lit("entity merged and invalidated").alias("description"),
            sparql_update(
                kind_graph(F.col("entity_omid")),
                F.coalesce(F.col("del_ts"), F.array().cast("array<string>")),
                F.array().cast("array<string>"),
            ).alias("update_query"),
        )
    )
    # survivor gains: identifier links that moved over (not already owned)
    moved_links = (
        catalog.entity_id.join(mapping, F.col("entity_omid") == F.col("m"))
        .select(F.col("s").alias("entity_omid"), "id_omid")
        .join(catalog.entity_id, ["entity_omid", "id_omid"], "left_anti")
        .dropDuplicates()
        .select(
            "entity_omid",
            F.concat(
                uri(F.col("entity_omid")),
                F.lit(" <http://purl.org/spar/datacite/hasIdentifier> "),
                uri(F.col("id_omid")),
            ).alias("t"),
        )
    )
    gained = (
        moved_links.unionByName(ra_fills)
        .unionByName(re_fills)
        .groupBy("entity_omid")
        .agg(F.sort_array(F.collect_set("t")).alias("ins_ts"))
    )
    merge_snap = (
        mapping.groupBy("s")
        .agg(F.sort_array(F.collect_set("m")).alias("merged_list"))
        .withColumnRenamed("s", "entity_omid")
        .join(prev_max, "entity_omid", "left")
        .join(gained, "entity_omid", "left")
        .select(
            "entity_omid",
            (F.coalesce("prev_n", F.lit(0)) + 1).cast("int").alias("snapshot"),
            F.lit(batch_ts).alias("generated_at"),
            F.lit(None).cast("string").alias("invalidated_at"),
            F.concat(F.array(F.col("entity_omid")), F.col("merged_list")).alias("derived_from"),
            F.lit(resp_agent).alias("resp_agent"),
            F.lit(None).cast("string").alias("primary_source"),
            F.lit("entities merged").alias("description"),
            sparql_update(
                kind_graph(F.col("entity_omid")),
                F.array().cast("array<string>"),
                F.coalesce(F.col("ins_ts"), F.array().cast("array<string>")),
            ).alias("update_query"),
        )
    )
    prov_delta = inval.unionByName(merge_snap)
    n_merged = mapping.count()

    return MergeResult(
        catalog=EntityCatalog(
            br=br,
            ra=ra,
            id=id_tbl,
            entity_id=entity_id,
            ar=ar,
            re=re_tbl,
            prov=append_snapshots(catalog.prov, prov_delta),
        ),
        prov_delta=prov_delta,
        n_merged=n_merged,
    )


def merge_history(prov: DataFrame) -> DataFrame:
    """Reconstruct merge chains from provenance — D13.

    Snapshots with ≥2 ``derived_from`` mark (survivor, merged…) events;
    chains A→B→C resolve to the final survivor by pointer jumping.
    Returns (merged_entity, final_survivor).
    """
    events = (
        prov.filter(F.size("derived_from") >= 2)
        .select(F.col("entity_omid").alias("survivor"), F.explode("derived_from").alias("merged"))
        .filter(F.col("merged") != F.col("survivor"))
    )
    return resolve_chains(
        events.select(F.col("merged").alias("old"), F.col("survivor").alias("new"))
    ).select(F.col("old").alias("merged_entity"), F.col("final").alias("final_survivor"))


def synth_hub_merge(spark, n: int = 10_000):
    """The skewed-hub merge shape (the reference's ``--preload-high-authors
    2869`` ATLAS stress, run/benchmark/benchmark.py, scaled up): ONE
    nameless survivor absorbs ``n`` merged RAs, each carrying one id.
    Returns (catalog, instructions) — shared by the round-6 skew stress
    test (tests/test_merge.py) and bench.py's ``merge_hub_sec`` entry so
    the timed shape can never drift from the correctness-pinned one."""
    from oc_meta_spark.schemas import ENTITY_TABLES

    ks = spark.range(0, n + 1).select(F.col("id").cast("int").alias("k"))
    _ra = lambda c: F.concat(F.lit("ra/"), c.cast("string"))  # noqa: E731
    ra = ks.select(
        _ra(F.col("k")).alias("omid"),
        F.when(F.col("k") == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Org "), F.col("k").cast("string")))
        .alias("name"),
        F.lit(None).cast("string").alias("family"),
        F.lit(None).cast("string").alias("given"),
    )
    merged_ks = ks.filter(F.col("k") >= 1)
    id_tbl = merged_ks.select(
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("omid"),
        F.lit("orcid").alias("schema"),
        F.concat(F.lit("v"), F.col("k").cast("string")).alias("value"),
    )
    entity_id = merged_ks.select(
        _ra(F.col("k")).alias("entity_omid"),
        F.concat(F.lit("id/"), F.col("k").cast("string")).alias("id_omid"),
    )
    prov = ks.select(
        _ra(F.col("k")).alias("entity_omid"),
        F.lit(1).alias("snapshot"),
        F.lit("t0").alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array().cast("array<string>").alias("derived_from"),
        F.lit("agent").alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit("entity created").alias("description"),
        F.lit(None).cast("string").alias("update_query"),
    )
    empty = lambda nm: spark.createDataFrame([], ENTITY_TABLES[nm])  # noqa: E731
    catalog = EntityCatalog(
        br=empty("br"), ra=ra, id=id_tbl, entity_id=entity_id,
        ar=empty("ar"), re=empty("re"), prov=prov,
    )
    instructions = merged_ks.select(
        F.lit("ra/0").alias("surviving_entity"),
        _ra(F.col("k")).alias("merged_entity"),
    )
    return catalog, instructions
