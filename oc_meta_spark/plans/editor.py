"""Single-entity editing — the Spark-native MetaEditor surface (reference
core/editor.py: update_property :90-111, delete :113-188; merge lives in
plans/merge.py).

The reference edits one entity at a time through oc_ocdm graph objects and
re-saves RDF + provenance.  Here an edit is a COLUMNAR rewrite of the one
entity table that owns the property, plus a provenance snapshot, returning
a new catalog — same shape as plans/merge.py's apply_merges.  Edits are
batched by nature: ``updates`` is a DataFrame of (omid, new_value) pairs,
so a million-row repair job is the same plan as a single fix.

Property → table/column routing mirrors the OCDM property map the
reference dispatches on (editor.py property_to_remove_method and the
oc_ocdm setter names): dcterms:title → br.title, prism:publicationDate →
br.pub_date, fabio:hasSequenceIdentifier → br.seq_id, frbr:partOf →
br.part_of, frbr:embodiment → br.embodiment, foaf names → ra.*, prism
pages → re.*.
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
)
from oc_meta_spark.plans.curation import EntityCatalog

# property name → (table, column).  Keys are the short OCDM-ish names the
# engine's entity tables use; callers holding full predicate IRIs map them
# through PREDICATE_ALIASES first.
PROPERTY_MAP = {
    "title": ("br", "title"),
    "pub_date": ("br", "pub_date"),
    "type": ("br", "type"),
    "seq_id": ("br", "seq_id"),
    "part_of": ("br", "part_of"),
    "embodiment": ("br", "embodiment"),
    "name": ("ra", "name"),
    "family": ("ra", "family"),
    "given": ("ra", "given"),
    "start_page": ("re", "start_page"),
    "end_page": ("re", "end_page"),
}

PREDICATE_ALIASES = {
    "http://purl.org/dc/terms/title": "title",
    "http://prismstandard.org/namespaces/basic/2.0/publicationDate": "pub_date",
    "http://purl.org/spar/fabio/hasSequenceIdentifier": "seq_id",
    "http://purl.org/vocab/frbr/core#partOf": "part_of",
    "http://purl.org/vocab/frbr/core#embodiment": "embodiment",
    "http://xmlns.com/foaf/0.1/name": "name",
    "http://xmlns.com/foaf/0.1/familyName": "family",
    "http://xmlns.com/foaf/0.1/givenName": "given",
    "http://prismstandard.org/namespaces/basic/2.0/startingPage": "start_page",
    "http://prismstandard.org/namespaces/basic/2.0/endingPage": "end_page",
}


@dataclass
class EditResult:
    catalog: EntityCatalog
    prov_delta: DataFrame


def _mod_prov(
    catalog: EntityCatalog, touched: DataFrame, description: str, resp_agent: str, batch_ts: str
) -> DataFrame:
    """One modification snapshot per touched entity, numbered after the
    entity's current max snapshot (derived_from = the entity itself).
    ``touched`` carries (entity_omid, update_query) — the SPARQL-update
    delta of the modification, the reference's oco:hasUpdateQuery
    (functions/prov_deltas.py; ProvSet behavior per run/meta_process.py:
    280-288)."""
    if "update_query" not in touched.columns:
        touched = touched.withColumn("update_query", F.lit(None).cast("string"))
    prev = catalog.prov.groupBy("entity_omid").agg(F.max("snapshot").alias("prev_n"))
    return touched.join(prev, "entity_omid", "left").select(
        "entity_omid",
        (F.coalesce("prev_n", F.lit(0)) + 1).cast("int").alias("snapshot"),
        F.lit(batch_ts).alias("generated_at"),
        F.lit(None).cast("string").alias("invalidated_at"),
        F.array(F.col("entity_omid")).cast("array<string>").alias("derived_from"),
        F.lit(resp_agent).alias("resp_agent"),
        F.lit(None).cast("string").alias("primary_source"),
        F.lit(description).alias("description"),
        "update_query",
    )


def _replace(catalog: EntityCatalog, table: str, df: DataFrame, prov_delta: DataFrame) -> EntityCatalog:
    kwargs = {
        f: getattr(catalog, f)
        for f in ("br", "ra", "id", "entity_id", "ar", "re", "prov", "counters")
    }
    kwargs[table] = df
    kwargs["prov"] = append_snapshots(catalog.prov, prov_delta)
    return EntityCatalog(**kwargs)


def update_property(
    catalog: EntityCatalog,
    updates: DataFrame,
    prop: str,
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
) -> EditResult:
    """Set ``prop`` to a new value for every (omid, new_value) row in
    ``updates`` (reference update_property, editor.py:90-111 — one call,
    any number of entities).  Unknown omids are ignored (the reference
    raises only on triplestore import failure, which has no analog here).
    """
    prop = PREDICATE_ALIASES.get(prop, prop)
    table, column = PROPERTY_MAP[prop]
    target = getattr(catalog, table)
    upd = updates.select(F.col("omid").alias("u_omid"), F.col("new_value").alias("u_val"))
    out = (
        target.join(upd, target.omid == F.col("u_omid"), "left")
        .withColumn(column, F.when(F.col("u_omid").isNotNull(), F.col("u_val")).otherwise(F.col(column)))
        .drop("u_omid", "u_val")
    )
    # delta: DELETE the old triple (when one existed), INSERT the new one
    touched = (
        target.join(upd, target.omid == F.col("u_omid"))
        .select(
            F.col("omid").alias("entity_omid"),
            sparql_update(
                kind_graph(F.col("omid")),
                F.array(triple(F.col("omid"), column, F.col(column))),
                F.array(triple(F.col("omid"), column, F.col("u_val"))),
            ).alias("update_query"),
        )
    )
    prov = _mod_prov(catalog, touched, f"property '{prop}' updated", resp_agent, batch_ts)
    return EditResult(_replace(catalog, table, out, prov), prov)


def delete_property(
    catalog: EntityCatalog,
    targets: DataFrame,
    prop: str,
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
) -> EditResult:
    """Remove ``prop`` from every omid in ``targets`` (reference delete
    with a property argument, editor.py:144-171: dispatches to the
    entity's remove_* method — here a null-out of the owning column)."""
    prop = PREDICATE_ALIASES.get(prop, prop)
    table, column = PROPERTY_MAP[prop]
    target = getattr(catalog, table)
    t = targets.select(F.col("omid").alias("u_omid"))
    out = (
        target.join(t, target.omid == F.col("u_omid"), "left")
        .withColumn(column, F.when(F.col("u_omid").isNotNull(), F.lit(None)).otherwise(F.col(column)))
        .drop("u_omid")
    )
    # delta: DELETE the removed triple (when one existed)
    touched = (
        target.join(t, target.omid == F.col("u_omid"))
        .select(
            F.col("omid").alias("entity_omid"),
            sparql_update(
                kind_graph(F.col("omid")),
                F.array(triple(F.col("omid"), column, F.col(column))),
                F.array().cast("array<string>"),
            ).alias("update_query"),
        )
    )
    prov = _mod_prov(catalog, touched, f"property '{prop}' deleted", resp_agent, batch_ts)
    return EditResult(_replace(catalog, table, out, prov), prov)


def delete_entities(
    catalog: EntityCatalog,
    targets: DataFrame,
    resp_agent: str = "oc_meta_spark",
    batch_ts: str = "1970-01-01T00:00:00Z",
) -> EditResult:
    """Full entity deletion (reference delete with no property,
    editor.py:172-188): the entity leaves every live table, inbound
    references are stripped (br.part_of / br.embodiment nulled, ar rows
    held by or contexting the entity removed, identifier links dropped),
    and an invalidation snapshot closes the provenance chain — deleted
    entities stay visible in history, like merged ones."""
    # Unhinted: deletion target lists are usually tiny (AQE broadcasts them
    # at runtime), but a bulk purge could be arbitrarily large — a static
    # broadcast hint would force executor OOM in that case.
    t = targets.select(F.col("omid").alias("gone"))

    def drop_rows(df: DataFrame, col: str = "omid") -> DataFrame:
        return df.join(t, df[col] == F.col("gone"), "left_anti")

    def null_ref(df: DataFrame, col: str) -> DataFrame:
        return (
            df.join(t, df[col] == F.col("gone"), "left")
            .withColumn(col, F.when(F.col("gone").isNotNull(), F.lit(None)).otherwise(F.col(col)))
            .drop("gone")
        )

    br = null_ref(null_ref(drop_rows(catalog.br), "part_of"), "embodiment")
    ra = drop_rows(catalog.ra)
    re = drop_rows(catalog.re)
    ids = drop_rows(catalog.id)
    entity_id = drop_rows(drop_rows(catalog.entity_id, "entity_omid"), "id_omid")
    ar = drop_rows(drop_rows(drop_rows(catalog.ar), "br_omid"), "ra_omid")

    # delta: DELETE DATA of every triple the entity owned (reference: the
    # invalidating snapshot's update query removes the entity's graph)
    gone_triples = (
        own_triple_rows(catalog)
        .join(targets.select(F.col("omid").alias("entity_omid")), "entity_omid", "left_semi")
        .groupBy("entity_omid")
        .agg(F.sort_array(F.collect_list("t")).alias("ts"))
    )
    prev = catalog.prov.groupBy("entity_omid").agg(F.max("snapshot").alias("prev_n"))
    prov_delta = (
        targets.select(F.col("omid").alias("entity_omid"))
        .join(prev, "entity_omid", "left")
        .join(gone_triples, "entity_omid", "left")
        .select(
            "entity_omid",
            (F.coalesce("prev_n", F.lit(0)) + 1).cast("int").alias("snapshot"),
            F.lit(batch_ts).alias("generated_at"),
            F.lit(batch_ts).alias("invalidated_at"),
            F.array(F.col("entity_omid")).cast("array<string>").alias("derived_from"),
            F.lit(resp_agent).alias("resp_agent"),
            F.lit(None).cast("string").alias("primary_source"),
            F.lit("entity deleted").alias("description"),
            sparql_update(
                kind_graph(F.col("entity_omid")),
                F.coalesce(F.col("ts"), F.array().cast("array<string>")),
                F.array().cast("array<string>"),
            ).alias("update_query"),
        )
    )
    new_catalog = EntityCatalog(
        br=br,
        ra=ra,
        id=ids,
        entity_id=entity_id,
        ar=ar,
        re=re,
        prov=append_snapshots(catalog.prov, prov_delta),
        counters=catalog.counters,
    )
    return EditResult(new_catalog, prov_delta)
