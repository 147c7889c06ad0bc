"""SPARQL-update delta strings for provenance snapshots.

The reference's provenance layer attaches a SPARQL-update string to every
modifying snapshot (``oco:hasUpdateQuery``): oc_ocdm's ProvSet computes the
triple-level diff of each changed entity and renders it as
``DELETE DATA { GRAPH <g> { ... } }`` / ``INSERT DATA { GRAPH <g> { ... } }``
(reference run/meta_process.py:280-288 drives it; the exact string shape is
pinned by test/meta_process_test.py:295-310, which splits on
``INSERT DATA { GRAPH <https://w3id.org/oc/meta/br/> { `` and `` } }``).
Consumers use these deltas for time-travel: applying the INVERSE of a
snapshot's update restores the entity's previous state.

This module renders the same strings from COLUMN expressions — the diff is
computed relationally (the writer plans in plans/curation.py, plans/merge.py
and plans/editor.py know exactly which triples they add or remove), so the
rendering is a pure JVM-side string build, no UDFs, one expression per
snapshot row.  ``replay_update`` is the driver-side inverse used by tests
and by any consumer reconstructing prior states from a snapshot chain.

Vocabulary matches sources/export.py's OCDM mapping (public SPAR / FRBR /
FOAF / PRISM / DCTERMS ontologies) so a delta's triples are exactly the
lines the N-Quads exporter would add or drop for the same change.
"""

from __future__ import annotations

import re as _re

import pyspark.sql.functions as F
from pyspark.sql import Column

_BASE = "https://w3id.org/oc/meta/"

# predicate IRIs per entity-table column (the editor/curation delta surface)
PREDICATES = {
    "title": "http://purl.org/dc/terms/title",
    "pub_date": "http://prismstandard.org/namespaces/basic/2.0/publicationDate",
    "type": "http://purl.org/spar/fabio/type",
    "seq_id": "http://purl.org/spar/fabio/hasSequenceIdentifier",
    "part_of": "http://purl.org/vocab/frbr/core#partOf",
    "embodiment": "http://purl.org/vocab/frbr/core#embodiment",
    "name": "http://xmlns.com/foaf/0.1/name",
    "family": "http://xmlns.com/foaf/0.1/familyName",
    "given": "http://xmlns.com/foaf/0.1/givenName",
    "start_page": "http://prismstandard.org/namespaces/basic/2.0/startingPage",
    "end_page": "http://prismstandard.org/namespaces/basic/2.0/endingPage",
    "has_identifier": "http://purl.org/spar/datacite/hasIdentifier",
    "uses_scheme": "http://purl.org/spar/datacite/usesIdentifierScheme",
    "literal_value": "http://www.essepuntato.it/2010/06/literalreification/hasLiteralValue",
    "with_role": "http://purl.org/spar/pro/withRole",
    "is_held_by": "http://purl.org/spar/pro/isHeldBy",
    "is_doc_context_for": "http://purl.org/spar/pro/isDocumentContextFor",
}

# columns whose objects are entity references (rendered as URIs, not literals)
URI_OBJECT_COLUMNS = {"part_of", "embodiment", "has_identifier", "is_held_by", "is_doc_context_for"}


def _escape(col: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), '"', r"\\\""), "\n", r"\\n"
    )


def uri(omid: Column) -> Column:
    """omid ('br/0601') → '<https://w3id.org/oc/meta/br/0601>'."""
    return F.concat(F.lit(f"<{_BASE}"), omid, F.lit(">"))


def literal(value: Column) -> Column:
    return F.concat(F.lit('"'), _escape(value), F.lit('"'))


def triple(subj_omid: Column, column: str, obj: Column) -> Column:
    """One rendered triple for a table column's value; null when obj is
    null/empty (absent property ⇒ no triple, matching the exporter)."""
    pred = PREDICATES[column]
    rendered = uri(obj) if column in URI_OBJECT_COLUMNS else literal(obj)
    return F.when(
        F.nullif(obj.cast("string"), F.lit("")).isNotNull(),
        F.concat(uri(subj_omid), F.lit(f" <{pred}> "), rendered),
    )


def kind_graph(omid: Column) -> Column:
    """Named graph of the subject's kind: 'br/0601' → <.../br/> (the
    reference stores each kind in its own dataset graph)."""
    return F.concat(F.lit(f"<{_BASE}"), F.regexp_extract(omid, r"^([a-z]+)/", 1), F.lit("/>"))


def sparql_update(graph: Column, deletes: Column, inserts: Column) -> Column:
    """Render 'DELETE DATA { GRAPH <g> { t1 . t2 } }; INSERT DATA { ... }'
    from two array<string> triple columns.  Empty/absent parts are omitted;
    both empty ⇒ NULL (no update_query — e.g. a pure-creation snapshot)."""

    def block(kw: str, arr: Column) -> Column:
        return F.when(
            F.size(F.filter(arr, lambda t: t.isNotNull())) > 0,
            F.concat(
                F.lit(kw + " DATA { GRAPH "),
                graph,
                F.lit(" { "),
                F.array_join(F.filter(arr, lambda t: t.isNotNull()), " . "),
                F.lit(" } }"),
            ),
        )

    d = block("DELETE", F.coalesce(deletes, F.array().cast("array<string>")))
    i = block("INSERT", F.coalesce(inserts, F.array().cast("array<string>")))
    return F.when(d.isNotNull() & i.isNotNull(), F.concat_ws("; ", d, i)).otherwise(
        F.coalesce(d, i)
    )


def own_triple_rows(catalog) -> "DataFrame":  # noqa: F821 — duck-typed EntityCatalog
    """(entity_omid, t) — every entity's own triples, rendered exactly as a
    DELETE-DATA body line.  Used by full-entity invalidation snapshots
    (entity deletion, merge absorption): the snapshot's update_query is the
    DELETE of the union of these per entity.  Duck-typed over the catalog
    (attributes br/ra/re/id/entity_id/ar) to avoid a plans↔functions import
    cycle.  Pure projections + one union — callers should semi-join their
    target set BEFORE aggregating so only touched entities render."""

    def rows(df, subj: str, column: str, obj: Column | None = None):
        t = (
            triple(F.col(subj), column, F.col(column))
            if obj is None
            else F.when(obj.isNotNull(), F.concat(uri(F.col(subj)), obj))
        )
        return df.select(F.col(subj).alias("entity_omid"), t.alias("t")).filter(
            F.col("t").isNotNull()
        )

    datacite = "http://purl.org/spar/datacite/"
    pro = "http://purl.org/spar/pro/"
    parts = [
        rows(catalog.br, "omid", "title"),
        rows(catalog.br, "omid", "pub_date"),
        rows(catalog.br, "omid", "seq_id"),
        rows(catalog.br, "omid", "part_of"),
        rows(catalog.br, "omid", "embodiment"),
        rows(catalog.ra, "omid", "name"),
        rows(catalog.ra, "omid", "family"),
        rows(catalog.ra, "omid", "given"),
        rows(catalog.re, "omid", "start_page"),
        rows(catalog.re, "omid", "end_page"),
        rows(catalog.id, "omid", "literal_value", obj=F.concat(
            F.lit(f" <{PREDICATES['literal_value']}> "), literal(F.col("value")))),
        rows(catalog.id, "omid", "uses_scheme", obj=F.concat(
            F.lit(f" <{PREDICATES['uses_scheme']}> <{datacite}"), F.col("schema"), F.lit(">"))),
        rows(catalog.entity_id, "entity_omid", "has_identifier", obj=F.concat(
            F.lit(f" <{PREDICATES['has_identifier']}> "), uri(F.col("id_omid")))),
        rows(catalog.ar, "omid", "with_role", obj=F.concat(
            F.lit(f" <{PREDICATES['with_role']}> <{pro}"), F.col("role"), F.lit(">"))),
        rows(catalog.ar, "omid", "is_held_by", obj=F.concat(
            F.lit(f" <{PREDICATES['is_held_by']}> "), uri(F.col("ra_omid")))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Driver-side replay (tests / time-travel consumers).  Test-scale by design:
# it reconstructs ONE entity's prior triple set from one snapshot's delta.
# --------------------------------------------------------------------------
_BLOCK_RE = _re.compile(r"(DELETE|INSERT) DATA \{ GRAPH <[^>]*> \{ (.*?) \} \}")


def append_snapshots(prov, delta):  # type: (DataFrame, DataFrame) -> DataFrame
    """Append new snapshots and CLOSE each entity's previous head: oc_ocdm
    sets ``prov:invalidatedAtTime`` on snapshot *n* when *n+1* is
    generated, and the reference's post-merge audit checks exactly that
    every non-last snapshot carries an invalidation time
    (``run/merge/check_merged_ids_results.py:33-130``).  The previous
    head's ``invalidated_at`` becomes the new snapshot's
    ``generated_at``; already-closed snapshots are untouched.

    One equi-join on ``entity_omid`` — the delta side is the batch's
    entity set; at scale this is the read-modify-write a Delta MERGE
    would express (see SCALING.md store notes)."""
    head = delta.groupBy("entity_omid").agg(
        F.min("snapshot").alias("_new_n"),
        F.min("generated_at").alias("_new_ts"),
    )
    closed = (
        prov.join(head, "entity_omid", "left")
        .withColumn(
            "invalidated_at",
            F.when(
                (F.col("snapshot") == F.col("_new_n") - 1)
                & F.col("invalidated_at").isNull(),
                F.col("_new_ts"),
            ).otherwise(F.col("invalidated_at")),
        )
        .drop("_new_n", "_new_ts")
    )
    return closed.unionByName(delta)


def parse_update(update_query: str) -> tuple[set[str], set[str]]:
    """→ (deleted_triples, inserted_triples) as sets of rendered triples."""
    deleted: set[str] = set()
    inserted: set[str] = set()
    for kw, body in _BLOCK_RE.findall(update_query or ""):
        triples = {t.strip() for t in _split_triples(body) if t.strip()}
        (deleted if kw == "DELETE" else inserted).update(triples)
    return deleted, inserted


def _split_triples(body: str) -> list[str]:
    # ' . ' only separates triples (never appears inside a URI; inside a
    # quoted literal a '"' would precede it — good enough for OCDM strings,
    # whose literals are escaped by _escape above)
    return body.split(" . ")


def replay_update(current: set[str], update_query: str) -> set[str]:
    """Invert one snapshot's delta: prior = (current − inserted) ∪ deleted."""
    deleted, inserted = parse_update(update_query)
    return (current - inserted) | deleted
