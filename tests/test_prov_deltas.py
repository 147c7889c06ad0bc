"""Provenance update-delta tests (reference ProvSet behavior: every
modifying snapshot carries a SPARQL-update string, run/meta_process.py:
280-288; string shape pinned by test/meta_process_test.py:295-310) plus
non-Expression merge absorption (core/editor.py:266-276: prefer_self only
for Expression pairs; other kinds fill the survivor's gaps)."""

from __future__ import annotations

import pyspark.sql.functions as F

from oc_meta_spark.functions.prov_deltas import (
    own_triple_rows,
    parse_update,
    replay_update,
)
from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.plans.editor import delete_entities, delete_property, update_property
from oc_meta_spark.plans.merge import apply_merges
from oc_meta_spark.schemas import ENTITY_TABLES, META_INPUT_COLUMNS


def _entity_triples(catalog: EntityCatalog, omid: str) -> set[str]:
    return {
        r["t"]
        for r in own_triple_rows(catalog).filter(F.col("entity_omid") == omid).collect()
    }


def _curated_catalog(spark) -> EntityCatalog:
    rows = [
        {
            "id": "doi:10.1000/pd1",
            "title": "Delta Work",
            "author": "Prov, P [orcid:0000-0002-1825-0097]",
            "pub_date": "2020",
            "venue": "Journal D [issn:2641-3337]",
            "type": "journal article",
        }
    ]
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    result = curate(spark.createDataFrame(data, META_INPUT_COLUMNS), None, prefix="060")
    return EntityCatalog.empty(spark).union(result)


def test_update_property_delta_and_replay(spark):
    cat = _curated_catalog(spark)
    work = next(r for r in cat.br.collect() if r["type"] == "journal article")
    updates = spark.createDataFrame([(work["omid"], "2021-06")], "omid string, new_value string")
    r = update_property(cat, updates, "pub_date", batch_ts="t1")
    snap = r.prov_delta.first()
    uq = snap["update_query"]
    deleted, inserted = parse_update(uq)
    base = f"<https://w3id.org/oc/meta/{work['omid']}>"
    pred = "<http://prismstandard.org/namespaces/basic/2.0/publicationDate>"
    assert f'{base} {pred} "2020"' in deleted
    assert f'{base} {pred} "2021-06"' in inserted
    assert uq.startswith("DELETE DATA { GRAPH <https://w3id.org/oc/meta/br/> { ")
    # time travel: inverse of the delta restores the prior triple set
    now = _entity_triples(r.catalog, work["omid"])
    assert replay_update(now, uq) == _entity_triples(cat, work["omid"])


def test_delete_property_delta_is_pure_delete(spark):
    cat = _curated_catalog(spark)
    work = next(r for r in cat.br.collect() if r["type"] == "journal article")
    targets = spark.createDataFrame([(work["omid"],)], "omid string")
    r = delete_property(cat, targets, "pub_date", batch_ts="t1")
    deleted, inserted = parse_update(r.prov_delta.first()["update_query"])
    assert inserted == set()
    assert any('"2020"' in t for t in deleted)
    now = _entity_triples(r.catalog, work["omid"])
    assert replay_update(now, r.prov_delta.first()["update_query"]) == _entity_triples(
        cat, work["omid"]
    )


def test_delete_entities_delta_removes_own_graph(spark):
    cat = _curated_catalog(spark)
    ra = cat.ra.first()
    before = _entity_triples(cat, ra["omid"])
    r = delete_entities(cat, spark.createDataFrame([(ra["omid"],)], "omid string"), batch_ts="t9")
    snap = next(p for p in r.prov_delta.collect() if p["entity_omid"] == ra["omid"])
    deleted, inserted = parse_update(snap["update_query"])
    assert inserted == set()
    assert deleted == before and len(before) > 0
    # replay from the post-delete (empty) graph restores the entity
    assert replay_update(set(), snap["update_query"]) == before


def _merge_catalog(spark) -> EntityCatalog:
    """Two RAs sharing an ORCID (non-Expression merge: absorption) and two
    BRs sharing a DOI (Expression merge: prefer_self)."""
    br = spark.createDataFrame(
        [
            ("br/01", "journal article", "Kept Title", "2020", None, None, None),
            ("br/02", "journal article", "Dropped Title", "2021", None, None, None),
        ],
        ENTITY_TABLES["br"],
    )
    ra = spark.createDataFrame(
        [
            ("ra/01", None, "Smith", None),  # survivor lacks given
            ("ra/02", None, "Smith", "Jane"),  # merged donor has it
        ],
        ENTITY_TABLES["ra"],
    )
    id_tbl = spark.createDataFrame(
        [
            ("id/1", "doi", "10.1/x"),
            ("id/2", "orcid", "0000-0002-1825-0097"),
        ],
        ENTITY_TABLES["id"],
    )
    entity_id = spark.createDataFrame(
        [
            ("br/01", "id/1"),
            ("br/02", "id/1"),
            ("ra/01", "id/2"),
            ("ra/02", "id/2"),
        ],
        ENTITY_TABLES["entity_id"],
    )
    ar = spark.createDataFrame(
        [("ar/1", "br/01", "author", "ra/01", 1), ("ar/2", "br/02", "author", "ra/02", 1)],
        ENTITY_TABLES["ar"],
    )
    re_tbl = spark.createDataFrame([], ENTITY_TABLES["re"])
    prov = spark.createDataFrame([], ENTITY_TABLES["prov"])
    return EntityCatalog(br=br, ra=ra, id=id_tbl, entity_id=entity_id, ar=ar, re=re_tbl, prov=prov)


def test_merge_absorption_non_expression(spark):
    cat = _merge_catalog(spark)
    instructions = spark.createDataFrame(
        [("ra/01", "ra/02"), ("br/01", "br/02")],
        "surviving_entity string, merged_entity string",
    )
    r = apply_merges(cat, instructions, batch_ts="tm")
    # RA (non-Expression): survivor absorbs the merged entity's given name
    survivor = next(x for x in r.catalog.ra.collect() if x["omid"] == "ra/01")
    assert survivor["given"] == "Jane"
    assert not [x for x in r.catalog.ra.collect() if x["omid"] == "ra/02"]
    # BR (both Expressions): prefer_self — survivor's values untouched
    kept = next(x for x in r.catalog.br.collect() if x["omid"] == "br/01")
    assert kept["title"] == "Kept Title" and kept["pub_date"] == "2020"
    # survivor's merge snapshot INSERTs the absorbed literal
    snap = next(
        p for p in r.prov_delta.collect()
        if p["entity_omid"] == "ra/01" and len(p["derived_from"]) >= 2
    )
    _, inserted = parse_update(snap["update_query"])
    assert '<https://w3id.org/oc/meta/ra/01> <http://xmlns.com/foaf/0.1/givenName> "Jane"' in inserted
    # merged entity's invalidation snapshot DELETEs its own graph
    inval = next(p for p in r.prov_delta.collect() if p["entity_omid"] == "ra/02")
    deleted, ins2 = parse_update(inval["update_query"])
    assert ins2 == set()
    assert any("familyName" in t and '"Smith"' in t for t in deleted)


def test_merge_survivor_gains_moved_identifier_links(spark):
    cat = _merge_catalog(spark)
    # give the merged BR an identifier the survivor lacks
    extra_id = spark.createDataFrame([("id/9", "pmid", "999")], ENTITY_TABLES["id"])
    extra_link = spark.createDataFrame([("br/02", "id/9")], ENTITY_TABLES["entity_id"])
    cat = EntityCatalog(
        br=cat.br,
        ra=cat.ra,
        id=cat.id.unionByName(extra_id),
        entity_id=cat.entity_id.unionByName(extra_link),
        ar=cat.ar,
        re=cat.re,
        prov=cat.prov,
    )
    instructions = spark.createDataFrame(
        [("br/01", "br/02")], "surviving_entity string, merged_entity string"
    )
    r = apply_merges(cat, instructions, batch_ts="tm")
    snap = next(p for p in r.prov_delta.collect() if p["entity_omid"] == "br/01")
    _, inserted = parse_update(snap["update_query"])
    assert (
        "<https://w3id.org/oc/meta/br/01> <http://purl.org/spar/datacite/hasIdentifier> "
        "<https://w3id.org/oc/meta/id/9>" in inserted
    )
    # id/1 was already owned by the survivor — not re-inserted
    assert not any("id/1" in t for t in inserted)


def test_curation_modified_snapshot_carries_insert_delta(spark):
    cat = _curated_catalog(spark)
    # re-curate the same work with an extra identifier → 'entity modified'
    rows = [
        {
            "id": "doi:10.1000/pd1 pmid:424242",
            "title": "Delta Work",
            "pub_date": "2020",
            "type": "journal article",
        }
    ]
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    result = curate(spark.createDataFrame(data, META_INPUT_COLUMNS), cat, prefix="060")
    mods = [p for p in result.prov_new.collect() if p["description"] == "entity modified"]
    assert mods, "adding an id to an existing BR must emit a modified snapshot"
    uq = next(p["update_query"] for p in mods if p["update_query"])
    deleted, inserted = parse_update(uq)
    assert deleted == set()
    assert any("hasIdentifier" in t for t in inserted)
