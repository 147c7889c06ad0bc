"""Single-entity editing surface (reference core/editor.py MetaEditor:
update_property / delete; merge is covered by test_merge.py)."""

from __future__ import annotations

from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.plans.editor import delete_entities, delete_property, update_property
from oc_meta_spark.schemas import META_INPUT_COLUMNS


def _catalog(spark):
    rows = [
        {
            "id": "doi:10.1000/ed1",
            "title": "Editable Work",
            "author": "Fixer, F [orcid:0000-0002-1825-0097]",
            "pub_date": "2020",
            "venue": "Journal E [issn:2641-3337]",
            "volume": "1",
            "page": "5-9",
            "type": "journal article",
        }
    ]
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    result = curate(spark.createDataFrame(data, META_INPUT_COLUMNS), None, prefix="060")
    return EntityCatalog.empty(spark).union(result)


def test_update_property_rewrites_value_and_snapshots(spark):
    cat = _catalog(spark)
    work = next(r for r in cat.br.collect() if r["type"] == "journal article")
    updates = spark.createDataFrame(
        [(work["omid"], "2021-06")], "omid string, new_value string"
    )
    r = update_property(cat, updates, "pub_date", batch_ts="t1")
    got = next(x for x in r.catalog.br.collect() if x["omid"] == work["omid"])
    assert got["pub_date"] == "2021-06"
    # other rows untouched
    others = [x for x in r.catalog.br.collect() if x["omid"] != work["omid"]]
    assert others == [x for x in cat.br.collect() if x["omid"] != work["omid"]]
    snap = [p for p in r.prov_delta.collect()]
    assert len(snap) == 1 and snap[0]["entity_omid"] == work["omid"]
    assert snap[0]["snapshot"] == 2  # after the creation snapshot
    assert "pub_date" in snap[0]["description"]
    # full predicate IRIs route through the alias map
    r2 = update_property(
        r.catalog,
        spark.createDataFrame([(work["omid"], "Renamed")], "omid string, new_value string"),
        "http://purl.org/dc/terms/title",
        batch_ts="t2",
    )
    assert next(x for x in r2.catalog.br.collect() if x["omid"] == work["omid"])["title"] == "Renamed"


def test_delete_property_nulls_column(spark):
    cat = _catalog(spark)
    work = next(r for r in cat.br.collect() if r["type"] == "journal article")
    targets = spark.createDataFrame([(work["omid"],)], "omid string")
    r = delete_property(cat, targets, "pub_date", batch_ts="t1")
    got = next(x for x in r.catalog.br.collect() if x["omid"] == work["omid"])
    assert got["pub_date"] is None
    assert r.prov_delta.count() == 1


def test_delete_entity_strips_references_and_invalidates(spark):
    cat = _catalog(spark)
    ra = cat.ra.first()
    targets = spark.createDataFrame([(ra["omid"],)], "omid string")
    r = delete_entities(cat, targets, batch_ts="t9")
    # gone from live tables
    assert not [x for x in r.catalog.ra.collect() if x["omid"] == ra["omid"]]
    assert not [x for x in r.catalog.ar.collect() if x["ra_omid"] == ra["omid"]]
    assert not [
        x for x in r.catalog.entity_id.collect() if x["entity_omid"] == ra["omid"]
    ]
    # invalidation snapshot appended, history preserved
    snaps = sorted(
        (p["snapshot"], p["description"], p["invalidated_at"])
        for p in r.catalog.prov.collect()
        if p["entity_omid"] == ra["omid"]
    )
    assert snaps[0][1] == "entity created"
    assert snaps[-1] == (2, "entity deleted", "t9")


def test_delete_container_nulls_part_of(spark):
    cat = _catalog(spark)
    volume = next(r for r in cat.br.collect() if r["type"] == "journal volume")
    targets = spark.createDataFrame([(volume["omid"],)], "omid string")
    r = delete_entities(cat, targets, batch_ts="t9")
    assert not [x for x in r.catalog.br.collect() if x["omid"] == volume["omid"]]
    # the work that nested under it now has a dangling-free (null) part_of
    orphans = [x for x in r.catalog.br.collect() if x["part_of"] == volume["omid"]]
    assert orphans == []
