"""Patch-family repairs (reference run/patches): provenance backfill and
duplicate-partOf resolution."""

from __future__ import annotations

import pyspark.sql.functions as F

from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.plans.editor import update_property
from oc_meta_spark.plans.patches import add_missing_provenance, fix_duplicate_part_of
from oc_meta_spark.schemas import META_INPUT_COLUMNS


def _catalog(spark):
    rows = [
        {
            "id": "doi:10.2000/p1",
            "title": "Patched Work",
            "author": "Mender, M",
            "pub_date": "2019",
            "venue": "Journal P [issn:2049-3630]",
            "volume": "4",
            "issue": "2",
            "type": "journal article",
        },
        {
            "id": "doi:10.2000/p2",
            "title": "Second Work",
            "pub_date": "2020",
            "venue": "Journal P [issn:2049-3630]",
            "volume": "4",
            "type": "journal article",
        },
    ]
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    result = curate(spark.createDataFrame(data, META_INPUT_COLUMNS), None, prefix="060")
    return EntityCatalog.empty(spark).union(result)


def test_add_missing_provenance_backfills_se1(spark):
    cat = _catalog(spark)
    # seed two inconsistencies: one entity loses ALL its prov, another
    # keeps only snapshot 2 (the reference's missing-se/1 case)
    brs = sorted(r["omid"] for r in cat.br.collect())
    gone_all, gone_first = brs[0], brs[1]
    kwargs = {
        f: getattr(cat, f)
        for f in ("br", "ra", "id", "entity_id", "ar", "re", "prov", "counters")
    }
    kwargs["prov"] = cat.prov.filter(
        ~(
            (F.col("entity_omid") == gone_all)
            | ((F.col("entity_omid") == gone_first) & (F.col("snapshot") == 1))
        )
    ).unionByName(
        spark.createDataFrame(
            [(gone_first, 2, "t2", None, [gone_first], "x", None, "entity modified", None)],
            cat.prov.schema,
        )
    )
    broken = EntityCatalog(**kwargs)

    r = add_missing_provenance(broken, batch_ts="t-fix")
    created = {c["entity_omid"]: c for c in r.created.collect()}
    assert set(created) == {gone_all, gone_first}
    assert all(c["snapshot"] == 1 and c["description"] == "entity created" for c in created.values())
    assert all(c["generated_at"] == "t-fix" for c in created.values())
    # idempotent: a second pass finds nothing
    assert add_missing_provenance(r.catalog).created.count() == 0
    # healthy entities untouched
    before = broken.prov.count()
    assert r.catalog.prov.count() == before + 2


def test_fix_duplicate_part_of_keeps_most_specific_same_venue(spark):
    cat = _catalog(spark)
    br = {(r["type"], r["seq_id"]): r["omid"] for r in cat.br.collect()}
    work = next(r["omid"] for r in cat.br.collect() if r["title"] == "Patched Work")
    issue = br[("journal issue", "2")]
    volume = br[("journal volume", "4")]
    journal = next(r["omid"] for r in cat.br.collect() if r["type"] == "journal")
    # anomaly: the work claims partOf BOTH its issue and its volume (and
    # the import would have kept only one) — same terminal venue
    edges = spark.createDataFrame(
        [(work, issue), (work, volume)], "br_omid string, container_omid string"
    )
    r = fix_duplicate_part_of(cat, edges)
    rep = r.report.collect()
    assert len(rep) == 1
    row = rep[0]
    assert row["status"] == "fixed"
    assert row["kept"] == issue  # issue beats volume on specificity
    assert row["removed"] == [volume]
    assert row["venues"] == [journal]
    # the updates frame routes through the editor surface
    out = update_property(cat, r.updates, "part_of", batch_ts="t-fix")
    assert (
        next(x for x in out.catalog.br.collect() if x["omid"] == work)["part_of"] == issue
    )


def test_fix_duplicate_part_of_conflicting_venues_defers(spark):
    cat = _catalog(spark)
    work = next(r["omid"] for r in cat.br.collect() if r["title"] == "Patched Work")
    volume = next(
        r["omid"] for r in cat.br.collect() if r["type"] == "journal volume"
    )
    # second container chain terminates at a DIFFERENT (foreign) venue —
    # not resolvable automatically
    edges = spark.createDataFrame(
        [(work, volume), (work, "br/069999")], "br_omid string, container_omid string"
    )
    r = fix_duplicate_part_of(cat, edges)
    row = r.report.collect()[0]
    assert row["status"] == "manual_review"
    assert row["kept"] is None
    assert row["removed"] == []
    assert r.updates.count() == 0


def test_fix_duplicate_part_of_single_container_is_not_a_case(spark):
    cat = _catalog(spark)
    work = next(r["omid"] for r in cat.br.collect() if r["title"] == "Second Work")
    volume = next(r["omid"] for r in cat.br.collect() if r["type"] == "journal volume")
    edges = spark.createDataFrame([(work, volume)], "br_omid string, container_omid string")
    r = fix_duplicate_part_of(cat, edges)
    assert r.report.count() == 0 and r.updates.count() == 0
