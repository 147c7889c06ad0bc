"""Post-merge audit (run/merge/check_merged_*_results analogs): a clean
merge audits clean; planted violations of each family are flagged; the
snapshot-closure discipline the audit checks is what the writers produce."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from oc_meta_spark.functions.prov_deltas import append_snapshots
from oc_meta_spark.plans.curation import EntityCatalog
from oc_meta_spark.plans.merge import apply_merges
from oc_meta_spark.plans.merge_audit import audit_merges
from oc_meta_spark.schemas import ENTITY_TABLES


def _full_catalog(spark):
    """A store with complete creation provenance for every entity."""
    br = spark.createDataFrame(
        [
            ("br/01", "journal article", "A", "2020", None, "br/09", None),
            ("br/02", "journal article", "B", "2020", None, None, None),
            ("br/03", "journal article", "C", "2021", None, None, None),
            ("br/04", "journal article", "D", "2022", None, "br/02", None),
            ("br/09", "journal", "J", None, None, None, None),
        ],
        ENTITY_TABLES["br"],
    )
    id_tbl = spark.createDataFrame(
        [("id/1", "doi", "10.1/a"), ("id/3", "pmid", "123"), ("id/4", "doi", "10.1/d")],
        ENTITY_TABLES["id"],
    )
    entity_id = spark.createDataFrame(
        [
            ("br/01", "id/1"),
            ("br/02", "id/1"),
            ("br/03", "id/3"),
            ("br/04", "id/4"),
            ("br/09", "id/3"),
        ],
        ENTITY_TABLES["entity_id"],
    )
    ar = spark.createDataFrame(
        [
            ("ar/1", "br/01", "author", "ra/1", 1),
            ("ar/2", "br/02", "author", "ra/1", 1),
            ("ar/3", "br/03", "author", "ra/2", 1),
        ],
        ENTITY_TABLES["ar"],
    )
    ra = spark.createDataFrame(
        [("ra/1", None, "Smith", "J"), ("ra/2", None, "Doe", "A")],
        ENTITY_TABLES["ra"],
    )
    re_tbl = spark.createDataFrame([], ENTITY_TABLES["re"])
    ents = ["br/01", "br/02", "br/03", "br/04", "br/09", "ra/1", "ra/2", "id/1", "id/3", "id/4", "ar/1", "ar/2", "ar/3"]
    prov = spark.createDataFrame(
        [(e, 1, "t0", None, [], "agent", None, "entity created", None) for e in ents],
        ENTITY_TABLES["prov"],
    )
    return EntityCatalog(br=br, ra=ra, id=id_tbl, entity_id=entity_id, ar=ar, re=re_tbl, prov=prov)


@pytest.fixture(scope="module")
def merged(spark):
    cat = _full_catalog(spark)
    instr = spark.createDataFrame(
        [("br/01", "br/02"), ("br/01", "br/03")],
        "surviving_entity string, merged_entity string",
    )
    return apply_merges(cat, instr, batch_ts="t1"), instr


def test_clean_merge_audits_clean(merged):
    res, instr = merged
    issues = audit_merges(res.catalog, instr).collect()
    assert issues == [], sorted((i.omid, i.issue) for i in issues)


def test_writers_close_previous_snapshots(merged):
    res, _ = merged
    snaps = {
        (p.entity_omid, p.snapshot): p.invalidated_at
        for p in res.catalog.prov.collect()
    }
    # every superseded snapshot closed with the new snapshot's time
    assert snaps[("br/01", 1)] == "t1" and snaps[("br/02", 1)] == "t1"
    # heads: survivor open, merged invalidated
    assert snaps[("br/01", 2)] is None
    assert snaps[("br/02", 2)] == "t1"
    # untouched entity stays open
    assert snaps[("br/04", 1)] is None


def test_planted_violations_flagged(spark, merged):
    res, instr = merged
    cat = res.catalog
    # plant: merged row resurrected; dangling AR reference to a merged br;
    # survivor loses its identifier links; br/02 loses its creation snapshot
    bad = EntityCatalog(
        br=cat.br.unionByName(
            spark.createDataFrame(
                [("br/02", "journal article", "B", "2020", None, None, None)],
                ENTITY_TABLES["br"],
            )
        ),
        ra=cat.ra,
        id=cat.id,
        entity_id=cat.entity_id.filter(F.col("entity_omid") != "br/01"),
        ar=cat.ar.unionByName(
            spark.createDataFrame([("ar/9", "br/03", "author", "ra/2", 1)], ENTITY_TABLES["ar"])
        ),
        re=cat.re,
        prov=cat.prov.filter(
            ~((F.col("entity_omid") == "br/02") & (F.col("snapshot") == 1))
        ),
    )
    found = {(i.omid, i.issue) for i in audit_merges(bad, instr).collect()}
    expected = {
        ("br/02", "merged entity still exists"),
        ("br/03", "merged entity still referenced"),
        ("br/01", "br has no identifier"),
        ("br/02", "fewer than two snapshots"),
        ("br/02", "non-contiguous snapshot numbers"),
    }
    assert expected <= found, found - expected or found
    # nothing unexpected beyond the planted families
    assert {i for _, i in found} == {i for _, i in expected}, found


def test_append_snapshots_only_closes_predecessor(spark):
    prov = spark.createDataFrame(
        [
            ("br/01", 1, "t0", "t0b", [], "a", None, "entity created", None),
            ("br/01", 2, "t0b", None, ["br/01"], "a", None, "modified", None),
            ("br/02", 1, "t0", None, [], "a", None, "entity created", None),
        ],
        ENTITY_TABLES["prov"],
    )
    delta = spark.createDataFrame(
        [("br/01", 3, "t2", None, ["br/01"], "a", None, "modified", None)],
        ENTITY_TABLES["prov"],
    )
    rows = {(p.entity_omid, p.snapshot): p.invalidated_at for p in append_snapshots(prov, delta).collect()}
    assert rows[("br/01", 1)] == "t0b"  # already closed — untouched
    assert rows[("br/01", 2)] == "t2"  # predecessor closed with new time
    assert rows[("br/01", 3)] is None
    assert rows[("br/02", 1)] is None  # unrelated entity untouched


def test_merge_snapshot_must_be_multi_derived(spark, merged):
    """Round-5 fix: a merge-described snapshot deriving ONLY from itself
    passes the derived_from[0]==self check but is still a broken merge
    record — the reference marks merges by >=2 wasDerivedFrom
    (run/find/merged_entities.py:23-65)."""
    res, instr = merged
    cat = res.catalog
    is_merge_head = (F.col("entity_omid") == "br/01") & (F.col("snapshot") == 2)
    bad_prov = cat.prov.withColumn(
        "derived_from",
        F.when(is_merge_head, F.array(F.lit("br/01"))).otherwise(F.col("derived_from")),
    )
    bad = EntityCatalog(
        br=cat.br, ra=cat.ra, id=cat.id, entity_id=cat.entity_id,
        ar=cat.ar, re=cat.re, prov=bad_prov,
    )
    found = {(i.omid, i.issue) for i in audit_merges(bad, instr).collect()}
    assert ("br/01", "merge snapshot not multi-derived") in found
    # and ONLY that new issue appears: self-derivation chain is intact
    assert ("br/01", "snapshot not derived from own chain") not in found
