"""Tests of the duplicate-find + merge pipeline (SURVEY D9-D13)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from oc_meta_spark.plans.curation import EntityCatalog
from oc_meta_spark.plans.merge import (
    apply_merges,
    find_duplicate_entities,
    find_duplicate_ids,
    merge_history,
    plan_merges,
)
from oc_meta_spark.schemas import ENTITY_TABLES


def _catalog(spark):
    """Three BRs where A~B share a DOI and B~C share a PMID (transitive),
    one isolated BR, plus a duplicated ID pair and inbound references."""
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
        [
            ("id/1", "doi", "10.1/a"),
            ("id/2", "doi", "10.1/a"),  # duplicated ID entity (D9)
            ("id/3", "pmid", "123"),
            ("id/4", "doi", "10.1/d"),
        ],
        ENTITY_TABLES["id"],
    )
    entity_id = spark.createDataFrame(
        [
            ("br/01", "id/1"),
            ("br/02", "id/2"),  # same (doi, 10.1/a) → A~B
            ("br/02", "id/3"),
            ("br/03", "id/3"),  # same pmid → B~C
            ("br/04", "id/4"),
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
    ra = spark.createDataFrame([("ra/1", None, "Smith", "J"), ("ra/2", None, "Doe", "A")], ENTITY_TABLES["ra"])
    re_tbl = spark.createDataFrame([], ENTITY_TABLES["re"])
    prov = spark.createDataFrame(
        [("br/01", 1, "t0", None, [], "agent", None, "entity created", None)],
        ENTITY_TABLES["prov"],
    )
    return EntityCatalog(br=br, ra=ra, id=id_tbl, entity_id=entity_id, ar=ar, re=re_tbl, prov=prov)


@pytest.fixture(scope="module")
def catalog(spark):
    return _catalog(spark)


def test_find_duplicate_ids(catalog):
    dups = find_duplicate_ids(catalog).collect()
    assert len(dups) == 1
    d = dups[0]
    assert (d["schema"], d["value"]) == ("doi", "10.1/a")
    assert d["surviving_id"] == "id/1" and d["merged_ids"] == ["id/2"]


def test_find_duplicate_entities_transitive(catalog):
    ents = find_duplicate_entities(catalog).collect()
    comps = {}
    for e in ents:
        comps.setdefault(e["component"], set()).add(e["entity_omid"])
    # A~B (doi) and B~C (pmid) must land in ONE component of size 3.
    assert len(comps) == 1
    assert set(next(iter(comps.values()))) == {"br/01", "br/02", "br/03"}


def test_plan_and_apply_merges(catalog):
    dups = find_duplicate_entities(catalog)
    instr = plan_merges(dups)
    pairs = {(r["surviving_entity"], r["merged_entity"]) for r in instr.collect()}
    assert pairs == {("br/01", "br/02"), ("br/01", "br/03")}

    res = apply_merges(catalog, instr)
    new = res.catalog
    # merged rows gone, survivor + unrelated rows remain
    brs = {r["omid"] for r in new.br.collect()}
    assert brs == {"br/01", "br/04", "br/09"}
    # identifier links moved to the survivor
    links = {(r["entity_omid"], r["id_omid"]) for r in new.entity_id.collect()}
    assert ("br/01", "id/2") in links and ("br/01", "id/3") in links
    assert not any(e in ("br/02", "br/03") for e, _ in links)
    # inbound containment reference rewritten (br/04 pointed at br/02)
    b4 = next(r for r in new.br.collect() if r["omid"] == "br/01" or r["omid"] == "br/04")
    part_ofs = {r["omid"]: r["part_of"] for r in new.br.collect()}
    assert part_ofs["br/04"] == "br/01"
    # AR chains: survivor keeps its chain; duplicate (br, role, ra) collapsed
    ars = [(r["br_omid"], r["role"], r["ra_omid"]) for r in new.ar.collect()]
    assert ars.count(("br/01", "author", "ra/1")) == 1
    assert ("br/01", "author", "ra/2") in ars  # from merged br/03
    # provenance: merge snapshot with >=2 derived_from on the survivor
    snaps = res.prov_delta.collect()
    merge_snaps = [s for s in snaps if s["description"] == "entities merged"]
    assert len(merge_snaps) == 1
    m = merge_snaps[0]
    assert m["entity_omid"] == "br/01"
    assert set(m["derived_from"]) == {"br/01", "br/02", "br/03"}
    inval = [s for s in snaps if s["invalidated_at"] is not None]
    assert {s["entity_omid"] for s in inval} == {"br/02", "br/03"}
    # survivor's snapshot number continues from its history (had snapshot 1)
    assert m["snapshot"] == 2


def test_merge_history_chains(spark, catalog):
    dups = find_duplicate_entities(catalog)
    res = apply_merges(catalog, plan_merges(dups))
    hist = {r["merged_entity"]: r["final_survivor"] for r in merge_history(res.catalog.prov).collect()}
    assert hist == {"br/02": "br/01", "br/03": "br/01"}


def test_apply_merges_has_no_static_broadcast_hint(spark):
    """Scale pin (round-5 fix): the merged→survivor mapping and the
    _absorb donor table are unbounded in a corpus-scale dedup campaign,
    so the merge path must NOT carry an explicit broadcast hint — a
    static ``F.broadcast`` cannot be overridden by AQE and becomes an
    executor-OOM trigger at 10^8 ids.  AQE still broadcasts at runtime
    when the side is actually small; this asserts nobody re-adds the
    hint (it shows up as ResolvedHint in the analyzed logical plan)."""
    cat = _catalog(spark)
    instr = spark.createDataFrame(
        [("br/01", "br/02")], ["surviving_entity", "merged_entity"]
    )
    res = apply_merges(cat, instr)
    for name in ("br", "ra", "re", "entity_id", "ar", "prov"):
        df = getattr(res.catalog, name)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, f"{name}: static broadcast hint\n{analyzed[:2000]}"


def test_apply_merges_chain_collapse(spark):
    """Instructions with chains (C→B, B→A) must resolve to A directly."""
    cat = _catalog(spark)
    instr = spark.createDataFrame(
        [("br/02", "br/03"), ("br/01", "br/02")],
        ["surviving_entity", "merged_entity"],
    )
    res = apply_merges(cat, instr)
    links = {(r["entity_omid"], r["id_omid"]) for r in res.catalog.entity_id.collect()}
    # br/03's pmid link lands on br/01, not the intermediate br/02
    assert ("br/01", "id/3") in links
    assert not any(e == "br/02" for e, _ in links)


def test_apply_merges_skewed_hub_survivor(spark):
    """Skew stress for the de-hinted merge path (round-6): ONE survivor
    absorbs 10^4 merged entities — the hub-author shape the reference
    benchmarks with ``--preload-high-authors 2869`` (ATLAS collaboration,
    run/benchmark/benchmark.py).  After round 5 removed the static
    broadcast hints, AQE picks the join strategy at runtime; this pins
    that the skewed survivor key still completes and produces correct
    absorbed state, and that no rewrite join degenerates to a cartesian
    product.  The shape builder is shared with bench.py's merge_hub_sec
    entry (plans/merge.py::synth_hub_merge) so the timed shape can never
    drift from this correctness-pinned one."""
    from oc_meta_spark.plans.merge import synth_hub_merge

    n = 10_000
    cat, instr = synth_hub_merge(spark, n)
    res = apply_merges(cat, instr)
    assert res.n_merged == n
    assert res.catalog.ra.count() == 1
    moved = res.catalog.entity_id
    assert moved.count() == n
    assert moved.filter(F.col("entity_omid") != "ra/0").count() == 0
    # absorption: lowest-omid donor's name fills the nameless survivor
    # (string order over omids: "ra/1" < "ra/10" < "ra/2")
    assert res.catalog.ra.first()["name"] == "Org 1"
    # ONE merge snapshot on the hub, deriving from survivor + all merged
    snaps = res.prov_delta.filter(
        (F.col("entity_omid") == "ra/0") & (F.size("derived_from") >= 2)
    ).collect()
    assert len(snaps) == 1
    assert len(snaps[0]["derived_from"]) == n + 1
    # plan shape: the skewed rewrite joins must not be cartesian
    for nm in ("ra", "entity_id"):
        plan = getattr(res.catalog, nm)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{nm}: cartesian in merge rewrite"
