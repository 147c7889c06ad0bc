"""End-to-end tests of the curation pipeline (SURVEY §3.1) — fresh-load and
update scenarios modeled on the reference's golden-testcase strategy
(SURVEY §5) with OMID-stable assertions.
"""

from __future__ import annotations

import pytest

from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.schemas import META_INPUT_COLUMNS


def _input(spark, rows):
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    return spark.createDataFrame(data, META_INPUT_COLUMNS)


ROWS_BATCH1 = [
    {
        "id": "doi:10.1162/qss_a_00292",
        "title": "THE OPENCITATIONS META STORY",
        "author": "Massari, Arcangelo [orcid:0000-0002-1825-0097]; Peroni, Silvio",
        "pub_date": "2024-01-22",
        "venue": "Quantitative Science Studies [issn:2641-3337]",
        "volume": "5",
        "issue": "1",
        "page": "50-75",
        "type": "journal article",
        "publisher": "MIT Press",
    },
    # Same DOI in dirty form → must unify with row 1 (in-batch dedup D3/D4).
    {
        "id": "doi:https://doi.org/10.1162/QSS_a_00292 pmid:99887766",
        "title": "",
        "pub_date": "2024",
        "type": "journal article",
    },
    # Distinct work, same venue+volume → shares minted venue/volume BRs.
    {
        "id": "doi:10.1162/qss_a_00999",
        "title": "Another Article",
        "author": "Doe, Jane",
        "pub_date": "2024-02",
        "venue": "Quantitative Science Studies [issn:2641-3337]",
        "volume": "5",
        "issue": "2",
        "type": "journal article",
    },
    # Invalid date day + invalid issn (checksum) → degraded/dropped.
    {
        "id": "issn:0028-0837 doi:10.1000/valid1",
        "title": "Bad Ids Row",
        "pub_date": "2020-02-30",
        "type": "journal article",
    },
    # No ids: a 'report' row needs title + date + author/editor to be valid
    # (reference is_a_valid_row, curator.py:1489-1506) → new entity.
    {
        "title": "An Id-less Report",
        "author": "Rapporteur, Rae",
        "pub_date": "2019",
        "type": "report",
    },
]


@pytest.fixture(scope="module")
def result(spark):
    return curate(_input(spark, ROWS_BATCH1), None, prefix="060")


class TestFreshLoad:
    def test_entity_unification(self, result):
        curated = {r["row_id"]: r for r in result.curated.collect()}
        # rows 1 and 2 share the DOI → same entity: only one curated row
        # carries the DOI, and 4 work rows come out of 5 inputs.
        assert len(curated) == 4
        dois = [r for r in curated.values() if "doi:10.1162/qss_a_00292" in r["id"]]
        assert len(dois) == 1
        # canonical row carries the union of ids (pmid from the dup row)
        assert "pmid:99887766" in dois[0]["id"]
        # and exactly one omid token
        assert dois[0]["id"].count("omid:br/") == 1

    def test_title_and_date_cleaning(self, result):
        rows = result.curated.collect()
        r1 = next(r for r in rows if "doi:10.1162/qss_a_00292" in r["id"])
        # ALL-CAPS title cleaned; the entity title is the FIRST non-empty
        # row title (entity-store naming), while scalar fields keep the
        # LAST row's value (the reference's final last-wins dict dedup,
        # curator.py:333 — row 2's '2024' survives).
        assert r1["title"] == "The Opencitations Meta Story"
        assert r1["pub_date"] == "2024"
        bad = next(r for r in rows if "doi:10.1000/valid1" in r["id"])
        assert bad["pub_date"] == "2020-02"  # invalid day degraded
        assert "issn:0028-0837" not in bad["id"]  # bad checksum dropped

    def test_venue_hierarchy(self, result, spark):
        br = {r["omid"]: r for r in result.br_new.collect()}
        journals = [r for r in br.values() if r["type"] == "journal"]
        volumes = [r for r in br.values() if r["type"] == "journal volume"]
        issues = [r for r in br.values() if r["type"] == "journal issue"]
        assert len(journals) == 1  # one shared venue
        assert len(volumes) == 1  # volume 5 shared by both articles
        # The unified entity's KEPT row (last-wins, curator.py:333) has no
        # venue cell, so issue 1 is never materialized in the graph — only
        # row 3's issue 2 exists (the reference's Creator behaves the same:
        # it builds containers from the surviving row's values).
        assert {i["seq_id"] for i in issues} == {"2"}
        vol = volumes[0]
        assert vol["seq_id"] == "5" and vol["part_of"] == journals[0]["omid"]
        for i in issues:
            assert i["part_of"] == vol["omid"]
        # articles point at their issue
        arts = [r for r in br.values() if r["type"] == "journal article" and r["part_of"]]
        assert all(br[a["part_of"]]["type"] == "journal issue" for a in arts)

    def test_agents_and_positions(self, result):
        ars = result.ar_new.collect()
        by_role = {}
        for a in ars:
            by_role.setdefault((a["br_omid"], a["role"]), []).append(a)
        # the two-author article has positions 1,2 in input order
        two = [v for v in by_role.values() if len(v) == 2 and v[0]["role"] == "author"]
        assert len(two) == 1
        poss = sorted(a["pos"] for a in two[0])
        assert poss == [1, 2]
        ras = {r["omid"]: r for r in result.ra_new.collect()}
        ordered = sorted(two[0], key=lambda a: a["pos"])
        assert ras[ordered[0]["ra_omid"]]["family"] == "Massari"
        assert ras[ordered[1]["ra_omid"]]["family"] == "Peroni"

    def test_re_pages(self, result):
        res = result.re_new.collect()
        assert len(res) == 1
        assert (res[0]["start_page"], res[0]["end_page"]) == ("50", "75")

    def test_prov_snapshots(self, result):
        prov = result.prov_new.collect()
        created = [p for p in prov if p["description"] == "entity created"]
        # every minted entity has exactly one snapshot-1
        n_minted = (
            result.br_new.count()
            + result.ra_new.count()
            + result.id_new.count()
            + result.ar_new.count()
            + result.re_new.count()
        )
        assert len(created) == n_minted
        assert all(p["snapshot"] == 1 for p in created)

    def test_indexes(self, result):
        idx = {r["id"]: r["meta"] for r in result.index_id_br.collect()}
        assert "doi:10.1162/qss_a_00292" in idx
        assert all(m.startswith("id/") for m in idx.values())
        ar_idx = result.index_ar.collect()
        assert all(r["meta"].startswith("br/") for r in ar_idx)


class TestUpdateScenario:
    def test_resolution_against_catalog(self, spark, result):
        catalog = EntityCatalog.empty(spark).union(result)
        batch2 = _input(
            spark,
            [
                # same DOI → resolves to the existing entity, no new BR
                {
                    "id": "doi:10.1162/qss_a_00292 arxiv:2401.00001",
                    "title": "Ignored Title",
                    "pub_date": "2023",
                    "type": "journal article",
                },
                # genuinely new work
                {
                    "id": "doi:10.1000/new_one",
                    "title": "Brand New",
                    "pub_date": "2025",
                    "type": "journal article",
                },
            ],
        )
        r2 = curate(batch2, catalog, prefix="060")
        curated = r2.curated.collect()
        known = {r["omid"]: r for r in result.br_new.collect()}
        resolved_row = next(r for r in curated if "doi:10.1162/qss_a_00292" in r["id"])
        tok = [t for t in resolved_row["id"].split() if t.startswith("omid:br/")]
        assert len(tok) == 1 and tok[0].removeprefix("omid:") in known
        # D5 equalizer: catalog title/date take precedence over batch values
        # (the catalog row carries '2024' — the last-wins survivor of batch 1)
        assert resolved_row["title"] == "The Opencitations Meta Story"
        assert resolved_row["pub_date"] == "2024"
        # only ONE new BR minted (row 2), and its counter continues
        new_brs = [r for r in r2.br_new.collect() if r["type"] == "journal article"]
        assert len(new_brs) == 1
        # the arxiv id was added to the existing entity → modification prov
        mods = [p for p in r2.prov_new.collect() if "modified" in p["description"]]
        assert any(p["entity_omid"] in known for p in mods)
        assert all(len(p["derived_from"]) >= 1 for p in mods)
        # no re-minting of already-known identifier tokens
        known_ids = {(r["schema"], r["value"]) for r in result.id_new.collect()}
        new_ids = {(r["schema"], r["value"]) for r in r2.id_new.collect()}
        assert known_ids.isdisjoint(new_ids)

    def test_agent_chain_reuse_and_continuation(self, spark):
        """Re-curating the same agents is a no-op (id match AND chain-scoped
        name match); a genuinely new agent appends at the next contiguous
        position (reference clean_ra semantics, curator.py:575-742)."""
        base = [
            {
                "id": "doi:10.1000/chain1",
                "title": "T",
                "author": "Smith, John [orcid:0000-0002-1825-0097]; NoId, Jane",
                "pub_date": "2020",
                "type": "journal article",
            }
        ]
        r1 = curate(_input(spark, base), None, prefix="060")
        catalog = EntityCatalog.empty(spark).union(r1)
        # exact re-curation → no new ARs or RAs (NoId Jane matches by name)
        r2 = curate(_input(spark, base), catalog, prefix="060")
        assert r2.ar_new.count() == 0 and r2.ra_new.count() == 0
        # one new author → exactly one AR at pos 3 (chain max 2 + 1, no gap)
        ext = [dict(base[0], author=base[0]["author"] + "; Third, Person")]
        r3 = curate(_input(spark, ext), catalog, prefix="060")
        ars = r3.ar_new.collect()
        assert len(ars) == 1 and ars[0]["pos"] == 3
        assert r3.ra_new.count() == 1

    def test_venue_resolution_by_issn_in_later_batch(self, spark, result):
        """Minted venues carry their identifier links, so a later batch
        naming the venue by issn (even under a different name) resolves to
        the existing journal instead of minting a new one."""
        catalog = EntityCatalog.empty(spark).union(result)
        batch = _input(
            spark,
            [
                {
                    "id": "doi:10.1000/venue_probe",
                    "title": "Venue Probe",
                    "pub_date": "2025",
                    "venue": "QSS Renamed [issn:2641-3337]",
                    "volume": "5",
                    "issue": "1",
                    "type": "journal article",
                }
            ],
        )
        r = curate(batch, catalog, prefix="060")
        new_journals = [x for x in r.br_new.collect() if x["type"] in ("journal", "journal volume", "journal issue")]
        # venue and volume 5 resolve against the catalog; issue 1 was never
        # materialized in batch 1 (its surviving row had no venue), so it —
        # and only it — is minted now, nested under the EXISTING volume.
        known_vol = next(x for x in result.br_new.collect() if x["type"] == "journal volume")
        assert [(x["type"], x["seq_id"], x["part_of"]) for x in new_journals] == [
            ("journal issue", "1", known_vol["omid"])
        ]
        known_venue = next(x for x in result.br_new.collect() if x["type"] == "journal")
        curated = r.curated.first()
        assert f"omid:{known_venue['omid']}" in curated["venue"]

    def test_equalizer_five_field_precedence(self, spark):
        """D5 equalizer, field-by-field (reference curator.py:1402-1449):
        store overwrites title/pub_date/volume/issue, page comes from the
        existing RE, empty agent cells fill from the store chain, and the
        venue id-set unions with the store's on overlap.  Self-contained
        batch 1 so the catalog work carries a full venue/volume/issue
        chain and an embodiment."""
        r1 = curate(
            _input(
                spark,
                [
                    {
                        "id": "doi:10.1000/eq5",
                        "title": "THE EQUALIZED WORK",
                        "author": "Massari, Arcangelo [orcid:0000-0002-1825-0097]; Peroni, Silvio",
                        "pub_date": "2024-01-22",
                        "venue": "Quantitative Science Studies [issn:2641-3337]",
                        "volume": "5",
                        "issue": "1",
                        "page": "50-75",
                        "type": "journal article",
                    }
                ],
            ),
            None,
            prefix="060",
        )
        catalog = EntityCatalog.empty(spark).union(r1)
        batch = _input(
            spark,
            [
                {
                    "id": "doi:10.1000/eq5",
                    "title": "Wrong Title",
                    "author": "",  # empty -> filled from the store chain
                    "pub_date": "1999",
                    "venue": "Wrong Venue Name [issn:2641-3337 viaf:999]",
                    "volume": "99",
                    "issue": "77",
                    "page": "1-2",
                    "type": "journal article",
                }
            ],
        )
        r = curate(batch, catalog, prefix="060")
        row = r.curated.first()
        # store overwrites the scalar fields
        assert row["title"] == "The Equalized Work"
        assert row["pub_date"] == "2024-01-22"
        assert row["volume"] == "5"
        assert row["issue"] == "1"
        # page from the existing RE, not the batch value
        assert row["page"] == "50-75"
        # empty author cell filled from the store chain, in chain order
        assert row["author"].startswith("Massari, Arcangelo")
        assert "Peroni, Silvio" in row["author"]
        # venue: batch ids overlap the store's issn -> id-sets union, store name wins
        assert "issn:2641-3337" in row["venue"] and "viaf:999" in row["venue"]
        known_venue = next(x for x in r1.br_new.collect() if x["type"] == "journal")
        assert f"omid:{known_venue['omid']}" in row["venue"]
        assert row["venue"].startswith("Quantitative Science Studies")
        # no new BR of any kind: vol 99 / issue 77 are overridden before vvi
        assert r.br_new.count() == 0

    def test_silencer_suppresses_additions_on_preexisting(self, spark):
        """silencer=True: no agent-role additions on preexisting BRs; new
        entities still get their chains (reference silencer semantics)."""
        r1 = curate(
            _input(spark, [{"id": "doi:10.1000/sil1", "title": "T", "author": "First, F", "pub_date": "2020", "type": "journal article"}]),
            None,
            prefix="060",
        )
        catalog = EntityCatalog.empty(spark).union(r1)
        b2 = _input(
            spark,
            [
                {"id": "doi:10.1000/sil1", "title": "T", "author": "First, F; Second, S", "pub_date": "2020", "type": "journal article"},
                {"id": "doi:10.1000/sil2", "title": "New", "author": "Third, T", "pub_date": "2021", "type": "journal article"},
            ],
        )
        on = curate(b2, catalog, prefix="060", silencer=True)
        ars_on = {(a["br_omid"], a["role"]) for a in on.ar_new.collect()}
        existing_br = r1.br_new.first()["omid"]
        assert all(br != existing_br for br, _ in ars_on)
        assert len(ars_on) == 1  # only the new work's author
        off = curate(b2, catalog, prefix="060", silencer=False)
        assert any(a["br_omid"] == existing_br for a in off.ar_new.collect())

    def test_given_name_enrichment(self, spark):
        """An id-matched agent supplying a given name fills a catalog RA
        that has only 'Family,' (reference name_check)."""
        b1 = [
            {
                "id": "doi:10.1000/enr1",
                "title": "T",
                "author": "Soloist, [orcid:0000-0002-1825-0097]",
                "pub_date": "2020",
                "type": "journal article",
            }
        ]
        r1 = curate(_input(spark, b1), None, prefix="060")
        ra1 = r1.ra_new.first()
        assert ra1["family"] == "Soloist" and not ra1["given"]
        catalog = EntityCatalog.empty(spark).union(r1)
        b2 = [
            {
                "id": "doi:10.1000/enr2",
                "title": "T2",
                "author": "Soloist, Sam [orcid:0000-0002-1825-0097]",
                "pub_date": "2021",
                "type": "journal article",
            }
        ]
        r2 = curate(_input(spark, b2), catalog, prefix="060")
        upd = r2.ra_updates.collect()
        assert len(upd) == 1 and upd[0]["omid"] == ra1["omid"] and upd[0]["given"] == "Sam"
        assert r2.ra_new.count() == 0  # resolved, not re-minted
        # applying the delta updates the catalog row
        cat2 = catalog.union(r2)
        row = next(r for r in cat2.ra.collect() if r["omid"] == ra1["omid"])
        assert row["given"] == "Sam"
        # and the enrichment is provenance-tracked
        assert any(p["entity_omid"] == ra1["omid"] and "modified" in p["description"] for p in r2.prov_new.collect())

    def test_editor_on_container_and_book_venue(self, spark):
        """Chapter-like types: venue minted as a book and the editor AR
        attaches to the container BR, not the chapter (reference
        CONTAINER_EDITOR_TYPES / get_edited_br_metaid)."""
        rows = [
            {
                "id": "doi:10.1000/chap1",
                "title": "A Chapter",
                "author": "Writer, Wendy",
                "editor": "Editor, Ed [orcid:0000-0002-1825-0097]",
                "venue": "Big Handbook [isbn:9780306406157]",
                "pub_date": "2019",
                "type": "book chapter",
            }
        ]
        r = curate(_input(spark, rows), None, prefix="060")
        brs = {x["omid"]: x for x in r.br_new.collect()}
        chapter = next(x for x in brs.values() if x["type"] == "book chapter")
        book = next(x for x in brs.values() if x["type"] == "book")
        assert chapter["part_of"] == book["omid"]
        ars = {(a["role"], a["br_omid"]) for a in r.ar_new.collect()}
        assert ("author", chapter["omid"]) in ars
        assert ("editor", book["omid"]) in ars
        assert ("editor", chapter["omid"]) not in ars
        # curated CSV keeps the editor on the chapter ROW (display) even
        # though the graph attaches it to the container
        c = r.curated.first()
        # agent ids precede the omid in the display string (reference
        # build_name_ids_string output shape)
        assert c["editor"].startswith("Editor, Ed [orcid:0000-0002-1825-0097 omid:ra/")

    def test_omid_counters_continue(self, spark, result):
        catalog = EntityCatalog.empty(spark).union(result)
        r2 = curate(
            _input(spark, [{"id": "doi:10.1000/x2", "title": "T", "pub_date": "2020", "type": "journal article"}]),
            catalog,
            prefix="060",
        )
        old_max = max(int(r["omid"].split("/060")[1]) for r in result.br_new.collect())
        new_ns = [int(r["omid"].split("/060")[1]) for r in r2.br_new.collect()]
        assert min(new_ns) == old_max + 1


class TestTemporaryIdentifiers:
    """F7: temp: ids unify rows but are never persisted (reference
    core/creator.py:629-631; meta_process_test.py
    test_temporary_identifiers / _deduplication)."""

    def test_temp_ids_unify_but_are_not_persisted(self, spark):
        rows = [
            {
                "id": "temp:789",
                "title": "Test Article 1",
                "author": "Smith, John [orcid:0000-0002-1825-0097]",
                "pub_date": "2020",
                "type": "journal article",
            },
            {
                "id": "temp:789",
                "title": "Test Article 1",
                "author": "Smith, John [orcid:0000-0002-1825-0097]",
                "pub_date": "2020",
                "type": "journal article",
            },
        ]
        r = curate(_input(spark, rows), None, prefix="060")
        # both rows collapse to ONE br entity
        assert r.br_new.count() == 1
        # the temp identifier is never minted as an id/ entity nor linked
        ids = [(x["schema"], x["value"]) for x in r.id_new.collect()]
        assert ("temp", "789") not in ids
        links = r.entity_id_new.join(
            r.id_new.withColumnRenamed("omid", "id_omid"), "id_omid"
        ).collect()
        assert all(l["schema"] != "temp" for l in links)
        # the curated CSV still carries the temp token (the reference's
        # creator skips it when persisting, not the curator when writing)
        c = r.curated.first()
        assert "temp:789" in c["id"]
        assert "omid:br/" in c["id"]
        # the ORCID, by contrast, IS persisted
        assert ("orcid", "0000-0002-1825-0097") in ids


def test_curate_big_batch_path_equivalence(spark, monkeypatch):
    """The distributed (big-batch) physical path — assign_contiguous_ranks
    for every mint instead of one-group windows — must produce IDENTICAL
    results to the small path: same omids, same curated rows.  This is the
    plan that runs at 100 TB; correctness parity with the micro-batch plan
    is the contract that lets the switch stay a physical-only choice."""
    import oc_meta_spark.plans.curation as cur

    rows = [
        {
            "id": "doi:10.1000/big1",
            "title": "Batch Path One",
            "author": "Alpha, A [orcid:0000-0002-1825-0097]; Beta, B",
            "pub_date": "2021",
            "venue": "Venue X [issn:2641-3337]",
            "volume": "3",
            "issue": "2",
            "page": "1-9",
            "type": "journal article",
        },
        {
            "id": "doi:10.1000/big2",
            "title": "Batch Path Two",
            "author": "Gamma, C",
            "pub_date": "2022",
            "venue": "Venue X [issn:2641-3337]",
            "volume": "3",
            "type": "journal article",
        },
        {"title": "Solo Report", "author": "Delta, D", "pub_date": "2020", "type": "report"},
    ]
    df = _input(spark, rows)
    r_small = curate(df, None, prefix="060")
    small_curated = [tuple(r) for r in r_small.curated.collect()]
    small_br = sorted(tuple(r) for r in r_small.br_new.collect())

    monkeypatch.setattr(cur, "SMALL_BATCH_ROWS", 0)
    r_big = curate(df, None, prefix="060")
    big_curated = [tuple(r) for r in r_big.curated.collect()]
    big_br = sorted(tuple(r) for r in r_big.br_new.collect())

    assert small_curated == big_curated
    assert small_br == big_br
    assert sorted(tuple(r) for r in r_small.ar_new.collect()) == sorted(
        tuple(r) for r in r_big.ar_new.collect()
    )
    assert sorted(tuple(r) for r in r_small.id_new.collect()) == sorted(
        tuple(r) for r in r_big.id_new.collect()
    )


def test_cp_fallback_path_equivalent(spark, monkeypatch):
    """_cp's stats-stripping uses the PRIVATE internalCreateDataFrame JVM
    API with a guarded fallback to the plain localCheckpoint.  Force the
    except-path (as a Spark upgrade that removes the API would) and pin
    that curate() output is IDENTICAL — so internal-API drift fails
    loudly into a verified-correct path instead of silently changing
    results (round-7 VERDICT carry)."""
    import oc_meta_spark.plans.curation as cur

    rows = [
        {
            "id": "doi:10.1000/fb1",
            "title": "Fallback One",
            "author": "Alpha, A [orcid:0000-0002-1825-0097]; Beta, B",
            "pub_date": "2021",
            "venue": "Venue F [issn:2641-3337]",
            "volume": "1",
            "issue": "2",
            "page": "1-9",
            "type": "journal article",
        },
        {
            "id": "doi:10.1000/fb2",
            "title": "Fallback Two",
            "author": "Gamma, C",
            "pub_date": "2022",
            "venue": "Venue F [issn:2641-3337]",
            "volume": "1",
            "type": "journal article",
        },
        {"title": "Fallback Report", "author": "Delta, D", "pub_date": "2020", "type": "report"},
    ]
    df = _input(spark, rows)
    r_fast = curate(df, None, prefix="060")
    fast = {
        "curated": [tuple(r) for r in r_fast.curated.collect()],
        "br": sorted(tuple(r) for r in r_fast.br_new.collect()),
        "ar": sorted(tuple(r) for r in r_fast.ar_new.collect()),
        "id": sorted(tuple(r) for r in r_fast.id_new.collect()),
    }

    def boom(cp):
        raise RuntimeError("simulated internal-API removal")

    monkeypatch.setattr(cur, "_strip_stats", boom)
    r_fb = curate(df, None, prefix="060")
    assert fast["curated"] == [tuple(r) for r in r_fb.curated.collect()]
    assert fast["br"] == sorted(tuple(r) for r in r_fb.br_new.collect())
    assert fast["ar"] == sorted(tuple(r) for r in r_fb.ar_new.collect())
    assert fast["id"] == sorted(tuple(r) for r in r_fb.id_new.collect())


def test_counters_independent_per_prefix(spark):
    """Two supplier prefixes sharing one catalog keep independent counter
    spaces (reference FilesystemCounterHandler keys counter files by
    prefix, run/meta_process.py:162-168)."""
    r1 = curate(
        _input(spark, [{"id": "doi:10.1000/pfx1", "title": "A", "pub_date": "2020", "type": "journal article"}]),
        None,
        prefix="060",
    )
    catalog = EntityCatalog.empty(spark).union(r1)
    # a batch under a DIFFERENT prefix starts ITS space at 1
    r2 = curate(
        _input(spark, [{"id": "doi:10.1000/pfx2", "title": "B", "pub_date": "2021", "type": "journal article"}]),
        catalog,
        prefix="070",
    )
    assert [x["omid"] for x in r2.br_new.collect()] == ["br/0701"]
    # both prefixes' counters survive in the post-batch table
    catalog2 = catalog.union(r2)
    counters = {(c["kind"], c["prefix"]): c["max_n"] for c in catalog2.counters.collect()}
    assert counters[("br", "060")] == 1 and counters[("br", "070")] == 1
    # and the original prefix continues ITS numbering, unaffected by 070
    r3 = curate(
        _input(spark, [{"id": "doi:10.1000/pfx3", "title": "C", "pub_date": "2022", "type": "journal article"}]),
        catalog2,
        prefix="060",
    )
    assert [x["omid"] for x in r3.br_new.collect()] == ["br/0602"]


def test_dangling_omid_resolves_through_merge_history(spark):
    """A row citing an omid that was merged away resolves to the surviving
    entity via the provenance merge chain (reference
    retrieve_metaid_from_merged_entity, curator.py:1199-1205) — including a
    two-hop chain br/0603 → br/0602 → br/0601."""
    from oc_meta_spark.schemas import ENTITY_TABLES

    br = spark.createDataFrame(
        [("br/0601", "journal article", "Survivor", "2019", None, None, None)],
        ENTITY_TABLES["br"],
    )
    prov = spark.createDataFrame(
        [
            ("br/0601", 1, "t0", None, [], "agent", None, "entity created", None),
            # br/0602 merged into br/0601; later br/0603 merged into br/0602
            ("br/0601", 2, "t1", None, ["br/0601", "br/0602"], "agent", None, "entity merged", None),
            ("br/0602", 1, "t0", None, [], "agent", None, "entity created", None),
            ("br/0602", 2, "t1", "t1", ["br/0602", "br/0603"], "agent", None, "entity merged", None),
        ],
        ENTITY_TABLES["prov"],
    )
    empty = EntityCatalog.empty(spark)
    cat = EntityCatalog(
        br=br, ra=empty.ra, id=empty.id, entity_id=empty.entity_id,
        ar=empty.ar, re=empty.re, prov=prov, counters=None,
    )
    batch = _input(
        spark,
        [
            {"id": "omid:br/0603", "title": "Renamed By Batch", "pub_date": "2019",
             "type": "journal article"},
        ],
    )
    result = curate(batch, cat, prefix="060")
    row = result.curated.collect()[0]
    assert "omid:br/0601" in row["id"]
    assert result.br_new.filter(result.br_new.type == "journal article").count() == 0

    # a dangling omid with NO merge history stays dangling: the token is
    # discarded and the row mints a new entity
    batch2 = _input(
        spark,
        [{"id": "omid:br/0699", "title": "Truly New", "pub_date": "2020",
          "type": "journal article"}],
    )
    r2 = curate(batch2, cat, prefix="060")
    row2 = r2.curated.collect()[0]
    assert "omid:br/0699" not in row2["id"]
    assert r2.br_new.filter(r2.br_new.type == "journal article").count() == 1
