"""Verification-report tests (A6 domain form): counters match hand counts
and seeded inconsistencies are detected."""

from __future__ import annotations

from oc_meta_spark.plans.check_results import check_results
from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.schemas import META_INPUT_COLUMNS


def _input(spark, rows):
    data = [tuple([i + 1] + [r.get(c, "") for c in META_INPUT_COLUMNS]) for i, r in enumerate(rows)]
    return spark.createDataFrame(data, ["row_id"] + META_INPUT_COLUMNS)


def test_clean_run_counters(spark):
    rows = [
        {
            "id": "doi:10.1000/chk1",
            "title": "Checked",
            "author": "Author, Ann [orcid:0000-0002-1825-0097]",
            "pub_date": "2020",
            "type": "journal article",
        }
    ]
    r = curate(_input(spark, rows), None, prefix="060")
    catalog = EntityCatalog.empty(spark).union(r)
    rep = check_results(r.curated, catalog)
    c = rep.counters.first().asDict()
    # curated row: id cell 'doi omid', author '[orcid omid:ra]'
    assert c["total_rows"] == 1 and c["rows_with_ids"] == 1
    assert c["omid_schema_identifiers"] == 2  # br + ra omid tokens
    assert c["identifiers_with_omids"] == 2  # doi + orcid, both in store
    assert c["identifiers_without_omids"] == 0
    assert c["identifiers_with_omid_mismatch"] == 0
    assert c["data_graphs_missing"] == 0 and c["prov_graphs_missing"] == 0
    assert c["omids_without_provenance"] == 0
    assert rep.errors.count() == 0


def test_seeded_inconsistencies_detected(spark):
    rows = [
        {
            "id": "doi:10.1000/chk1",
            "title": "Checked",
            "author": "Author, Ann [orcid:0000-0002-1825-0097]",
            "pub_date": "2020",
            "type": "journal article",
        }
    ]
    r = curate(_input(spark, rows), None, prefix="060")
    catalog = EntityCatalog.empty(spark).union(r)
    # corrupt the curated CSV: an id the store doesn't know, a WRONG claimed
    # omid on a known id, a dangling omid, and an invalid checksum
    bad = spark.createDataFrame(
        [
            (
                1,
                "doi:10.1000/chk1 omid:br/0999999",  # known id, wrong + dangling omid
                "Checked",
                "Author, Ann [orcid:0000-0001-0000-0000 omid:ra/0601]",  # bad checksum
                "2020",
                "",
                "",
                "",
                "",
                "journal article",
                "",
                "unknownscheme:zzz [foo:bar]",
            )
        ],
        ["row_id"] + META_INPUT_COLUMNS,
    )
    rep = check_results(bad, catalog)
    c = rep.counters.first().asDict()
    kinds = {e["kind"] for e in rep.errors.collect()}
    assert c["identifiers_with_omid_mismatch"] == 1  # doi resolves to br/0601, not br/0999999
    assert c["identifiers_skipped_invalid"] == 1  # the orcid checksum
    assert c["identifiers_skipped_unverifiable"] >= 1  # foo:bar
    assert c["data_graphs_missing"] == 1  # omid:br/0999999
    assert "omid_mismatch" in kinds and "data_graph_missing" in kinds


def test_export_consistency_detects_seeded_discrepancies(spark):
    from oc_meta_spark.plans.check_results import check_export_consistency

    import pyspark.sql.functions as F

    rows = [
        {
            "id": "doi:10.1000/exp1",
            "title": "Exported One",
            "pub_date": "2021",
            "type": "journal article",
        },
        {
            "id": "doi:10.1000/exp2",
            "title": "Exported Two",
            "pub_date": "2022",
            "type": "journal article",
        },
    ]
    r = curate(_input(spark, rows), None, prefix="060")
    curated = r.curated

    # a faithful dump is consistent
    assert check_export_consistency(curated, curated).count() == 0
    # token order inside a cell does not flag
    shuffled = curated.withColumn(
        "id", F.array_join(F.reverse(F.split("id", " ")), " ")
    )
    assert check_export_consistency(curated, shuffled).count() == 0

    # seed: drop one entity from the dump, corrupt a title on another
    dumped = curated.filter(~F.col("id").contains("exp1")).withColumn(
        "title", F.lit("Corrupted")
    )
    diffs = check_export_consistency(curated, dumped).collect()
    kinds = {(d["kind"], d["column"]) for d in diffs}
    assert ("missing_in_export", None) in kinds
    assert ("value_mismatch", "title") in kinds


def test_export_consistency_bracket_token_order(spark):
    """Round-6 canonicalization pin: id ORDER inside a bracket block must
    not flag — the dump leads with the omid, the curator appends it
    ("N [issn:x omid:y]" vs "N [omid:y issn:x]").  Before brackets became
    standalone tokens, the glued "[issn:x" / "[omid:y" tokens sorted
    differently and every multi-id venue flagged as a value_mismatch."""
    from pyspark.sql import Row

    from oc_meta_spark.plans.check_results import check_export_consistency

    a = spark.createDataFrame(
        [Row(id="doi:10.1/b1 omid:br/1", venue="V [issn:2049-3630 omid:br/9]")]
    )
    b = spark.createDataFrame(
        [Row(id="omid:br/1 doi:10.1/b1", venue="V [omid:br/9 issn:2049-3630]")]
    )
    assert check_export_consistency(a, b).count() == 0
    # a genuinely different id set still flags
    c = spark.createDataFrame(
        [Row(id="omid:br/1 doi:10.1/b1", venue="V [omid:br/9 issn:1476-4687]")]
    )
    diffs = check_export_consistency(a, c).collect()
    assert {(d["kind"], d["column"]) for d in diffs} == {("value_mismatch", "venue")}


def test_export_consistency_non_id_columns_compare_exactly(spark):
    """Round-7 pin: canonicalization applies ONLY to the id-bearing columns
    the reference's normalize_row_ids touches (author/venue/publisher/
    editor) — a title whose bracketed tokens were reordered or whose
    internal whitespace changed must flag as a value_mismatch."""
    from pyspark.sql import Row

    from oc_meta_spark.plans.check_results import check_export_consistency

    a = spark.createDataFrame(
        [Row(id="doi:10.1/t1 omid:br/1", title="Alpha [beta gamma] Title", page="11-22")]
    )
    reordered = spark.createDataFrame(
        [Row(id="omid:br/1 doi:10.1/t1", title="Alpha [gamma beta] Title", page="11-22")]
    )
    diffs = check_export_consistency(a, reordered).collect()
    assert {(d["kind"], d["column"]) for d in diffs} == {("value_mismatch", "title")}
    squeezed = spark.createDataFrame(
        [Row(id="omid:br/1 doi:10.1/t1", title="Alpha  [beta gamma] Title", page="11-22")]
    )
    diffs = check_export_consistency(a, squeezed).collect()
    assert {(d["kind"], d["column"]) for d in diffs} == {("value_mismatch", "title")}


def test_export_consistency_id_token_loss_flags(spark):
    """Round-8 pin (round-7 ADVICE): the id cell is compared as a sorted
    token multiset — a dump that keeps the omid (the join key) but LOSES
    or GAINS another id token must flag as a value_mismatch on column
    'id'; pure reorder must not."""
    from pyspark.sql import Row

    from oc_meta_spark.plans.check_results import check_export_consistency

    a = spark.createDataFrame(
        [Row(id="doi:10.1/x1 omid:br/1", title="T")]
    )
    reordered = spark.createDataFrame([Row(id="omid:br/1 doi:10.1/x1", title="T")])
    assert check_export_consistency(a, reordered).count() == 0
    lost_doi = spark.createDataFrame([Row(id="omid:br/1", title="T")])
    diffs = check_export_consistency(a, lost_doi).collect()
    assert {(d["kind"], d["column"]) for d in diffs} == {("value_mismatch", "id")}
    gained = spark.createDataFrame(
        [Row(id="omid:br/1 doi:10.1/x1 pmid:123", title="T")]
    )
    diffs = check_export_consistency(a, gained).collect()
    assert {(d["kind"], d["column"]) for d in diffs} == {("value_mismatch", "id")}


def test_curated_idless_agent_has_no_stray_bracket_space(spark):
    """Round-6 serializer pin: an id-less agent serializes as
    "Name [omid:ra/x]" — reference format (e.g. test/testcases
    "McSorley, Stephen [omid:ra/0614]") — not "Name [ omid:ra/x]"
    (concat_ws keeps the separator for empty strings)."""
    rows = [
        {
            "id": "doi:10.1000/sp1",
            "title": "Spaced",
            "author": "Author, NoId",
            "venue": "Unided Venue [issn:2049-3630]",
            "pub_date": "2020",
            "type": "journal article",
            "publisher": "Pub NoId",
        }
    ]
    r = curate(_input(spark, rows), None, prefix="060")
    row = r.curated.first()
    for col in ("author", "publisher", "venue"):
        assert "[ " not in row[col], (col, row[col])
        assert " ]" not in row[col], (col, row[col])
    assert row["author"].endswith("]") and "[omid:ra/" in row["author"]


def test_curated_idless_row_id_cell_has_no_leading_space(spark):
    """Round-6 serializer pin #2: a row with NO persistable ids serializes
    its id cell as "omid:br/x", not " omid:br/x" (the same concat_ws
    empty-string pitfall, third site)."""
    rows = [
        {"id": "", "title": "No Ids", "author": "A, B",
         "pub_date": "2020", "type": "journal article"},
        {"id": "tmp:x1", "title": "Temp Only", "author": "C, D",
         "pub_date": "2021", "type": "journal article"},
    ]
    r = curate(_input(spark, rows), None, prefix="060")
    for row in r.curated.collect():
        assert not row["id"].startswith(" "), repr(row["id"])
        assert row["id"].rstrip() == row["id"], repr(row["id"])


def test_export_consistency_entry_order_significant(spark):
    """Round-6: entry ORDER is part of the round-trip contract — a dump
    that rebuilt the agent chain in the wrong order must flag, even
    though the same entries in the same order with ids shuffled inside
    their brackets must not."""
    from pyspark.sql import Row

    from oc_meta_spark.plans.check_results import check_export_consistency

    a = spark.createDataFrame(
        [Row(
            id="doi:10.1/o1 omid:br/1",
            author="First, F [orcid:0000-0002-1825-0097 omid:ra/1]; Second, S [omid:ra/2]",
        )]
    )
    same_order_shuffled_ids = spark.createDataFrame(
        [Row(
            id="omid:br/1 doi:10.1/o1",
            author="First, F [omid:ra/1 orcid:0000-0002-1825-0097]; Second, S [omid:ra/2]",
        )]
    )
    assert check_export_consistency(a, same_order_shuffled_ids).count() == 0
    swapped = spark.createDataFrame(
        [Row(
            id="omid:br/1 doi:10.1/o1",
            author="Second, S [omid:ra/2]; First, F [omid:ra/1 orcid:0000-0002-1825-0097]",
        )]
    )
    diffs = check_export_consistency(a, swapped).collect()
    assert {(d["kind"], d["column"]) for d in diffs} == {("value_mismatch", "author")}


def test_atlas_scale_author_chain_survives_round_trip(spark):
    """The reference's published stress case (run/benchmark/benchmark.py
    ``--preload-high-authors 2869`` — the ATLAS collaboration): ONE record
    with 2869 authors.  Pins that pos discipline survives curate →
    JSON-LD export → parse → CSV dump: the dump has no positions in the
    native dialect, so resolve_chains must walk the 2869-link hasNext
    chain and rebuild exact input order (any accidental string-sort of
    minted omids would shuffle ra/1 < ra/10 < ra/2), and the id-less
    agent serializer must stay space-clean at scale."""
    import pyspark.sql.functions as F

    from oc_meta_spark.plans.check_results import check_export_consistency
    from oc_meta_spark.plans.generate_csv import dump_csv, parse_jsonld
    from oc_meta_spark.sources.export import entity_jsonld_rows

    n = 2869
    authors = "; ".join(f"Fam{i:04d}, Giv{i}" for i in range(1, n + 1))
    rows = [
        {"id": "doi:10.1000/atlas1", "title": "Atlas Paper", "author": authors,
         "pub_date": "2019", "type": "journal article"},
    ]
    r = curate(_input(spark, rows), None, prefix="060")
    # curated's lazy tail re-executes per reference (first() + the
    # consistency scan below) — cut it once; value-neutral (r13 suite
    # audit: this test was 221 s, mostly repeated tail re-execution)
    curated = r.curated.localCheckpoint()

    cell = curated.first()["author"]
    entries = cell.split("; ")
    assert len(entries) == n
    for i, e in zip((1, 2, 9, 10, 11, 100, n), (entries[0], entries[1], entries[8],
                                                entries[9], entries[10], entries[99], entries[-1])):
        assert e.startswith(f"Fam{i:04d}, Giv{i} ["), (i, e)
        assert "[ " not in e and " ]" not in e, e

    catalog = EntityCatalog.empty(spark).union(r)
    # curated AR chain: contiguous positions 1..n on the single work
    pos = sorted(p["pos"] for p in catalog.ar.filter(F.col("role") == "author").collect())
    assert pos == list(range(1, n + 1))

    dumped = dump_csv(
        parse_jsonld(entity_jsonld_rows(catalog).select("jsonld"))
    ).localCheckpoint()
    assert check_export_consistency(curated, dumped).count() == 0
