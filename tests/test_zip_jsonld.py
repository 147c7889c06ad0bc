"""Round-trip test for the zipped JSON-LD container source (SURVEY S4).

Mirrors the reference's archived-dump layout (zip members per split,
oc_meta/lib/archive_manager.py): write a curated catalog to zip archives,
read the members back, and require the parsed entity rows to reproduce
the original curated CSV through the generate_csv dump.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from oc_meta_spark.plans.curation import EntityCatalog, curate
from oc_meta_spark.plans.generate_csv import dump_csv, parse_jsonld
from oc_meta_spark.schemas import META_INPUT_COLUMNS
from oc_meta_spark.sources.zip_jsonld import read_zip_jsonld, write_zip_jsonld


def _batch(spark):
    rows = [
        (
            1,
            "doi:10.1/zip1",
            "Zip Title One",
            "Family, Given [orcid:0000-0001-5506-523X]",
            "2023-05",
            "Zip Venue [issn:2049-3630]",
            "4",
            "",
            "11-20",
            "journal article",
            "Pub House",
            "",
        ),
        (
            2,
            "doi:10.1/zip2",
            "Zip Title Two",
            "Other, Name",
            "2024",
            "Zip Venue [issn:2049-3630]",
            "4",
            "2",
            "",
            "journal article",
            "Pub House",
            "",
        ),
    ]
    return spark.createDataFrame(rows, ["row_id"] + META_INPUT_COLUMNS)


def test_zip_jsonld_round_trip(spark, tmp_path):
    result = curate(_batch(spark))
    catalog = EntityCatalog.empty(spark).union(result)
    out = str(tmp_path / "dump")
    write_zip_jsonld(catalog, out)

    back = read_zip_jsonld(spark, out)
    assert back.filter(F.col("member").endswith(".json")).count() == back.count()
    # every archive row parses; the dump over re-read rows equals the dump
    # over the in-session export
    dumped = dump_csv(parse_jsonld(back.select("jsonld"))).orderBy("id")
    from oc_meta_spark.sources.export import entity_jsonld_rows

    direct = dump_csv(parse_jsonld(entity_jsonld_rows(catalog).select("jsonld"))).orderBy("id")
    assert [r.asDict() for r in dumped.collect()] == [r.asDict() for r in direct.collect()]
    # kind/dir_split.zip layout on disk
    import os

    kinds = sorted(os.listdir(out))
    assert "br" in kinds and "ra" in kinds
    assert any(f.endswith(".zip") for f in os.listdir(os.path.join(out, "br")))
