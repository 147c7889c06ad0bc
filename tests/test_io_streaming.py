"""Tests for sources/sinks, streaming micro-batch curation, and multimodal
plumbing (SURVEY S1-S10, §2.9, multimodal extension)."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest


def test_csv_roundtrip_sanitized(spark, tmp_path):
    from oc_meta_spark.sources.csv_input import read_metadata_csv

    p = tmp_path / "in"
    p.mkdir()
    (p / "a.csv").write_text(
        'id,title,author,pub_date,venue,volume,issue,page,type,publisher,editor\n'
        '"doi:10.1/x","A\x00Title with nbsp","","2020","","","","","journal article","",""\n'
    )
    df = read_metadata_csv(spark, str(p))
    row = df.first()
    assert row["title"] == "A Title with nbsp"
    assert row["id"] == "doi:10.1/x"


def test_curated_csv_chunked_write(spark, tmp_path):
    from oc_meta_spark.sources.export import write_curated_csv

    df = spark.range(100).select(F.col("id").cast("string").alias("id"), F.lit("t").alias("title"))
    out = str(tmp_path / "out")
    write_curated_csv(df, out, rows_per_file=10)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    total = spark.read.option("header", True).csv(out).count()
    assert total == 100


def test_jsonld_and_nquads_export(spark, tmp_path):
    from oc_meta_spark.plans.curation import EntityCatalog, curate
    from oc_meta_spark.schemas import META_INPUT_COLUMNS
    from oc_meta_spark.sources.export import nquads_rows, write_jsonld

    rows = [
        {
            "id": "doi:10.1/exp",
            "title": 'A "Quoted" Title',
            "author": "Doe, Jane",
            "pub_date": "2021",
            "type": "journal article",
        }
    ]
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    result = curate(spark.createDataFrame(data, META_INPUT_COLUMNS))
    catalog = EntityCatalog.empty(spark).union(result)

    out = str(tmp_path / "jsonld")
    write_jsonld(catalog, out)
    back = spark.read.json(out + "/kind=br/*/*")
    docs = [r["jsonld"] for r in back.collect()]
    assert any("dcterms:title" in d for d in docs)

    nq = [r["line"] for r in nquads_rows(catalog).collect()]
    title_lines = [l for l in nq if "dc/terms/title" in l]
    assert title_lines and '\\"Quoted\\"' in title_lines[0]
    assert all(l.endswith(" .") for l in nq)
    # full OCDM families: fabio type, identifier link + scheme, agent role
    # with document context, per-kind named graphs
    assert any("spar/fabio/JournalArticle>" in l for l in nq)
    assert any("spar/datacite/hasIdentifier>" in l for l in nq)
    assert any("spar/datacite/doi>" in l for l in nq)
    assert any("spar/pro/author>" in l for l in nq)
    assert any("spar/pro/isDocumentContextFor>" in l for l in nq)
    assert any("foaf/0.1/familyName>" in l and '"Doe"' in l for l in nq)
    assert any(l.rstrip(" .").endswith("<https://w3id.org/oc/meta/ra/>") for l in nq if "foaf" in l)


def test_streaming_micro_batch_curation(spark, tmp_path):
    from oc_meta_spark.streaming.micro_batch import load_catalog, stream_curate

    input_dir = tmp_path / "stream_in"
    input_dir.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    header = "id,title,author,pub_date,venue,volume,issue,page,type,publisher,editor\n"
    (input_dir / "b1.csv").write_text(
        header + '"doi:10.1000/s1","Stream One","","2020","","","","","journal article","",""\n'
    )
    q = stream_curate(spark, str(input_dir), store, ckpt)
    q.awaitTermination(120)
    cat = load_catalog(spark, store)
    brs1 = {r["omid"]: r for r in cat.br.collect()}
    assert any(r["title"] == "Stream One" for r in brs1.values())

    # second file arrives → only the new work is added; first file is NOT
    # reprocessed (checkpoint = the reference's cache.txt semantics)
    (input_dir / "b2.csv").write_text(
        header
        + '"doi:10.1000/s1","Stream One Again","","2020","","","","","journal article","",""\n'
        + '"doi:10.1000/s2","Stream Two","","2021","","","","","journal article","",""\n'
    )
    q2 = stream_curate(spark, str(input_dir), store, ckpt)
    q2.awaitTermination(120)
    cat2 = load_catalog(spark, store)
    brs2 = {r["omid"]: r for r in cat2.br.collect()}
    titles = {r["title"] for r in brs2.values()}
    assert "Stream Two" in titles
    # the duplicate DOI resolved to the existing entity, not re-minted
    assert len([t for t in titles if t and t.startswith("Stream One")]) == 1


def test_multimodal_features_and_dedup(spark):
    from oc_meta_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        exact_dedup_media,
        extract_features,
        frame_sample,
        real_decode,
    )

    rows = [
        (1, b"payload-a", "image/png", 10, 10, None),
        (2, b"payload-a", "image/png", 10, 10, None),  # exact dup of 1
        (3, b"payload-b", "video/mp4", None, None, 3500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == 3
    assert feats[1]["digest"] == feats[2]["digest"]
    assert feats[1]["features"] == feats[2]["features"]
    assert len(feats[3]["features"]) == 8
    assert feats[3]["n_bytes"] == len(b"payload-b")

    dups = exact_dedup_media(media).collect()
    assert len(dups) == 1 and dups[0]["media_ids"] == [1, 2]

    frames = frame_sample(media, every_ms=1000).collect()
    assert [f["sample_ts_ms"] for f in frames] == [0, 1000, 2000, 3000]

    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image/png")


def test_orcid_xml_extraction(spark):
    from oc_meta_spark.sources.orcid_xml import parse_orcid_summaries

    xml = """<record:record>
      <common:orcid-identifier>
        <common:path>0000-0002-1825-0097</common:path>
      </common:orcid-identifier>
      <person:name>
        <personal-details:given-names>Josiah</personal-details:given-names>
        <personal-details:family-name>Carberry</personal-details:family-name>
      </person:name>
      <activities:works>
        <common:external-id-type>doi</common:external-id-type>
        <common:external-id-value>10.5555/12345678</common:external-id-value>
        <common:external-id-type>doi</common:external-id-type>
        <common:external-id-value>10.5555/87654321</common:external-id-value>
      </activities:works>
    </record:record>"""
    df = spark.createDataFrame([(xml,), ("<record:record>no orcid</record:record>",)], ["xml"])
    rows = sorted(parse_orcid_summaries(df).collect(), key=lambda r: r["doi"])
    assert len(rows) == 2
    assert all(r["orcid"] == "0000-0002-1825-0097" for r in rows)
    assert rows[0]["given"] == "Josiah" and rows[0]["family"] == "Carberry"
    assert [r["doi"] for r in rows] == ["10.5555/12345678", "10.5555/87654321"]


def test_store_commit_atomic_and_replay_convergent(spark, tmp_path):
    """S7 manifest store: a crash before the manifest swap leaves the
    previous state fully readable, and replaying the same batch commit
    (the streaming checkpoint's recovery path) converges to the same
    store state as a single successful commit."""
    import json
    import os
    import shutil

    from oc_meta_spark.plans.curation import curate
    from oc_meta_spark.schemas import META_INPUT_COLUMNS
    from oc_meta_spark.streaming.micro_batch import MANIFEST, append_result, load_catalog

    def _input(rows):
        data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
        return spark.createDataFrame(data, META_INPUT_COLUMNS)

    store = str(tmp_path / "store")
    b1 = [{"id": "doi:10.1/a", "title": "One", "pub_date": "2020", "type": "journal article"}]
    r1 = curate(_input(b1), None, prefix="060")
    append_result(r1, store)
    cat1 = load_catalog(spark, store)
    n_br1 = cat1.br.count()
    assert n_br1 >= 1

    # crash simulation: uncommitted garbage directories are invisible
    os.makedirs(os.path.join(store, "br", "d999999"))
    r1.br_new.write.mode("overwrite").parquet(os.path.join(store, "br", "d999999"))
    assert load_catalog(spark, store).br.count() == n_br1

    # batch 2 against the committed catalog
    b2 = [{"id": "doi:10.1/b", "title": "Two", "pub_date": "2021", "type": "journal article"}]
    r2 = curate(_input(b2), load_catalog(spark, store), prefix="060")

    # commit once, then REPLAY the same commit as crash recovery would:
    # roll the manifest back (the swap "never happened") and commit again
    append_result(r2, store)
    manifest_path = os.path.join(store, MANIFEST)
    committed = json.load(open(manifest_path))
    state_once = {r["omid"]: r for r in load_catalog(spark, store).br.collect()}
    rollback = {"version": committed["version"] - 1, "tables": {
        k: [d for d in v if not d.endswith(f"{committed['version']:06d}")]
        for k, v in committed["tables"].items()
    }}
    with open(manifest_path, "w") as f:
        json.dump(rollback, f)
    append_result(r2, store)
    state_replay = {r["omid"]: r for r in load_catalog(spark, store).br.collect()}
    assert state_replay == state_once
    # counters survive the commit and drive the next batch's numbering
    counters = {r["kind"]: r["max_n"] for r in load_catalog(spark, store).counters.collect()}
    assert counters["br"] == len(state_once)


def test_store_compaction_preserves_catalog(spark, tmp_path):
    """compact_store merges accumulated deltas into one key-sorted snapshot
    per table behind the same atomic manifest swap; the catalog readback is
    identical before and after."""
    from oc_meta_spark.plans.curation import curate
    from oc_meta_spark.schemas import META_INPUT_COLUMNS
    from oc_meta_spark.streaming.micro_batch import (
        append_result,
        compact_store,
        load_catalog,
    )

    store = str(tmp_path / "store")
    for i in range(3):
        rows = [
            {
                "id": f"doi:10.1000/cp{i}",
                "title": f"Work {i}",
                "author": f"Fam{i}, G",
                "pub_date": "2021",
                "type": "journal article",
            }
        ]
        data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
        catalog = load_catalog(spark, store)
        result = curate(spark.createDataFrame(data, META_INPUT_COLUMNS), catalog, prefix="060")
        append_result(result, store)

    before = {
        k: sorted(tuple(r) for r in getattr(load_catalog(spark, store), k).collect())
        for k in ("br", "ra", "id", "entity_id", "ar", "prov")
    }
    n = compact_store(spark, store)
    assert n >= 4  # br, id, entity_id, ar, prov had 3 deltas each
    after = {
        k: sorted(tuple(r) for r in getattr(load_catalog(spark, store), k).collect())
        for k in ("br", "ra", "id", "entity_id", "ar", "prov")
    }
    assert before == after
    # idempotent: nothing left to compact
    assert compact_store(spark, store) == 0


def test_preprocess_filter_dedup_report(spark):
    """SURVEY §3.2 one-call tool: existing-id row filter (all-ids-exist
    semantics, id-less rows pass), full-row dedup, A8-style report."""
    from oc_meta_spark.plans.preprocess import preprocess
    from oc_meta_spark.schemas import META_INPUT_COLUMNS

    rows = [
        {"id": "doi:10.1/a doi:10.1/b", "title": "All Exist"},       # dropped (both known)
        {"id": "doi:10.1/a doi:10.1/new", "title": "One New"},       # kept (one unknown)
        {"id": "", "title": "No Ids"},                               # kept (id-less passes)
        {"id": "doi:10.1/x", "title": "Dup"},
        {"id": "doi:10.1/x", "title": "Dup"},                        # exact dup -> dropped
    ]
    data = [tuple(r.get(c, "") for c in META_INPUT_COLUMNS) for r in rows]
    df = spark.createDataFrame(data, META_INPUT_COLUMNS)
    existing = spark.createDataFrame([("doi:10.1/a",), ("doi:10.1/b",)], "id string")
    r = preprocess(df, existing)
    titles = sorted(x["title"] for x in r.kept.collect())
    assert titles == ["Dup", "No Ids", "One New"]
    rep = r.report.first()
    assert (rep["total_rows"], rep["existing_ids_rows"], rep["duplicate_rows"], rep["written_rows"]) == (5, 1, 1, 3)
    assert rep["written_pct"] == 60.0


def test_release_session_state_invalidates_checkpoints(spark):
    """Pin release_session_state's contract (r12 ADVICE / r13 verdict #8):
    it frees EVERY persisted RDD block — so leftover checkpoint blocks stop
    taxing later queries (the bench/nightly hygiene use) — and any LIVE
    localCheckpointed frame held across the call is unrecomputable and must
    fail LOUDLY on its next action, never silently recompute stale data.
    Plain persist()-ed frames keep their lineage and just recompute."""
    import pyspark.sql.functions as F

    from oc_meta_spark.session import release_session_state

    jsc = spark.sparkContext._jsc

    # a plain persisted frame survives the release (lineage intact)
    persisted = spark.range(100).withColumn("v", F.col("id") * 2).persist()
    assert persisted.count() == 100
    # a checkpointed frame's blocks are pinned until released
    cp = spark.range(50).withColumn("v", F.col("id") + 1).localCheckpoint()
    assert cp.count() == 50
    assert jsc.getPersistentRDDs().size() > 0

    release_session_state(spark)

    assert jsc.getPersistentRDDs().size() == 0, "release must free every block"
    assert persisted.count() == 100  # recomputed from lineage, still correct
    with pytest.raises(Exception, match="(?i)checkpoint|block|recomput"):
        cp.count()  # truncated lineage -> loud failure, not silent wrong data
