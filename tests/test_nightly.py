"""The composed nightly pipeline (plans/nightly.py + streaming/ingest.py's
nightly=True path): every persisted store fed from one fold's survivor
sets, replay idempotency across ALL stores in one commit, compaction of
the additive tables, and the manifest's store-mode guard.

The VALUE semantics of the composition (verdicts + per-store outputs vs
a from-scratch oracle) are gated by IN2 in plans/nightly_queries.py +
tests/test_correctness.py; these tests pin the persisted-store behavior
the oracle cannot see.  The decontamination composition's persisted
behavior is pinned in tests/test_streaming_ingest.py; its values by the
IN3 gate."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from oc_meta_spark.plans.domain_stats import build_domain_stats
from oc_meta_spark.plans.lm_counts import build_lm_counts
from oc_meta_spark.plans.nightly import build_nightly_stores, nightly_fold
from oc_meta_spark.plans.postings_index import build_postings_index
from oc_meta_spark.streaming.ingest import (
    bootstrap_store,
    compact_ingest_store,
    ingest_batch,
    load_ingest_store,
    load_nightly_stores,
)

SCHEMA = "doc_id long, text string, domain string"

BASE = [
    (100, "alpha beta gamma delta epsilon zeta", "a.org"),
    (101, "one two three four five six seven", "a.org"),
    (102, "red green blue yellow purple orange", "b.org"),
]
B0 = [
    (1, "fresh words never seen before anywhere", "a.org"),
    (2, "alpha beta gamma delta epsilon zeta", "b.org"),  # exact dup of 100
    (3, "more fresh material with new tokens", "b.org"),
]
B1 = [
    (11, "fresh words never seen before anywhere", "a.org"),  # dup of b0 survivor 1
    (12, "entirely novel text for batch one run", "b.org"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _manifest(store):
    with open(os.path.join(store, "MANIFEST.json"), encoding="utf-8") as f:
        return json.load(f)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _corpus_final(spark):
    """What the corpus must hold after BASE ∪ survivors(B0) ∪ survivors(B1):
    docs 2 and 11 are exact duplicates and never enter."""
    keep = [r for r in BASE + B0 + B1 if r[0] not in (2, 11)]
    return _mk(spark, keep)


def test_store_mode_is_recorded_and_guarded(spark, tmp_path):
    """The manifest records the store's mode at bootstrap, and every
    mixed-mode call refuses loudly — a nightly ingest into a plain store
    (or vice versa) would maintain the derived tables for only some
    commits, silently under-counting (round-11 ADVICE)."""
    plain = str(tmp_path / "plain")
    bootstrap_store(spark, _mk(spark, BASE).select("doc_id", "text"), plain)
    assert _manifest(plain)["mode"] == "plain"
    with pytest.raises(ValueError, match="mode=plain.*mode=nightly"):
        ingest_batch(spark, _mk(spark, B0), plain, 0, nightly=True)
    with pytest.raises(ValueError, match="load_nightly_stores needs a nightly"):
        load_nightly_stores(spark, plain)

    night = str(tmp_path / "night")
    bootstrap_store(spark, _mk(spark, BASE), night, nightly=True)
    assert _manifest(night)["mode"] == "nightly"
    with pytest.raises(ValueError, match="mode=nightly.*mode=plain"):
        ingest_batch(spark, _mk(spark, B0).select("doc_id", "text"), night, 0)

    # a store with committed state but no recorded mode predates the
    # marker: refused, never guessed
    m = _manifest(night)
    del m["mode"]
    with open(os.path.join(night, "MANIFEST.json"), "w", encoding="utf-8") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="predates mode recording"):
        ingest_batch(spark, _mk(spark, B0), night, 0, nightly=True)

    # compaction must carry the mode marker through its manifest rewrite
    night2 = str(tmp_path / "night2")
    bootstrap_store(spark, _mk(spark, BASE), night2, nightly=True)
    ingest_batch(spark, _mk(spark, B0), night2, 0, nightly=True)
    assert compact_ingest_store(spark, night2) > 0
    assert _manifest(night2)["mode"] == "nightly"


def test_fold_stores_equal_from_scratch_builds(spark):
    """After the in-memory fold, EVERY store equals its from-scratch
    build over the final corpus — extend≡rebuild composed through the
    classification (the gate pins this at sf0.01 via SQL; here against
    the Spark builders on a controlled corpus)."""
    verdicts, stores = nightly_fold(
        [_mk(spark, B0), _mk(spark, B1)], build_nightly_stores(_mk(spark, BASE))
    )
    got = {r["doc_id"]: r["verdict"] for r in verdicts.collect()}
    assert got == {1: "unique", 2: "exact_dup", 3: "unique",
                   11: "exact_dup", 12: "unique"}
    final = _corpus_final(spark)
    scratch_p = build_postings_index(final.select("doc_id", "text"))
    assert _rows(stores.postings.postings) == _rows(scratch_p.postings)
    assert _rows(stores.postings.docs) == _rows(scratch_p.docs)
    scratch_lm = build_lm_counts(final.select("doc_id", "text"))
    assert _rows(stores.lm.heads) == _rows(scratch_lm.heads)
    assert _rows(stores.lm.bigrams) == _rows(scratch_lm.bigrams)
    scratch_d = build_domain_stats(final.select("doc_id", "domain", "text"))
    assert _rows(stores.domains.domain_stats) == _rows(scratch_d.domain_stats)
    assert _rows(stores.domains.prefix_domain) == _rows(scratch_d.prefix_domain)


def _loaded_rows(spark, store):
    postings, lm, doms = load_nightly_stores(spark, store)
    return {
        "postings": _rows(postings.postings.select("term", "doc_id", "tf", "tp")),
        "heads": _rows(lm.heads.select("w1", "c1", "gp")),
        "bigrams": _rows(lm.bigrams.select("w1", "w2", "c12", "gp")),
        "dstats": _rows(doms.domain_stats),
        "pdom": _rows(doms.prefix_domain.select("prefix5", "domain", "n_docs", "pp")),
        "docs": _rows(postings.docs),
    }


def test_persisted_nightly_store_replay_and_compaction(spark, tmp_path):
    """The persisted composition: bootstrap + two nightly batches land
    every store's deltas under ONE manifest commit each; the loaded
    stores equal from-scratch builds; a replayed batch changes NOTHING
    in any store (the single-guard property — the additive tables would
    double without it); compaction rolls the additive tables up without
    changing any aggregate."""
    store = str(tmp_path / "nightly_store")
    bootstrap_store(spark, _mk(spark, BASE), store, nightly=True)
    ingest_batch(spark, _mk(spark, B0), store, 0, nightly=True)
    ingest_batch(spark, _mk(spark, B1), store, 1, nightly=True)
    v3 = _manifest(store)["version"]
    assert v3 == 3

    final = _corpus_final(spark)
    scratch_p = build_postings_index(final.select("doc_id", "text"))
    scratch_lm = build_lm_counts(final.select("doc_id", "text"))
    scratch_d = build_domain_stats(final.select("doc_id", "domain", "text"))
    want = {
        "postings": _rows(scratch_p.postings.select("term", "doc_id", "tf", "tp")),
        "heads": _rows(scratch_lm.heads.select("w1", "c1", "gp")),
        "bigrams": _rows(scratch_lm.bigrams.select("w1", "w2", "c12", "gp")),
        "dstats": _rows(scratch_d.domain_stats),
        "pdom": _rows(scratch_d.prefix_domain.select("prefix5", "domain", "n_docs", "pp")),
        "docs": _rows(final.select("doc_id")),
    }
    assert _loaded_rows(spark, store) == want

    # replay batch 1: the verdict-log guard empties it — NO new manifest
    # version, no store movement (one guard protects every table)
    ingest_batch(spark, _mk(spark, B1), store, 1, nightly=True)
    assert _manifest(store)["version"] == v3
    assert _loaded_rows(spark, store) == want

    # compaction: additive tables roll up per key, everything else is
    # re-laid-out — all loaded aggregates unchanged; the lm_heads table
    # now holds one row per head (pre-aggregated snapshot)
    assert compact_ingest_store(spark, store) > 0
    assert _loaded_rows(spark, store) == want
    m = _manifest(store)["tables"]
    assert len(m["lm_heads"]) == 1
    heads_raw = spark.read.parquet(os.path.join(store, m["lm_heads"][0]))
    assert heads_raw.groupBy("w1").count().filter(F.col("count") > 1).count() == 0
    # the dedup side of the store is untouched by the composition
    index, corpus, _ = load_ingest_store(spark, store)
    assert _rows(corpus.select("doc_id")) == _rows(final.select("doc_id"))


def test_plain_store_has_no_nightly_tables(spark, tmp_path):
    """nightly=False stores never grow the composed tables, and a
    domain-less feed into nightly=True is refused loudly (on a fresh
    store, where the mode guard does not fire first)."""
    store = str(tmp_path / "plain_store")
    bootstrap_store(spark, _mk(spark, BASE).select("doc_id", "text"), store)
    ingest_batch(spark, _mk(spark, B0).select("doc_id", "text"), store, 0)
    tables = _manifest(store)["tables"]
    assert "postings" not in tables and "lm_heads" not in tables
    with pytest.raises(ValueError, match="domain column"):
        ingest_batch(
            spark,
            _mk(spark, B1).select("doc_id", "text"),
            str(tmp_path / "fresh_store"),
            0,
            nightly=True,
        )
