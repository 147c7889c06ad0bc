"""Unit tests for the corpus-statistics operators (SK1 / VB1) beyond the
oracle gates: the KMV estimator must fall back to the exact count below
k (the small-domain rule), and the BPE pair counts must weight by word
frequency INCLUDING within-word multiplicity."""

from __future__ import annotations

import os

from oc_meta_spark.plans.registry import load_all


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in rows],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_sk1_exact_below_k(spark, tmp_path):
    # 3 distinct shingles ("a b c", "b c d", "c d e") — far below k=64:
    # the estimator must answer the exact count, not divide by a tiny u_k
    sf = _write_docs(spark, tmp_path, [(1, "a b c d e"), (2, "a b c")])
    row = load_all()["SK1_kmv_distinct_sketch"].builder(spark, sf).collect()[0]
    assert row.n_kept == 3
    assert row.est_distinct == 3
    assert row.exact_distinct == 3


def test_vb1_weights_by_frequency_and_multiplicity(spark, tmp_path):
    # "aaa" (freq 2) contributes pair "aa" twice per occurrence → cnt 4;
    # "ab" (freq 3) contributes "ab" → cnt 3; 1-char words contribute none
    sf = _write_docs(spark, tmp_path, [(1, "aaa ab x aaa"), (2, "ab ab x")])
    rows = {r.pair: r for r in load_all()["VB1_bpe_pair_stats"].builder(spark, sf).collect()}
    assert rows["aa"].cnt == 4 and rows["aa"].rank == 1
    assert rows["ab"].cnt == 3 and rows["ab"].rank == 2
    assert "x" not in rows and set(rows) == {"aa", "ab"}


def test_ir1_rare_term_outranks_common(spark, tmp_path):
    # "merge" is in every doc (idf weight 1000·4//4 = 1000); "vector" in
    # one (weight 4000): the single vector doc must outrank a doc with
    # more merge hits, and docs hitting no query term must not appear
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "merge vector merge"),
            (2, "merge merge merge merge merge"),
            (3, "merge x y"),
            (4, "merge nothing relevant here"),
        ],
    )
    rows = load_all()["IR1_keyword_search_topk"].builder(spark, sf).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3, 4]
    # doc1: 2*1000 + 1*4000 = 6000; doc2: 5*1000 = 5000
    assert rows[0].score == 6000 and rows[0].n_terms_hit == 2
    assert rows[1].score == 5000 and rows[1].n_terms_hit == 1
    assert [r.rank for r in rows] == [1, 2, 3, 4]


def test_sk2_merged_sketch_equals_direct(spark, sf_dir):
    """KMV mergeability is lossless: the two half-corpus sketch states
    union into exactly the direct whole-corpus sketch (same k minima,
    same kth hash, same estimate)."""
    from oc_meta_spark.plans.registry import load_all

    qs = load_all()
    merged = qs["SK2_mergeable_kmv_sketch"].builder(spark, sf_dir).first()
    direct = qs["SK1_kmv_distinct_sketch"].builder(spark, sf_dir).first()
    assert (merged["n_kept"], merged["hk"], merged["est_distinct"]) == (
        direct["n_kept"], direct["hk"], direct["est_distinct"]
    )
