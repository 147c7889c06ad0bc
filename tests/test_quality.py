"""Unit tests for the quality operators (PX1 / QB1 / DR1) beyond the
oracle gates: the two-phase budget selection must equal the naive global
prefix on adversarial shapes the sf tables don't exhibit (a huge boundary
score class, an exact-boundary budget), PX1's scoring must be monotone in
the evidence and skip unscorable docs, and DR1's verdict thresholds must
fire on planted inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from oc_meta_spark.plans.quality_queries import (
    _DR1_QUALITY_FLOOR_PPM,
    _QB1_SEED,
    budget_select,
)


def _keyed(spark, rows):
    """rows: (doc_id, q_ppm, n_tok) → the frame budget_select expects."""
    t = spark.createDataFrame(rows, schema="doc_id long, q_ppm long, n_tok long")
    return t.withColumn(
        "skey",
        F.md5(F.concat(F.lit(_QB1_SEED), F.lit(":"), F.col("doc_id").cast("string"))),
    )


def _naive(t):
    """The corpus-wide-window spec budget_select refines away."""
    from pyspark.sql import Window

    w = Window.partitionBy().orderBy(
        F.col("q_ppm").desc(), "skey", "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    budget = t.agg(F.expr("sum(n_tok) div 2").alias("budget"))
    return (
        t.withColumn("cum", F.sum("n_tok").over(w))
        .join(F.broadcast(budget))
        .filter(F.col("cum") <= F.col("budget"))
        .select("doc_id", "q_ppm", "n_tok")
    )


def _assert_matches_naive(t):
    want = sorted(_naive(t).collect())
    for n_levels in (0, 1, 2):
        got = sorted(budget_select(t, n_levels=n_levels).collect())
        assert got == want, f"n_levels={n_levels}"


def test_qb1_refinement_single_score_class(spark):
    # every doc shares ONE score: level 1 admits nothing, the whole
    # corpus is the boundary class — the shape the 256-bucket refinement
    # exists for; the rank window must still pick the exact global prefix
    t = _keyed(spark, [(i, 500, 10 + (i % 7)) for i in range(400)])
    _assert_matches_naive(t)


def test_qb1_exact_boundary_no_straddle(spark):
    # budget lands exactly on a score-class edge: class A (q=900) holds
    # exactly half the tokens, so it is admitted whole and NO boundary
    # class exists — the empty-boundary path must not emit or drop rows
    rows = [(i, 900, 10) for i in range(10)] + [(100 + i, 100, 10) for i in range(10)]
    t = _keyed(spark, rows)
    _assert_matches_naive(t)


def test_qb1_mixed_scores_matches_naive(spark):
    rows = [(i, (i * 37) % 11, 5 + (i * 13) % 9) for i in range(300)]
    t = _keyed(spark, rows)
    _assert_matches_naive(t)


def test_px1_oov_doc_costs_more_and_short_docs_unscored(spark, tmp_path):
    import os

    from oc_meta_spark.plans.registry import load_all

    # reference slice: one English doc establishing the bigram "a b"
    # (cheap); doc 2 is pure OOV (expensive); doc 3 has one word — no
    # bigram, must be absent from the output entirely
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b", "en", "src0", 15),
            (2, "zz yy xx ww vv uu tt ss", "fr", "src1", 23),
            (3, "solo", "fr", "src1", 4),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r.doc_id: r
        for r in load_all()["PX1_lm_bits_per_token_filter"].builder(spark, sf).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].milli_bits < out[2].milli_bits
    assert out[1].n_bigrams == 7 and out[2].n_bigrams == 7
    # doc 1's bigrams are all in-model: cost = fl2(c1+V) - fl2(c12+1);
    # "a b" has c1(a)=4 (heads: a b a b a b a -> a appears 4x as head),
    # V = 3 (a, b, +1 OOV) → fl2(7)=2; c12(a,b)=4 → fl2(5)=2 → 0 bits.
    # "b a" c1(b)=3, fl2(6)=2; c12=3, fl2(4)=2 → 0 bits.
    assert out[1].total_bits == 0
    # doc 2: every bigram unseen → fl2(0+3)-fl2(0+1) = 1 - 0 = 1 bit each
    assert out[2].total_bits == 7


def test_dr1_planted_boilerplate_domain_quarantined(spark, tmp_path):
    import os

    from oc_meta_spark.plans.registry import load_all

    # domain src0-0 (doc_ids 0..19): 10 docs share a 5-word prefix →
    # half duplicated → quarantine; domain src1-0 (doc_ids 100..119,
    # (100 div 20) % 5 = 0): unique prefixes but tiny vocabulary → low
    # quality; domain src2-1 (doc_ids 2x): unique prefixes, rich text
    boiler = "copy this exact header now"
    rows = []
    for i in range(10):
        rows.append((i, f"{boiler} unique tail {i} alpha beta", "en", "src0"))
    for i in range(10, 20):
        rows.append((i, f"own opening line number {i} gamma delta", "en", "src0"))
    for i in range(100, 120):
        # distinct prefix (no dup charge) but 2/25 distinct words →
        # q_ppm = 80 < floor
        rows.append((i, f"id{i} " + " ".join(["spam"] * 24), "en", "src1"))
    for i in range(20, 40):
        rows.append(
            (i, f"document {i} " + " ".join(f"w{i}x{j}" for j in range(10)), "en", "src2")
        )
    docs = spark.createDataFrame(
        [(d, t, lang, s, len(t)) for d, t, lang, s in rows],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.domain: r for r in load_all()["DR1_domain_reputation"].builder(spark, sf).collect()}
    assert out["src0-0.example.org"].verdict == "quarantine"
    assert out["src0-0.example.org"].n_dup_docs == 10
    lowq = out["src1-0.example.org"]
    assert lowq.verdict == "low_quality" and lowq.q_ppm < _DR1_QUALITY_FLOOR_PPM
    assert out["src2-1.example.org"].verdict == "ok"


def test_qb1_budget_below_first_doc_keeps_nothing(spark):
    # two docs; budget = total div 2 = 10 < first doc's 15 tokens → the
    # boundary class's rank window must keep nothing, not underflow
    t = _keyed(spark, [(1, 900, 15), (2, 100, 5)])
    _assert_matches_naive(t)
    assert budget_select(t).count() == 0


def test_px2_tertiles_balanced_per_lang_and_share_px1_scores(spark, sf_dir):
    from oc_meta_spark.plans.registry import load_all

    qs = load_all()
    rows = qs["PX2_perplexity_tertile_split"].builder(spark, sf_dir).collect()
    px1 = {r.doc_id: r.milli_bits for r in
           qs["PX1_lm_bits_per_token_filter"].builder(spark, sf_dir).collect()}
    # one shared scorer: identical milli_bits per doc
    assert all(px1[r.doc_id] == r.milli_bits for r in rows)
    # exact tertiles: per lang the three buckets differ by at most 1 doc,
    # and within a lang every head score <= every middle <= every tail
    from collections import defaultdict

    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.bucket].append(r.milli_bits)
    full_tertile_langs = 0
    for lang, b in by_lang.items():
        sizes = [len(b["head"]), len(b["middle"]), len(b["tail"])]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        # a lang with < 3 scorable docs legitimately lacks a bucket — only
        # compare head vs tail where both exist (clean assertion failure,
        # never a ValueError on an empty max/min if the fixture shifts)
        if b["head"] and b["tail"]:
            full_tertile_langs += 1
            assert max(b["head"]) <= min(b["tail"]), lang
    assert full_tertile_langs > 0, "no lang with all three buckets — vacuous"
