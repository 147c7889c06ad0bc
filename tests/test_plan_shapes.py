"""Physical-plan shape assertions for the headline queries.

Correctness gates prove VALUES; these tests pin the PLAN properties that
make the queries survive a 100× scale-up: filters pushed into the parquet
scan, column pruning in ReadSchema, small dimensions broadcast instead of
shuffled, and windows partitioned (never single-task).  A regression here
would still pass the oracles at test SF while silently becoming a
cluster-killer — exactly the failure mode .explain() review catches.
"""

from __future__ import annotations

import os
import re

import pytest

from oc_meta_spark.plans.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    q = load_all()[name]
    return q.builder(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_a1_column_pruning(spark):
    # A1 scans every row by design (no filter) — but must not read every
    # lineitem column
    plan = _plan(spark, "A1_pricing_summary")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and "l_comment" not in m.group(1) and "l_shipmode" not in m.group(1), (
        m.group(0) if m else "no FileScan"
    )


def test_w5_filter_reaches_parquet_scan(spark):
    plan = _plan(spark, "W5_first_non_null_propagation")
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(user_id,100\)", plan), plan[:3000]


def test_j6_broadcasts_small_dims(spark):
    plan = _plan(spark, "J6_hierarchy_revenue")
    # nation/region are tiny dimensions: they must arrive via broadcast,
    # not a shuffled sort-merge join
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:3000]


def test_w4_window_is_partitioned(spark):
    plan = _plan(spark, "W4_latest_event_per_user")
    assert "Window" in plan
    # a global (unpartitioned) window plans a SinglePartition exchange
    assert not re.search(r"Exchange SinglePartition.*\n.*Window", plan), plan[:3000]


def test_x5_broadcasts_centroids(spark):
    plan = _plan(spark, "X5_ivf_ann")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan[:3000]


def test_d18_scan_prunes_documents(spark):
    plan = _plan(spark, "D18_jaccard_similarity_join")
    m = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and all("media" not in s and "embedding" not in s for s in m), m


def test_d20_no_cartesian_product(spark):
    # banded SimHash join must block on (band, value) — an equi-join —
    # never a cartesian candidate generation
    plan = _plan(spark, "D20_simhash_hamming_neardup")
    assert "CartesianProduct" not in plan, plan[:3000]


def test_t5_single_scan_no_shuffle(spark):
    # per-row token counting is a narrow map: one scan, no Exchange other
    # than the final orderBy's range partitioning
    plan = _plan(spark, "T5_bpe_token_count")
    assert plan.count("FileScan parquet") == 1, plan[:3000]
    exchanges = [l for l in plan.splitlines() if "Exchange" in l and "rangepartitioning" not in l]
    assert not exchanges, exchanges


def test_fidelity_gates_prune_scan_columns(spark):
    # the scalar-fidelity gates synthesize inputs from one key column (+
    # at most name/segment) — reading wider rows would be wasted IO at scale
    for name, allowed in (
        ("F3_type_aliasing", {"p_partkey"}),
        ("C14_venue_type_inference", {"p_partkey"}),
        ("C7_ra_name_normalization", {"c_custkey", "c_name", "c_mktsegment"}),
    ):
        plan = _plan(spark, name)
        m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
        assert m, f"{name}: no FileScan"
        cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
        assert cols <= allowed, f"{name}: scan reads {cols}"


def test_mx1_sample_filter_is_scan_predicate(spark):
    # the keep/drop hash predicate must run in the scan stage (no shuffle
    # at all before the final orderBy): at 100 TB a mixing pass that
    # shuffles is a cluster-killer
    plan = _plan(spark, "MX1_stratified_source_sample")
    exchanges = [l for l in plan.splitlines() if "Exchange" in l and "rangepartitioning" not in l]
    assert not exchanges, exchanges
    assert plan.count("FileScan parquet") == 1, plan[:3000]


def test_mx2_window_is_salted_by_range_class(spark):
    # the packing prefix sum is rank-refined (round 10): the corpus-row
    # running-sum window is partitioned by (source, rb) — a mega-source
    # never sums its whole extent in one task; the rollup cumsum window
    # stays per-source over bounded rollup rows
    plan = _plan(spark, "MX2_token_budget_packing")
    found = False
    for line in plan.splitlines():
        if "Window" in line and "n_tok" in line and "doc_id" in line:
            found = True
            assert re.search(r"\[source#\d+, rb#\d+L?\]", line), line
    assert found, "no in-class running-sum Window in MX2 plan — vacuous\n" + plan[:3000]
    assert not re.search(r"Exchange SinglePartition.*\n.*Window", plan), plan[:3000]


def test_d21_no_cartesian_product(spark):
    # pair generation is the banded equi-join from D16; CC joins on node
    plan = _plan(spark, "D21_neardup_cluster_collapse")
    assert "CartesianProduct" not in plan, plan[:3000]


def test_t6_aggregates_are_partial(spark):
    # n-gram stats must partial-aggregate map-side (hash aggregate pairs),
    # never sort the corpus globally before aggregation
    plan = _plan(spark, "T6_repetition_signals")
    assert "HashAggregate" in plan, plan[:2000]


def test_dc1_broadcasts_benchmark_side(spark):
    plan = _plan(spark, "DC1_benchmark_decontamination")
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan[:3000]
    assert "CartesianProduct" not in plan


def test_dc2_redaction_is_scan_stage(spark):
    plan = _plan(spark, "DC2_pii_redaction")
    exchanges = [l for l in plan.splitlines() if "Exchange" in l and "rangepartitioning" not in l]
    assert not exchanges, exchanges
    assert plan.count("FileScan parquet") == 1, plan[:3000]


def test_d23_no_cartesian_and_gram_agg_hashes(spark):
    # dup-gram detection is one hash aggregate on the gram + a left-semi
    # equi-join back — never a document×document comparison
    plan = _plan(spark, "D23_cross_doc_span_dedup")
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "HashAggregate" in plan, plan[:2000]


def test_x7_eps_join_keys_on_cell(spark):
    # the N×k centroid assignment is an intentional broadcast nested-loop
    # (k rows, appears once per reuse of the cells subtree); the eps dedup
    # self-join must key on the cell id — an EQUI join (sort-merge / hash),
    # never cartesian candidate generation
    plan = _plan(spark, "X7_semantic_dedup")
    assert "CartesianProduct" not in plan, plan[:3000]
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cid", plan), plan[:3000]
    # every nested-loop in the plan is a centroid broadcast (k-row side)
    assert plan.count("BroadcastNestedLoopJoin BuildRight") == plan.count(
        "BroadcastNestedLoopJoin"
    ), plan[:3000]


def test_p1_pipeline_single_scan_no_cartesian(spark):
    # the composed pipeline reads documents once: quality predicate in the
    # scan stage, dedup + rollup as keyed hash aggregates on top
    plan = _plan(spark, "P1_corpus_prep_pipeline")
    assert plan.count("FileScan parquet") == 1, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_mx3_totals_broadcast_back(spark):
    # the scalar totals and the per-source epoch table are tiny — they must
    # come back as broadcasts, never shuffle the fact table against them
    plan = _plan(spark, "MX3_mixture_epoch_upsampling")
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan[:3000]


def test_t7_classifier_is_scan_stage(spark):
    # the quality model is a narrow per-row map: no shuffle before the
    # final orderBy, single scan
    plan = _plan(spark, "T7_quality_classifier")
    exchanges = [l for l in plan.splitlines() if "Exchange" in l and "rangepartitioning" not in l]
    assert not exchanges, exchanges
    assert plan.count("FileScan parquet") == 1, plan[:3000]


def test_dc3_blocks_then_verifies(spark):
    # fuzzy decontamination must candidate on (band, bucket) — an equi
    # join — and broadcast the tiny benchmark side; never corpus×benchmark
    plan = _plan(spark, "DC3_fuzzy_decontamination")
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan[:3000]


def test_id1_delta_keyed_joins(spark):
    # incremental dedup must candidate on (band, bucket) and verify on
    # (i_id, k, h) — equi-joins, never corpus×delta.  The only nested
    # loops allowed are the bounded 8-row minhash k-fanout broadcasts
    # (the same shape D16 has always used).
    plan = _plan(spark, "ID1_incremental_corpus_dedup")
    assert "CartesianProduct" not in plan, plan[:3000]
    assert re.search(r"Join \[band#\d+L?, bucket#\d+\]", plan), plan[:3000]
    assert re.search(r"Join \[i_id#\d+L?, k#\d+, h#\d+\]", plan), plan[:3000]
    # round-9 nightly discipline: every corpus-sized index side is
    # left-semi prefiltered on a BROADCAST of delta-derived keys before
    # it joins (hashes on (hp,h), bands on (band,bucket), signatures on
    # candidate i_id) — the index is scanned, never shuffled
    semi_lines = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert len(semi_lines) >= 3, plan[:3000]
    assert all("BroadcastHashJoin" in l for l in semi_lines), semi_lines
    assert any(re.search(r"LeftSemi", l) and "hp#" in l for l in semi_lines), semi_lines
    assert any(re.search(r"\[i_id#\d+L?\], LeftSemi", l) for l in semi_lines), semi_lines


def test_sh1_window_is_partitioned_by_shard(spark):
    # the permutation rank is per-shard — a global (unpartitioned) window
    # would serialize the corpus through one task
    plan = _plan(spark, "SH1_seeded_corpus_shuffle")
    found = False
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            found = True
            # the Window operator's partition spec must be the shard column
            # (second bracket group on the operator line)
            assert re.search(r"row_number\(\).*\[shard#\d+\]", line), line
    assert found, "no row_number Window in SH1 plan — test would be vacuous\n" + plan[:3000]
    assert "hashpartitioning(shard" in plan, plan[:3000]


def test_x8_probes_are_semi_prefiltered(spark):
    # the persisted inverted lists must be left-semi prefiltered on a
    # broadcast of the probed cids before the candidate join — the
    # corpus-sized assignments side is scanned/pruned, never shuffled
    plan = _plan(spark, "X8_incremental_ivf_ann")
    assert "CartesianProduct" not in plan, plan[:3000]
    semi_lines = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert semi_lines, plan[:3000]
    assert any(
        "BroadcastHashJoin" in l and re.search(r"\[cid#\d+L?\], \[cid#\d+L?\], LeftSemi", l)
        for l in semi_lines
    ), semi_lines


def test_uf1_blocklist_is_broadcast_anti_join(spark):
    plan = _plan(spark, "UF1_domain_filter")
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    ), plan[:3000]
    # the per-domain cap is rank-refined: every row_number window is
    # salted by the doc_id range class — never domain alone (round 10)
    found = False
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            found = True
            assert re.search(r"\[domain#\d+, rb#\d+L?\]", line), line
    assert found, "no salted cap Window in UF1 plan — vacuous\n" + plan[:3000]


def test_no_cartesian_in_any_gate_plan(spark, sf_dir):
    """Blanket scale invariant (round-6): NO registered gate's physical
    plan may contain a CartesianProduct — bounded 1-row crossJoins (the
    invariant-projection gates) compile to BroadcastNestedLoopJoin, which
    is allowed.  Whole-pipeline gates are skipped here (r13 audit:
    retrieving their "plan" EXECUTES the pipeline — eager checkpoints —
    so the six worst cost 145 s of the test's 190 s to grep a
    checkpoint-TRUNCATED tail plan, i.e. most of their operators are not
    even visible to this scan).  Their constituent plan shapes are pinned
    by the named tests above and by the component suites
    (test_domain_stats/test_lm_counts assert the extend merges are keyed
    full-outer joins with no NestedLoop/Cartesian; test_incremental pins
    the fold probes); their values run against oracles in
    test_correctness.  The skip list is EXPLICIT so a new gate cannot
    silently join it."""
    from oc_meta_spark.plans.registry import load_all

    heavy_prefixes = ("CUR", "RT", "VR")
    heavy_names = {
        "EQ1_equalizer_field_precedence",  # curate() against preloaded catalog
        "IN1_streaming_ingest_dedup",  # ingest fold, eager verdict checkpoints
        "IN2_composed_nightly_fold",  # nightly fold, eager store checkpoints
        "IN3_nightly_decontam_fold",  # decontam fold, eager checkpoints
        "RL1_corpus_release",  # release pipeline, eager count/proxy checkpoints
        "NQ1_nquads_round_trip",  # sink round trip: builder writes+reads files
        "DC4_persisted_decontamination",  # builder writes+reads a store
    }
    offenders = []
    for name, q in load_all().items():
        if name.startswith(heavy_prefixes) or name in heavy_names:
            continue
        plan = q.builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_mx4_rank_window_is_salted_by_key_prefix(spark):
    # the within-stratum draw must never sort a whole stratum in one task
    # (round-9 weak finding): the only corpus-side rank window is salted
    # by the draw key's 2-char prefix — partitioned by (source, b), never
    # source alone; the quota/offset sides join broadcast
    plan = _plan(spark, "MX4_exact_quota_stratified_sample")
    found = False
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line and "skey" in line:
            found = True
            assert re.search(r"\[source#\d+, b#\d+\]", line), line
    assert found, "no corpus-side rank Window in MX4 plan — test would be vacuous\n" + plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_qt1_quantiles_need_no_corpus_row_window(spark):
    # value-at-rank over the bounded (source, n_chars) rollup: the plan
    # must contain NO row_number at all (the naive form's per-source rank
    # was the round-9 weak finding), and the scan must prune to exactly
    # the two columns the rollup needs
    plan = _plan(spark, "QT1_exact_group_quantiles")
    assert "row_number" not in plan, plan[:3000]
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "doc_id" not in m.group(1) and "text" not in m.group(1), m.group(0)


def test_px2_rank_windows_are_boundary_class_only(spark):
    # the tertile split may rank rows ONLY inside a straddling score
    # class, salted by the doc_id range class: every row_number window is
    # partitioned by (lang, milli_bits, rb) — never lang alone
    plan = _plan(spark, "PX2_perplexity_tertile_split")
    found = False
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            found = True
            assert re.search(r"\[lang#\d+, milli_bits#\d+L?, rb#\d+L?\]", line), line
    assert found, "no boundary-class rank Window in PX2 plan — vacuous\n" + plan[:3000]


def test_d19_row_windows_are_doc_bounded(spark):
    # the prefix-filter token order is consumed per doc: every row_number
    # window is partitioned by doc_id (bounded by document length) — the
    # former per-source window over the whole vocabulary (round-10 weak
    # finding) must not reappear
    plan = _plan(spark, "D19_prefix_filtered_jaccard")
    found = False
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            found = True
            assert re.search(r"partitionBy=\[doc_id#\d+L?\]", line) or re.search(
                r"\[doc_id#\d+L?\], \[", line
            ), line
    assert found, "no per-doc rank Window in D19 plan — vacuous\n" + plan[:3000]


def test_sd1_diff_is_one_full_outer_equi_join(spark):
    # the snapshot diff is ONE full outer equi-join on the key over
    # hash-projected scans — no cartesian, no second corpus shuffle class
    plan = _plan(spark, "SD1_corpus_snapshot_diff")
    assert "CartesianProduct" not in plan, plan[:3000]
    assert plan.count("FullOuter") == 1, plan[:3000]
    assert re.search(r"\[doc_id#\d+L?\], \[doc_id#\d+L?\], FullOuter", plan), plan[:3000]


def test_qb1_corpus_window_is_boundary_bucket_only(spark):
    # the only window that touches DOCUMENT rows is the final running sum
    # over the boundary bucket — partitioned by (q_ppm, bucket); the
    # score/bucket rollup windows are unpartitioned by design (bounded by
    # score resolution / 256 buckets, never corpus-sized)
    plan = _plan(spark, "QB1_token_budget_selection")
    found = False
    for line in plan.splitlines():
        if "Window" in line and "n_tok" in line and "skey" in line:
            found = True
            assert re.search(r"\[q_ppm#\d+L?, b1#\d+\]", line), line
    assert found, "no boundary-bucket running-sum Window in QB1 plan\n" + plan[:3000]


def test_px1_scan_prunes_to_scoring_columns(spark):
    # PX1 needs (doc_id, text, lang) only — n_chars/source must be pruned
    # from every documents scan
    plan = _plan(spark, "PX1_lm_bits_per_token_filter")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "n_chars" not in m.group(1) and "source" not in m.group(1), m.group(0)
    # the reference-slice scan pushes the lang filter into parquet
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(lang,en\)", plan), plan[:3000]


def test_sk1_and_ir1_topk_is_take_ordered(spark):
    # the k-smallest-hashes / top-k-scores steps must compile to
    # TakeOrderedAndProject (per-partition heap + driver merge), never a
    # global Sort feeding a limit
    for name in ("SK1_kmv_distinct_sketch", "IR1_keyword_search_topk"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name + "\n" + plan[:3000]
