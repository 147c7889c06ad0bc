"""RL1 — the corpus-release composition (plans/release_queries.py): the
pins the SQL oracle cannot state directly — released == (budget-selected
∩ train-split) against INDEPENDENTLY computed pieces, and the shard
store's stable seeded ordering across runs.

The VALUE semantics of the whole composed pipeline (scoring → selection
→ labels → shards vs the from-scratch SQL) are gated by RL1 in
tests/test_correctness.py and the driver."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from oc_meta_spark.sources.tables import load_table


def test_released_is_exactly_selected_intersect_train(spark, sf_dir):
    """The release set must be precisely (QB1-selected docs) ∩ (train
    split), with both sides recomputed here WITHOUT the persisted paths
    the builder uses: the LM model from one from-scratch build (≡ the
    builder's founding+extend by the PX3 contract) and the labels from
    the in-memory assignment kernel (≡ the builder's store write→update→
    read cycle by the HS2 contract)."""
    from oc_meta_spark.plans import release_queries as rq
    from oc_meta_spark.plans.incremental import (
        assign_holdout_incremental,
        seeded_split,
    )
    from oc_meta_spark.plans.lm_counts import build_lm_counts, score_with_counts
    from oc_meta_spark.plans.quality_queries import _PX1_REF_LANG, budget_select

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("lang") == _PX1_REF_LANG).select("doc_id", "text")
    scored = score_with_counts(docs, build_lm_counts(train))
    t = scored.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok")), "doc_id"
    ).select(
        "doc_id",
        (-F.col("milli_bits")).alias("q_ppm"),
        "n_tok",
        F.md5(
            F.concat(
                F.lit(rq._RL1_SEL_SEED), F.lit(":"), F.col("doc_id").cast("string")
            )
        ).alias("skey"),
    )
    selected = {r["doc_id"] for r in budget_select(t).collect()}

    prior = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        seeded_split(rq._RL1_PRIOR_SEED, "doc_id").alias("split"),
        (F.col("doc_id") % 7).alias("assigned_epoch"),
    )
    clustered = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 90 == 0, -(F.col("doc_id") + 1))
        .otherwise(F.expr("(doc_id div 9) * 9"))
        .alias("cluster"),
    )
    labels = assign_holdout_incremental(clustered, prior, seed=rq._RL1_HOLD_SEED)
    train_ids = {
        r["doc_id"] for r in labels.filter(F.col("split") == "train").collect()
    }

    released = {r["doc_id"] for r in rq.rl1_released_docs(spark, sf_dir).collect()}
    assert released == selected & train_ids
    # non-degenerate in every direction: something released, something
    # selected-but-held-out, something train-but-over-budget
    assert released
    assert selected - train_ids
    assert train_ids - selected


def test_release_shards_are_stable_and_seed_ordered(spark, sf_dir):
    """Two runs of the full gate produce IDENTICAL shard rows (the
    reproducible-training-order contract), and the store's layout is the
    seed's: sort_key = md5(seed:doc_id), shard = its first 48 bits mod
    n_shards, pos = the dense per-shard rank of (sort_key, doc_id)."""
    from oc_meta_spark.plans import release_queries as rq

    a = rq.rl1_corpus_release(spark, sf_dir).collect()
    b = rq.rl1_corpus_release(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == rq._RL1_SHARDS
    for rows in by_shard.values():
        in_order = sorted(rows, key=lambda r: (r["sort_key"], r["doc_id"]))
        assert [r["pos"] for r in in_order] == list(range(1, len(rows) + 1))
    for r in a:
        key = hashlib.md5(
            f"{rq._RL1_SHARD_SEED}:{r['doc_id']}".encode()
        ).hexdigest()
        assert r["sort_key"] == key
        assert r["shard"] == int(key[:12], 16) % rq._RL1_SHARDS
