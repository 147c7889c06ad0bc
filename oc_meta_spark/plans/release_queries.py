"""RL1 — the corpus-RELEASE composition: the consumption twin of IN2.

IN2 pins store MAINTENANCE (every persisted corpus store updates
together from one ingest fold); this gate pins the release path that
CONSUMES those stores — the pipeline a training run actually reads:

1. **score** with the persisted LM counts (PX3's build→extend→
   ``score_with_counts`` path — founding slice extended with the delta,
   so the scoring model is the store's, not a from-scratch rebuild);
2. **budget-select** with QB1's aggregate-then-refine kernel
   (``budget_select``), ordered cheapest-bits-first: quality =
   −milli_bits, so the most reference-like documents fill the token
   budget (half the scorable corpus's tokens) first;
3. **label** with the holdout history: the persisted store cycle
   (``write_holdout_assignments`` → ``nightly_holdout_update`` →
   ``read_holdout_assignments``) assigns tonight's new docs without
   moving yesterday's, and only the **train** split is releasable —
   val/test docs never enter training shards no matter how cheap their
   bits are;
4. **write epoched shuffled shards** (SH1's sink,
   ``write_shuffled_shards``/``read_shuffled_shards``): the released set
   lands in the seeded deterministic training order, and the gate's
   output is the read-back store itself — (shard, pos, doc, score,
   tokens), the loader's view.

The oracle re-derives every stage from scratch in SQL: PX's scoring
CTEs (``PX_SCORING_CTES`` verbatim), QB1's naive global-window
selection, HS2's incremental-assignment CTEs, and SH1's md5 rank — so
the composed persisted path must reproduce the from-scratch pipeline
bit for bit.  tests/test_release.py additionally pins released ==
(selected ∩ train) and the stable per-shard ordering.

Releasability contract: a document with fewer than 2 words has no
bigrams, hence no LM score, hence no place in a bits-ordered budget —
unscoreable docs are NOT releasable (both engines: the scoring stage
simply has no row for them).

Reference analog: the curated-CSV + RDF export pair of
oc_meta/run/meta_process.py:290-330 — maintenance and release as two
halves of one pipeline over the same store.

Scale notes (100 TB corpus, nightly release): scoring is PX3's shape
(vocabulary-sized count joins, unhinted for AQE); selection is QB1's —
the only corpus-keyed shuffle is the per-score rollup, windows run over
bounded dimension tables; holdout assignment is HS2's delta-keyed
joins; the shard write is one shuffle on the 48-bit hash shard.  No
stage introduces a shuffle class the component gates don't already pay.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.quality_queries import PX_SCORING_CTES
from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

_RL1_SEL_SEED = "rl1sel"  # selection tie-break key (QB1's skey role)
_RL1_PRIOR_SEED = "rl1prior"  # yesterday's synthesized assignments
_RL1_HOLD_SEED = "rl1hold"  # the holdout STORE's seed (fresh splits)
_RL1_SHARD_SEED = "rl1shard"  # the shard store's permutation seed
_RL1_SHARDS = 4
_RL1_EPOCH = 7  # tonight's epoch: prior epochs are doc_id % 7 ∈ 0..6

_RL1_ORACLE = f"""
    WITH {PX_SCORING_CTES},
    toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    t AS (
      SELECT s.doc_id, s.milli_bits, k.n_tok,
             md5('{_RL1_SEL_SEED}:' || CAST(s.doc_id AS VARCHAR)) AS skey
      FROM scored s JOIN toks k USING (doc_id)
    ),
    b AS (SELECT SUM(n_tok) // 2 AS budget FROM t),
    cum AS (
      SELECT doc_id, milli_bits, n_tok,
             SUM(n_tok) OVER (ORDER BY milli_bits ASC, skey, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    selected AS (
      SELECT doc_id, milli_bits, n_tok FROM cum CROSS JOIN b WHERE cum <= budget
    ),
    prior AS (
      SELECT doc_id, doc_id % 7 AS assigned_epoch,
             ('0x' || substr(md5('{_RL1_PRIOR_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10 AS pb
      FROM documents WHERE doc_id % 10 <> 0
    ),
    prior_split AS (
      SELECT doc_id, assigned_epoch,
             CASE WHEN pb < 8 THEN 'train' WHEN pb = 8 THEN 'val' ELSE 'test' END AS split
      FROM prior
    ),
    clusters AS (
      SELECT doc_id,
             CASE WHEN doc_id % 90 = 0 THEN -(doc_id + 1)
                  ELSE (doc_id // 9) * 9 END AS cluster
      FROM documents
    ),
    anchors AS (
      SELECT cluster, split AS inherited_split FROM (
        SELECT c.cluster, p.split,
               ROW_NUMBER() OVER (PARTITION BY c.cluster
                                  ORDER BY p.assigned_epoch, p.doc_id) AS rn
        FROM clusters c JOIN prior_split p ON p.doc_id = c.doc_id
      ) WHERE rn = 1
    ),
    fresh AS (
      SELECT doc_id, cluster,
             ('0x' || substr(md5('{_RL1_HOLD_SEED}:' || CAST(cluster AS VARCHAR)), 1, 12))::BIGINT % 10 AS fb
      FROM clusters WHERE doc_id % 10 = 0
    ),
    labels AS (
      SELECT doc_id, split FROM prior_split
      UNION ALL
      SELECT f.doc_id,
             COALESCE(a.inherited_split,
                      CASE WHEN f.fb < 8 THEN 'train'
                           WHEN f.fb = 8 THEN 'val' ELSE 'test' END) AS split
      FROM fresh f LEFT JOIN anchors a ON a.cluster = f.cluster
    ),
    released AS (
      SELECT s.doc_id, s.milli_bits, s.n_tok
      FROM selected s JOIN labels l USING (doc_id)
      WHERE l.split = 'train'
    ),
    keyed AS (
      SELECT doc_id, milli_bits, n_tok,
             md5('{_RL1_SHARD_SEED}:' || CAST(doc_id AS VARCHAR)) AS sort_key
      FROM released
    ),
    sharded AS (
      SELECT doc_id, milli_bits, n_tok, sort_key,
             ('0x' || substr(sort_key, 1, 12))::BIGINT % {_RL1_SHARDS} AS shard
      FROM keyed
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS BIGINT) AS pos,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(milli_bits AS BIGINT) AS milli_bits,
           CAST(n_tok AS BIGINT) AS n_tok,
           sort_key
    FROM sharded ORDER BY shard, pos
"""


def rl1_released_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-3 of the release (doc_id, milli_bits, n_tok): persisted-LM
    scoring → budget selection → train-split filter through the holdout
    store cycle.  Split out so tests/test_release.py can pin released ==
    (selected ∩ train) against independently-computed pieces.  Writes
    the holdout store under a tempdir and localCheckpoints the result
    before cleanup (the lineage reads store files the caller's rmtree
    deletes)."""
    import os
    import shutil
    import tempfile

    from oc_meta_spark.plans.incremental import (
        nightly_holdout_update,
        read_holdout_assignments,
        seeded_split,
        write_holdout_assignments,
    )
    from oc_meta_spark.plans.lm_counts import (
        LmCounts,
        build_lm_counts,
        extend_lm_counts,
        score_with_counts,
    )
    from oc_meta_spark.plans.quality_queries import _PX1_REF_LANG, budget_select

    docs = load_table(spark, "documents", sf_dir)

    # 1. scoring — PX3's persisted-count path: founding slice + extend.
    #    The count tables are materialized ONCE at each stage (r12): they
    #    are VOCABULARY-sized, and score_with_counts references heads
    #    three times (vocab agg + c1 join) and bigrams once — left lazy,
    #    every reference re-ran the founding slice's bigram explode+agg
    #    (~6 training-corpus passes measured; now exactly one per table).
    #    In the persisted pipeline this materialization is the store
    #    itself (write_lm_counts → read_lm_counts); the in-memory gate
    #    mirrors it with checkpoints.
    train = docs.filter(F.col("lang") == _PX1_REF_LANG).select("doc_id", "text")
    founding = build_lm_counts(train.filter(F.col("doc_id") % 10 != 0))
    founding = LmCounts(
        heads=founding.heads.localCheckpoint(),
        bigrams=founding.bigrams.localCheckpoint(),
        docs=founding.docs,
    )
    extended = extend_lm_counts(founding, train.filter(F.col("doc_id") % 10 == 0))
    extended = LmCounts(
        heads=extended.heads.localCheckpoint(),
        bigrams=extended.bigrams.localCheckpoint(),
        docs=extended.docs,
    )
    scored = score_with_counts(docs, extended)

    # 2. budget selection — QB1's kernel, quality = −milli_bits so the
    #    cheapest (most reference-like) bits fill the budget first.
    #    t is materialized before the kernel (r12): budget_select
    #    references its input ~4 times (budget agg, score rollup, kept
    #    semi-join, boundary join) — fine for QB1's narrow TTR map, but
    #    here every reference re-ran the whole LM scoring chain.  t is the
    #    lightweight per-doc proxy (doc_id, q_ppm, n_tok, skey — guide
    #    §8's decide-with-small-rows discipline), so one materialization
    #    is O(corpus doc count), not O(corpus text).
    t = scored.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok")), "doc_id"
    ).select(
        "doc_id",
        (-F.col("milli_bits")).alias("q_ppm"),
        "n_tok",
        F.md5(
            F.concat(F.lit(_RL1_SEL_SEED), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("skey"),
    ).localCheckpoint()
    selected = budget_select(t).select(
        "doc_id", (-F.col("q_ppm")).alias("milli_bits"), "n_tok"
    )

    # 3. holdout labels — the PERSISTED store cycle: write yesterday's
    #    history, run tonight's update, read the extended history back
    prior = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        seeded_split(_RL1_PRIOR_SEED, "doc_id").alias("split"),
        (F.col("doc_id") % 7).cast("int").alias("assigned_epoch"),
    )
    clustered = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 90 == 0, -(F.col("doc_id") + 1))
        .otherwise(F.expr("(doc_id div 9) * 9"))
        .alias("cluster"),
    )
    tmp = tempfile.mkdtemp(prefix="rl1_holdout_")
    try:
        read_path = os.path.join(tmp, "v0")
        write_path = os.path.join(tmp, "v1")
        write_holdout_assignments(prior, read_path, seed=_RL1_HOLD_SEED)
        nightly_holdout_update(spark, read_path, write_path, clustered, _RL1_EPOCH)
        labels = read_holdout_assignments(spark, write_path, seed=_RL1_HOLD_SEED)
        released = selected.join(
            labels.filter(F.col("split") == "train").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        return released.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "RL1_corpus_release",
    _RL1_ORACLE,
    doc="Corpus-release composition (IN2's consumption twin): persisted-LM scoring, token-budget selection, holdout-store train labels, epoched shuffled shards — the whole release path re-derived from scratch by the oracle.",
)
def rl1_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from oc_meta_spark.sources.shards import (
        read_shuffled_shards,
        write_shuffled_shards,
    )

    released = rl1_released_docs(spark, sf_dir)

    # 4. epoched shuffled shards — write the release, return the READ-BACK
    #    store view (the loader's contract is what the gate checks)
    tmp = tempfile.mkdtemp(prefix="rl1_shards_")
    try:
        path = os.path.join(tmp, "shards")
        write_shuffled_shards(
            released, path, seed=_RL1_SHARD_SEED, n_shards=_RL1_SHARDS, epoch=0
        )
        store = read_shuffled_shards(spark, path)
        w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
        out = (
            store.withColumn("pos", F.row_number().over(w).cast("long"))
            .select(
                F.col("shard").cast("int").alias("shard"),
                "pos",
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("milli_bits").cast("long").alias("milli_bits"),
                F.col("n_tok").cast("long").alias("n_tok"),
                "sort_key",
            )
            .orderBy("shard", "pos")
        )
        # collect before rmtree: the driver collects later, after the
        # store directory is gone (the DC4/sink-gate discipline)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
