"""Corpus-assembly operators for a training-data pipeline: deterministic
stratified sampling (source mixing) and token-budget packing.

These are the two steps that sit between "cleaned + deduped documents" and
"training shards": pick how much of each source to keep (mixing weights),
then pack the survivors into fixed token budgets (context windows).  Both
are pure relational plans:

- MX1 keys the keep/drop decision on a Knuth multiplicative hash of
  ``doc_id`` — deterministic, seedless, identical integer arithmetic in any
  engine, and uniformly distributed, so a per-source threshold implements
  a per-source sampling RATE with no shuffle at all (the filter is a scan
  predicate; at 100 TB it pushes down to parquet row groups).
- MX2 is a per-source cumulative token count (ordered by doc_id) plus
  integer division to assign a bin — the greedy sequential packing used
  by block-concatenation data loaders.  The prefix sum is rank-refined
  (rank_refine.bucketed_running_sum): class offsets from the bounded
  per-(source, range-class) rollup, in-class running sums salted by the
  range class — a mega-source never serializes into one window task.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# Knuth's multiplicative constant; doc_id → pseudo-uniform 32-bit value.
# doc_id is reduced modulo 2^31 BEFORE the multiply: 2^31 * 2654435761 ≈
# 5.7e18 < 2^63-1, so the product stays in int64 range in every engine.
# Unreduced, a doc_id above ~3.5e9 would overflow — Spark (non-ANSI) wraps
# silently while DuckDB raises, breaking the cross-engine determinism claim.
_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296

# mixing weights: fraction of each source to KEEP (everything else: 0.5);
# keyed to the synthetic corpus's source vocabulary (src0..src19)
_RATES = {"src0": 1.0, "src1": 0.8, "src2": 0.25, "src3": 0.1}
_DEFAULT_RATE = 0.5


def _rate_sql() -> str:
    return (
        "CASE source "
        + " ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(_RATES.items()))
        + f" ELSE {_DEFAULT_RATE} END"
    )


@register(
    "MX1_stratified_source_sample",
    f"""
    SELECT doc_id, source,
           CAST(((doc_id % {_M31}) * {_KNUTH}) % {_M32} AS DOUBLE) / {_M32} AS u
    FROM documents
    WHERE CAST(((doc_id % {_M31}) * {_KNUTH}) % {_M32} AS DOUBLE) / {_M32} < {_rate_sql()}
    ORDER BY doc_id
    """,
    doc="Deterministic per-source stratified sampling via multiplicative hash (corpus mixing weights).",
)
def mx1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    u = (((F.col("doc_id") % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)).cast(
        "double"
    ) / F.lit(_M32)
    rate = F.lit(_DEFAULT_RATE)
    for s, r in sorted(_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    return (
        docs.select("doc_id", "source", u.alias("u"))
        .filter(F.col("u") < rate)
        .orderBy("doc_id")
    )


# context-window budget in whitespace tokens
_BUDGET = 4096


@register(
    "MX2_token_budget_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tok
      FROM toks
    )
    SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(cum_tok AS BIGINT) AS cum_tok,
           CAST((cum_tok - 1) // {_BUDGET} AS BIGINT) AS bin
    FROM cum ORDER BY doc_id
    """,
    doc="Greedy token-budget packing: per-source cumulative token count cut into fixed context-window bins.",
)
def mx2_token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the per-source running token sum is a PREFIX SUM over (doc_id) —
    # the same decomposition as the quota ranks (round-10): offsets from
    # the bounded per-(source, range-class) rollup cumsum + an in-class
    # running sum, so a mega-source never runs its whole extent through
    # one window task.  Value-identical to the naive per-source window,
    # which the oracle below still is.
    from oc_meta_spark.plans.rank_refine import bucketed_running_sum, range_class

    docs = load_table(spark, "documents", sf_dir)
    toks = range_class(
        docs.select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")),
        "doc_id",
    )
    cum = bucketed_running_sum(
        toks, ["source"], ["rb"], ["doc_id"], "n_tok", out_col="cum_tok"
    )
    return cum.select(
        "doc_id",
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.col("cum_tok").cast("long").alias("cum_tok"),
        F.floor((F.col("cum_tok") - 1) / _BUDGET).cast("long").alias("bin"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MX3 — mixture rebalancing with epoch upsampling: given per-source mixing
# WEIGHTS and a total token budget, compute how many full passes (epochs)
# over each source to take plus a deterministic fractional pass for the
# remainder — the domain-reweighting step of LLM corpus assembly (the
# public DoReMi / Pile recipe shape: weights in, per-source duplication
# factors out).  The fractional epoch reuses MX1's multiplicative hash as
# the keep predicate, so the achieved token count is exact and identical
# in both engines.
#
# Integer-exactness bound: products stay in int64 when per-source token
# counts are below 2^31 (hash < 2^32 times tokens, remainder times 2^32).
# At 100 TB, per-source totals exceed that — switch the remainder
# predicate to the double form u < rem/tokens (bias < 2^-21) or split
# sources into shards first; the plan shape is unchanged.
#
# Scale shape: two small aggregates (per-source rollup, scalar totals)
# broadcast back; the remainder keep-test is a scan predicate on the fact
# table; one final groupBy(source) — no window, no corpus-wide shuffle
# beyond the keyed rollups.
# ---------------------------------------------------------------------------
_MX3_WMOD = 4  # weight_s = (source ordinal % 4) + 1 — a fixed mixing table


@register(
    "MX3_mixture_epoch_upsampling",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS tokens,
             CAST(CAST(substr(source, 4) AS INTEGER) % {_MX3_WMOD} + 1 AS BIGINT) AS weight
      FROM toks GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(tokens) AS BIGINT) AS budget, CAST(SUM(weight) AS BIGINT) AS wsum
      FROM per_src
    ),
    plan AS (
      SELECT p.*, (t.budget * p.weight) // t.wsum AS target_tokens
      FROM per_src p CROSS JOIN tot t
    ),
    epochs AS (
      SELECT *, target_tokens // tokens AS full_epochs,
             target_tokens % tokens AS rem_tokens
      FROM plan
    ),
    rem_kept AS (
      SELECT e.source, CAST(COALESCE(SUM(k.n_tok), 0) AS BIGINT) AS rem_achieved
      FROM epochs e LEFT JOIN toks k
        ON k.source = e.source
       AND ((k.doc_id % {_M31}) * {_KNUTH}) % {_M32} * e.tokens < e.rem_tokens * {_M32}
      GROUP BY e.source
    )
    SELECT e.source, e.n_docs, e.tokens, e.weight,
           CAST(e.target_tokens AS BIGINT) AS target_tokens,
           CAST(e.full_epochs AS BIGINT) AS full_epochs,
           CAST(e.full_epochs * e.tokens + r.rem_achieved AS BIGINT) AS achieved_tokens
    FROM epochs e JOIN rem_kept r ON r.source = e.source
    ORDER BY e.source
    """,
    doc="Mixture rebalancing: per-source epoch upsampling to weighted token targets, hash-deterministic fractional pass.",
)
def mx3_mixture_epoch_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    ).withColumn(
        "weight",
        (F.substring("source", 4, 10).cast("int") % _MX3_WMOD + 1).cast("long"),
    )
    tot = per_src.agg(
        F.sum("tokens").cast("long").alias("budget"),
        F.sum("weight").cast("long").alias("wsum"),
    )
    plan = per_src.join(F.broadcast(tot)).withColumn(
        "target_tokens", F.floor((F.col("budget") * F.col("weight")) / F.col("wsum"))
    )
    epochs = plan.withColumn(
        "full_epochs", F.floor(F.col("target_tokens") / F.col("tokens"))
    ).withColumn(
        "rem_tokens", F.col("target_tokens") % F.col("tokens")
    )
    e = F.broadcast(epochs.select("source", "tokens", "rem_tokens"))
    u = ((F.col("doc_id") % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)
    rem_kept = (
        e.join(
            toks.select("doc_id", F.col("source").alias("ksrc"), "n_tok"),
            (F.col("ksrc") == F.col("source"))
            & (u * F.col("tokens") < F.col("rem_tokens") * F.lit(_M32)),
            "left",
        )
        .groupBy("source")
        .agg(F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("rem_achieved"))
    )
    return (
        epochs.join(rem_kept, "source")
        .select(
            "source",
            "n_docs",
            "tokens",
            "weight",
            F.col("target_tokens").cast("long").alias("target_tokens"),
            F.col("full_epochs").cast("long").alias("full_epochs"),
            (F.col("full_epochs") * F.col("tokens") + F.col("rem_achieved"))
            .cast("long")
            .alias("achieved_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# MX4 — exact-quota stratified sample: downsample the corpus to EXACTLY
# N documents while preserving the per-source mix, with largest-remainder
# rounding (floor quotas first; the leftover seats go to the strata with
# the largest fractional remainders, ties → stratum name) — the
# allocation rule that makes per-stratum counts sum to the budget
# exactly, which MX1's independent per-row coin flips cannot.  Within a
# stratum the kept documents are the ones with the smallest
# md5('mx4:' || doc_id) — a seeded deterministic draw (SH1's key), so the
# same budget draws the same sample on any run or cluster.
#
# Scale notes (100 TB): the quota computation runs entirely on the
# per-stratum COUNT aggregate — a table bounded by the source VOCABULARY
# (tens of rows), which is why its windows are deliberately unpartitioned
# (dimension-sized, never corpus-sized).  The within-stratum draw uses
# rank_refine.bucketed_rank: the only corpus-row window is salted by the
# draw key's 2-char prefix (256 buckets per stratum — a mega-stratum
# never sorts in one task), global ranks are recovered from the bounded
# rollup's running offsets, and buckets wholly past the quota are pruned
# before any row is ranked.  The rank is IDENTICAL to the naive
# per-source window (prefix decomposition of the sort key) — the oracle
# below still IS that naive window.

# ---------------------------------------------------------------------------
_MX4_TOTAL = 200


@register(
    "MX4_exact_quota_stratified_sample",
    f"""
    WITH cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
    q1 AS (
      SELECT source, c,
             ({_MX4_TOTAL} * c) // t AS fl,
             ({_MX4_TOTAL} * c) % t AS rem
      FROM (SELECT source, c, SUM(c) OVER () AS t FROM cnt) z
    ),
    q2 AS (
      SELECT source, fl, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
             {_MX4_TOTAL} - SUM(fl) OVER () AS leftover
      FROM q1
    ),
    quota AS (
      SELECT source, fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS quota FROM q2
    ),
    keyed AS (
      SELECT doc_id, source, md5('mx4:' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    ),
    rk AS (
      SELECT doc_id, source, skey,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id) AS r
      FROM keyed
    )
    SELECT k.doc_id, k.source, CAST(k.r AS BIGINT) AS stratum_rank
    FROM rk k JOIN quota q ON q.source = k.source
    WHERE k.r <= q.quota
    ORDER BY k.doc_id
    """,
    doc="Exact-budget stratified downsample: largest-remainder quota allocation per source + seeded deterministic within-stratum draw — kept counts sum to the budget exactly.",
)
def mx4_exact_quota_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    # unpartitioned windows: over the STRATUM aggregate only (bounded by
    # the source vocabulary, tens of rows — never the corpus)
    w_all = Window.partitionBy()
    q1 = cnt.withColumn("t", F.sum("c").over(w_all)).select(
        "source",
        "c",
        F.expr(f"({_MX4_TOTAL} * c) div t").alias("fl"),
        ((F.lit(_MX4_TOTAL) * F.col("c")) % F.col("t")).alias("rem"),
    )
    w_rr = Window.partitionBy().orderBy(F.col("rem").desc(), "source")
    q2 = q1.withColumn("rr", F.row_number().over(w_rr)).withColumn(
        "leftover", F.lit(_MX4_TOTAL) - F.sum("fl").over(w_all)
    )
    quota = q2.select(
        "source",
        (F.col("fl") + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)).alias(
            "quota"
        ),
    )
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit("mx4:"), F.col("doc_id").cast("string"))).alias("skey"),
    )
    # the within-stratum draw is rank over (skey, doc_id) per source — a
    # corpus-sized window on the skewed stratum key if done naively (the
    # round-9 weak finding).  bucketed_rank salts it by the skey's 2-char
    # prefix (a prefix of the sort key, so the rank is IDENTICAL — the
    # oracle is still the naive per-source window) and prunes whole
    # buckets past the quota before any row is ranked.
    from oc_meta_spark.plans.rank_refine import bucketed_rank

    keyed = keyed.withColumn("b", F.substring("skey", 1, 2))
    return (
        bucketed_rank(
            keyed,
            ["source"],
            ["b"],
            ["skey", "doc_id"],
            rank_col="r",
            max_rank_df=quota.withColumnRenamed("quota", "max_rank"),
        )
        .filter(F.col("r") <= F.col("max_rank"))
        .select("doc_id", "source", F.col("r").alias("stratum_rank"))
        .orderBy("doc_id")
    )
