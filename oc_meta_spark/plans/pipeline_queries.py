"""End-to-end corpus-preparation pipeline gate (the LLM-side analog of
CUR1): quality filter → exact dedup → deterministic stratified sample →
per-source rollup, chained exactly as a training-data prep job would run
them.  Each stage is an already-oracle-proven primitive (T1/T3 token and
ratio stats, D8 hash dedup, MX1 multiplicative-hash sampling); this gate
pins that they COMPOSE — filter pushdown through the dedup aggregate, one
shuffle per keyed stage, no corpus-wide window.

Determinism: every predicate is integer arithmetic (ratio thresholds are
cross-multiplied, the sampling hash compares against a scaled integer), so
both engines agree bitwise with no float contract needed.

Scale notes (100 TB): the quality filter is a scan-stage projection and
prunes first; dedup shuffles on md5(text) with map-side combine; the
sample predicate is scan-local; the rollup is a small hash aggregate keyed
on source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# quality gates: ≥ MIN_WORDS words, unique-word ratio ≥ 3/10
_MIN_WORDS = 30
_UNIQ_NUM, _UNIQ_DEN = 3, 10
# sampling: keep u < 1/2 of the 32-bit hash space (MX1's reduced Knuth hash)
_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296
_KEEP_NUM, _KEEP_DEN = 1, 2


# ---------------------------------------------------------------------------
# QT1 — exact per-group quantiles (order statistics): p50/p90/p99 of
# document length per source — the corpus-curation op that picks length
# and quality FILTER THRESHOLDS per mixture source.  Ranks are computed
# with INTEGER arithmetic using the general ceiling identity
# ceil(q_num·n / q_den) = (q_num·n + q_den − 1) div q_den — valid for ANY
# quantile q_num/q_den, not just the q_num = q_den − 1 family — and the
# value at a rank is well-defined under ties because the ordering
# tie-breaks on doc_id — so both engines return identical values with no
# float contract.
#
# Scale notes (100 TB): a value-at-rank lookup needs NO corpus row window
# at all (the round-9 weak finding's cleanest case): roll the corpus up to
# one row per (source, n_chars) — bounded by the length RESOLUTION, not
# the corpus — run the cumulative count over that rollup
# (rank_refine.class_cumsum), and the quantile value is simply the class
# whose running span contains the target rank.  One corpus shuffle (the
# rollup's hash agg, map-side combined), then dimension-sized work; an
# English-sized mega-source costs the same as a tiny one.  The doc_id
# tie-break in the oracle's ordering cannot affect the VALUE at a rank,
# so the rollup form is value-identical to the naive ranked window.
# approx_percentile is deliberately NOT used: threshold selection is a
# published, re-derivable contract.
# ---------------------------------------------------------------------------
@register(
    "QT1_exact_group_quantiles",
    """
    WITH ranked AS (
      SELECT source, n_chars, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS BIGINT) AS p50,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS BIGINT) AS p90,
           CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS BIGINT) AS p99
           -- rank = (q_num*n + q_den - 1) // q_den = ceil(q_num*n/q_den); for
           -- these three quantiles q_num = q_den - 1, so the literals above
           -- are already the general form
    FROM ranked GROUP BY source ORDER BY source
    """,
    doc="Exact p50/p90/p99 document length per source via rank-based order statistics — integer-exact quantile thresholds for corpus curation.",
)
def qt1_exact_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.rank_refine import class_cumsum

    docs = load_table(spark, "documents", sf_dir).select("source", "n_chars")
    # (source, n_chars, cnt, cum, cum_before) — bounded by length
    # resolution per source; the rank-t value is the class whose running
    # span contains t: cum_before < t <= cum
    off = class_cumsum(docs, ["source"], ["n_chars"])
    tot = off.groupBy("source").agg(F.sum("cnt").alias("n"))
    j = off.join(F.broadcast(tot), "source")
    pick = lambda num, den: F.max(  # noqa: E731
        F.when(
            (F.col("cum_before") < F.expr(f"({num} * n + {den} - 1) div {den}"))
            & (F.expr(f"({num} * n + {den} - 1) div {den}") <= F.col("cum")),
            F.col("n_chars"),
        )
    ).cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            pick(1, 2).alias("p50"),
            pick(9, 10).alias("p90"),
            pick(99, 100).alias("p99"),
        )
        .orderBy("source")
    )


@register(
    "P1_corpus_prep_pipeline",
    f"""
    WITH stats AS (
      SELECT doc_id, source, text,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
    ),
    quality AS (
      SELECT * FROM stats
      WHERE n_words >= {_MIN_WORDS}
        AND n_uniq * {_UNIQ_DEN} >= n_words * {_UNIQ_NUM}
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id, md5(text) AS h,
             MIN(source) AS source, MIN(n_words) AS n_words
      FROM quality GROUP BY md5(text)
    ),
    sampled AS (
      SELECT * FROM deduped
      WHERE ((doc_id % {_M31}) * {_KNUTH}) % {_M32} * {_KEEP_DEN} < {_M32} * {_KEEP_NUM}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM sampled GROUP BY source ORDER BY source
    """,
    doc="Corpus-prep pipeline: quality filter → exact dedup → hash sample → per-source rollup (stages compose; integer-only predicates).",
)
def p1_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    stats = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_uniq"),
    )
    quality = stats.filter(
        (F.col("n_words") >= _MIN_WORDS)
        & (F.col("n_uniq") * _UNIQ_DEN >= F.col("n_words") * _UNIQ_NUM)
    )
    deduped = (
        quality.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("source").alias("source"),
            F.min("n_words").alias("n_words"),
        )
    )
    sampled = deduped.filter(
        ((F.col("doc_id") % _M31) * _KNUTH) % _M32 * _KEEP_DEN < _M32 * _KEEP_NUM
    )
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# D23 — cross-document exact repeated-span removal (the "exact substring
# dedup" of Lee et al. 2021, "Deduplicating Training Data Makes Language
# Models Better" — public paper; suffix arrays there, relational n-gram
# spans here).  Any 10-word span occurring in ≥2 distinct documents is
# removed from EVERY document, and the gate returns the rewritten text's
# fingerprint.  Scale shape: gram explosion is a narrow map (~10× words),
# the duplicate-gram set is one hash aggregate keyed on the gram, covered
# positions stay bounded by document length, and the rewrite is a per-row
# lambda filter — no window over the corpus, no UDF.
# ---------------------------------------------------------------------------
_SPAN = 10


@register(
    "D23_cross_doc_span_dedup",
    f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, i,
             {" || ' ' || ".join(f"ws[i+{j}]" for j in range(_SPAN))} AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {_SPAN - 2})) AS i FROM words)
    ),
    dup AS (SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    occ AS (SELECT doc_id, i FROM g JOIN dup USING (g)),
    covset AS (
      SELECT doc_id, list(p) AS lp
      FROM (SELECT DISTINCT doc_id, unnest(range(i, i + {_SPAN})) AS p FROM occ)
      GROUP BY doc_id
    ),
    out AS (
      SELECT w.doc_id,
             len(w.ws) AS n_words,
             CASE WHEN c.lp IS NULL THEN w.ws
                  ELSE list_filter(w.ws, (x, ii) -> NOT list_contains(c.lp, ii))
             END AS kept
      FROM words w LEFT JOIN covset c USING (doc_id)
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_words - len(kept) AS BIGINT) AS n_removed,
           -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
           -- array_join([]) is '' — a fully-deduped doc must hash ''
           md5(coalesce(array_to_string(kept, ' '), '')) AS cleaned_md5
    FROM out ORDER BY doc_id
    """,
    doc="Exact repeated-span removal: 10-word spans shared across documents are cut from every text (Lee et al. 2021 substring dedup, relational form).",
)
def d23_cross_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", F.split("text", " ").alias("ws"))
    # (position, gram) pairs; guarded for sub-span docs (descending
    # sequence(1,0) would emit spurious partials — see DC1/T6)
    gram_structs = F.expr(
        f"CASE WHEN size(ws) >= {_SPAN} THEN "
        f"transform(sequence(1, size(ws) - {_SPAN - 1}), "
        f"i -> struct(i AS i, concat_ws(' ', {', '.join(f'ws[i+{j}-1]' for j in range(_SPAN))}) AS g)) "
        f"ELSE array() END"
    )
    grams = docs.select("doc_id", F.explode(gram_structs).alias("s")).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("g")
    )
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    occ = grams.join(dup, "g", "left_semi")
    covset = (
        occ.select("doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + (_SPAN - 1))).alias("p"))
        .dropDuplicates(["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("lp"))
    )
    out = docs.join(covset, "doc_id", "left").select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.when(F.col("lp").isNull(), F.col("ws"))
        .otherwise(F.filter("ws", lambda x, i: ~F.array_contains("lp", i + 1)))
        .alias("kept"),
    )
    return out.select(
        "doc_id",
        "n_words",
        (F.col("n_words") - F.size("kept")).cast("long").alias("n_removed"),
        F.md5(F.array_join("kept", " ")).alias("cleaned_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T7 — model-based quality classifier: the linear-classifier slot of the
# public corpus pipelines (CCNet / GPT-3 / LLaMA data prep all gate
# documents on a learned quality score; fasttext-style linear model over
# surface features).  Fixed, documented weights over T3-style features;
# the logistic link is replaced by the SOFTSIGN form
#   sigma(z) ~ 0.5 + z / (2 * (1 + |z|))
# because true exp() differs across libm implementations in the last ulp,
# while +, *, /, abs are correctly-rounded IEEE ops — so the score is
# bitwise identical in Spark and DuckDB (same association order written
# out on both sides).  Decision boundary keep = (z >= 0) is unchanged by
# the substitution (both links are monotone with sigma(0) = 0.5).
#
# Scale shape: narrow per-row map over one scan — no shuffle before the
# final orderBy; weights are literals, never a join.
# ---------------------------------------------------------------------------
_T7_W = {
    "bias": -2.1,
    "n_words": 0.015,  # longer docs score higher, saturating via softsign
    "uniq": 2.4,  # type-token ratio
    "stop": 1.8,  # stopword fraction (natural text has stopwords)
}
_T7_STOP = ("the", "a", "of", "and", "to", "in")
_T7_STOP_SQL = ", ".join(f"'{w}'" for w in _T7_STOP)


@register(
    "T7_quality_classifier",
    f"""
    WITH feats AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             len(list_filter(string_split(text, ' '), w -> w IN ({_T7_STOP_SQL}))) AS n_stop
      FROM documents
    ),
    z AS (
      SELECT doc_id, n_words,
             {_T7_W['bias']}e0 + {_T7_W['n_words']}e0 * n_words
               + {_T7_W['uniq']}e0 * (CAST(n_uniq AS DOUBLE) / n_words)
               + {_T7_W['stop']}e0 * (CAST(n_stop AS DOUBLE) / n_words) AS z
      FROM feats
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           0.5e0 + z / (2e0 * (1e0 + abs(z))) AS score,
           z >= 0 AS keep
    FROM z ORDER BY doc_id
    """,
    doc="Model-based quality classifier: fixed-weight linear model over surface features, softsign link (IEEE-exact in both engines).",
)
def t7_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_uniq"),
        F.size(F.filter(ws, lambda w: w.isin(*_T7_STOP))).alias("n_stop"),
    )
    # identical association order to the SQL: ((bias + a) + b) + c
    z = (
        F.lit(_T7_W["bias"])
        + F.lit(_T7_W["n_words"]) * F.col("n_words")
        + F.lit(_T7_W["uniq"]) * (F.col("n_uniq").cast("double") / F.col("n_words"))
        + F.lit(_T7_W["stop"]) * (F.col("n_stop").cast("double") / F.col("n_words"))
    )
    zc = feats.withColumn("z", z)
    return zc.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        (F.lit(0.5) + F.col("z") / (F.lit(2) * (F.lit(1) + F.abs("z")))).alias("score"),
        (F.col("z") >= 0).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# CH1 — overlapping context-window chunking (the training-data op that
# turns documents into fixed-size training windows: window W tokens,
# stride S, trailing partial windows kept — the standard sliding-window
# shape for LLM pretraining corpora; no reference counterpart).
#
# Scale notes (100 TB): pure narrow map + explode — ZERO shuffles (the
# gate's trailing orderBy is presentation-only; the one Exchange in its
# plan is that sort, not the operator); the chunk multiset is emitted at
# scan parallelism and any downstream keyed stage (dedup, packing) pays
# the first shuffle.  The sequence() start is guarded (sequence(1,0) is
# DESCENDING in Spark) so empty documents emit nothing instead of a
# phantom window.
# ---------------------------------------------------------------------------
_CHUNK_W = 8
_CHUNK_S = 4


@register(
    "CH1_token_window_chunking",
    f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    off AS (
      SELECT doc_id, t, UNNEST(range(0, len(t), {_CHUNK_S})) AS o
      FROM tk WHERE len(t) >= 1
    ),
    ch AS (
      SELECT doc_id, CAST(o // {_CHUNK_S} AS BIGINT) AS chunk_idx,
             list_slice(t, o + 1, least(o + {_CHUNK_W}, len(t))) AS c
      FROM off
    )
    SELECT doc_id, chunk_idx, CAST(len(c) AS BIGINT) AS n_tokens,
           md5(array_to_string(c, ' ')) AS chunk_hash
    FROM ch ORDER BY doc_id, chunk_idx
    """,
    doc=f"Sliding token windows (W={_CHUNK_W}, stride={_CHUNK_S}) per document — zero-shuffle chunking for training-window prep.",
)
def ch1_token_window_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tk = F.split(F.col("text"), " ")
    n = F.size(tk)
    # guard: sequence(0, -1, S) would be a DESCENDING range on empty docs
    offsets = F.when(
        n >= 1, F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_S))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(offsets, lambda o: F.slice(tk, o + 1, _CHUNK_W))
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("c").cast("long").alias("n_tokens"),
            F.md5(F.array_join("c", " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# TF1 — salient-term extraction: top-3 terms per document by tf-idf.  The
# score is INTEGER-scaled — floor(tf * 1e6 / df) — instead of a float
# ln(): within a document the ranking is order-equivalent to tf·(N/df)
# (N is corpus-constant, so it never reorders), and both engines agree
# bitwise on integer division, so no float contract (and no libm ln()
# rounding divergence) is needed.  N is deliberately NOT multiplied in:
# tf·1e6·N overflows BIGINT at ~10^9 docs, where Spark (non-ANSI) wraps
# silently while DuckDB raises — tf·1e6 is bounded by document length
# and safe at any corpus size.  Ties break on the term itself, so the
# top-3 is a total order.
#
# Scale notes (100 TB): one explode (narrow), one (doc,term) hash agg,
# one term-keyed df agg, one shuffle join tf⋈df on term (zipf-ish term
# skew is bounded because df rows are one-per-term), and a per-doc
# top-k window — partitioned by doc_id, never corpus-wide.
# ---------------------------------------------------------------------------
@register(
    "TF1_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score_scaled
      FROM tf JOIN df USING (term)
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_scaled DESC, term ASC
      ) AS rnk
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score_scaled, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
    """,
    doc="Top-3 tf-idf terms per document with integer-exact scoring (salient-term / keyword extraction for corpus analysis).",
)
def tf1_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id", "term", "tf", "df",
        F.expr("CAST((tf * 1000000L) div df AS BIGINT)").alias("score_scaled"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_scaled"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "score_scaled", "rnk")
        .orderBy("doc_id", "rnk")
    )
