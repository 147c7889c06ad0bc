"""Corpus-quality operators for a training-data pipeline: statistical
LM scoring, budgeted selection, and source-level reputation — the three
filters that sit between "deduped documents" and "mixed corpus".

- **PX1** is the CCNet / LLaMA-prep perplexity gate (Wenzek et al. 2020,
  "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  Data" — public paper): train a statistical LM on a REFERENCE slice of
  the corpus, score every document by average per-token cost, keep the
  cheap (reference-like) ones.  KenLM's 5-gram model is replaced by an
  add-one-smoothed bigram model — same decision structure, pure
  relational — and the per-bigram cost is QUANTIZED to integer bits,
  ``floor(log2(head_count + V)) - floor(log2(bigram_count + 1))``,
  computed as ``length(bin(x)) - 1`` over integers.  True ``ln()``
  differs across libm implementations in the last ulp and a per-doc SUM
  over doubles is row-order-dependent, while the bit-length form is
  integer arithmetic end to end — bitwise identical in any engine and
  order-free under aggregation (the same determinism doctrine as T7's
  softsign substitute for ``exp()``).

- **QB1** is token-budget selection: keep the highest-quality documents
  whose cumulative token count fits a budget (the "take the best N
  tokens" step of corpus assembly).  The naive form is one global window
  over the corpus ordered by quality — a single-task sort at 100 TB.
  The implementation here is AGGREGATE-THEN-REFINE: a cumulative sum
  over the per-SCORE rollup (bounded by score resolution, ≤1001 rows)
  admits whole score classes; the single boundary score class is then
  re-rolled by a 2-hex-char hash bucket (256 rows) admitting whole
  buckets; only the one boundary BUCKET — 1/256th of one score class —
  pays a rank window.  The oracle is the naive global window, so the
  gate pins the refinement's equivalence to the corpus-wide sort it
  replaces.

- **DR1** is the per-domain reputation rollup of RefinedWeb-style web
  curation (Penedo et al. 2023 — public paper): aggregate document
  quality and boilerplate-duplication evidence per source domain and
  assign a verdict (``quarantine`` the mostly-duplicated, drop the
  ``low_quality``, keep the ``ok``) — the stage that removes whole bad
  HOSTS rather than individual documents.  Duplication evidence is
  shared 5-word document prefixes (the template/boilerplate signal;
  exact-hash duplication is D8's job and the synthetic corpus has none).

Scale notes (100 TB): PX1's count tables are VOCABULARY-sized (heads,
bigrams) — the cost joins are keyed equi-joins left unhinted so AQE
broadcasts them when the vocabulary is small and shuffles by key when it
is not; everything else is narrow maps + hash aggregates.  QB1's only
corpus-keyed shuffle is the per-score rollup; its windows run over
bounded dimension tables (score resolution, 256 buckets, one boundary
bucket).  DR1 is two hash aggregates keyed on domain/prefix plus one
keyed semi-join.  No reference counterpart for any of the three (the
reference curates bibliographic metadata, not web text); the gate style
follows oc_meta/run/meta/crossref_process.py's filter-then-load
discipline of dropping rows before the expensive stages.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# PX1 — bigram-LM bits-per-token filter.  Reference slice: lang = 'en'
# (CCNet trains on Wikipedia; here the corpus's English slice stands in).
# Documents with fewer than 2 words have no bigrams and are UNSCORED —
# they simply do not appear (a length gate, not a perplexity gate, owns
# them; T1/T3 cover that).  keep = milli_bits <= threshold, i.e. "at
# most ~4.86 bits per bigram on average" — roughly the corpus median, so
# the gate is non-degenerate in both directions.
# ---------------------------------------------------------------------------
_PX1_REF_LANG = "en"
_PX1_KEEP_MILLI_BITS = 4860

# the bigram decomposition (guarded for sub-2-word docs — see D23/CH1 on
# Spark's descending sequence(1, 0)) lives in lm_counts.BIGRAMS_EXPR: ONE
# Spark rendering shared by the inline scorer and the persisted-count
# scorer, mirroring PX_SCORING_CTES on the oracle side
from oc_meta_spark.plans.lm_counts import BIGRAMS_EXPR as _PX1_BIGRAMS  # noqa: E402


# The ONE DuckDB rendering of lm_bits_scores: every oracle that claims to
# share PX1's scorer (PX2's tertile split, PX3's persisted-count scoring)
# interpolates THIS constant rather than re-typing the CTEs — an edit to
# the scoring SQL cannot desynchronize the "shared scorer" contract.
# Yields ``scored (doc_id, lang, n_bigrams, total_bits, milli_bits)`` —
# one row per scorable (≥2-word) document, milli_bits = integer
# bits-per-bigram × 1000 (exact log2 via bit length, see the module doc).
PX_SCORING_CTES = f"""
    words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ),
    train_big AS (
      SELECT ws[i] AS w1, ws[i+1] AS w2
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i
            FROM words WHERE lang = '{_PX1_REF_LANG}')
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM train_big GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM train_big GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT w1) + 1 AS v FROM train_big),
    score_big AS (
      SELECT doc_id, lang, ws[i] AS w1, ws[i+1] AS w2
      FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i FROM words)
    ),
    costed AS (
      SELECT s.doc_id, s.lang,
             (length(bin(COALESCE(c1.c1, 0) + v.v)) - 1)
             - (length(bin(COALESCE(c12.c12, 0) + 1)) - 1) AS bits
      FROM score_big s
      LEFT JOIN c12 ON c12.w1 = s.w1 AND c12.w2 = s.w2
      LEFT JOIN c1 ON c1.w1 = s.w1
      CROSS JOIN vocab v
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(bits) AS BIGINT) AS total_bits,
             CAST((1000 * SUM(bits)) // COUNT(*) AS BIGINT) AS milli_bits
      FROM costed GROUP BY doc_id, lang
    )
"""


@register(
    "PX1_lm_bits_per_token_filter",
    f"""
    WITH {PX_SCORING_CTES}
    SELECT doc_id, n_bigrams, total_bits, milli_bits,
           milli_bits <= {_PX1_KEEP_MILLI_BITS} AS keep
    FROM scored ORDER BY doc_id
    """,
    doc="CCNet-style LM quality filter: add-one bigram model trained on the reference-language slice, integer bits-per-bigram score (exact log2 via bit length), keep the reference-like documents.",
)
def px1_lm_bits_per_token_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return lm_bits_scores(docs).select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        "milli_bits",
        (F.col("milli_bits") <= _PX1_KEEP_MILLI_BITS).alias("keep"),
    ).orderBy("doc_id")


def lm_bits_scores(docs: DataFrame) -> DataFrame:
    """The PX1 scoring kernel, shared with PX2's head/middle/tail split:
    (doc_id, lang, n_bigrams, total_bits, milli_bits) per scorable (≥2
    words) document — add-one bigram model trained on the
    reference-language slice, integer-bits cost (see the module doc)."""
    words = docs.select("doc_id", "lang", F.split("text", " ").alias("ws"))
    train = (
        words.filter(F.col("lang") == _PX1_REF_LANG)
        .select(F.explode(F.expr(_PX1_BIGRAMS)).alias("b"))
        .select("b.w1", "b.w2")
    )
    c12 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c1 and vocab DERIVE from c12 (r12): a head's count is the sum of its
    # bigram family's counts, and the vocabulary is c1's row count — value-
    # identical to counting the train pairs directly, but the three count
    # tables now share ONE explode+shuffle of the training slice (the
    # c12 exchange is reused by the derived aggregations; the previous
    # three independent branches each re-exploded the train corpus —
    # guide §2.4's shared-exchange rule)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = c1.agg((F.count(F.lit(1)) + 1).alias("v"))
    score = words.select(
        "doc_id", "lang", F.explode(F.expr(_PX1_BIGRAMS)).alias("b")
    ).select("doc_id", "lang", "b.w1", "b.w2")
    # count joins are deliberately UNHINTED: the count tables are
    # vocabulary-sized, so AQE broadcasts them at web-corpus vocabularies
    # and falls back to a keyed shuffle if a tokenizer explosion grows
    # them (the round-5 merge-path lesson: never force-broadcast a side
    # whose size the data controls)
    fl2 = lambda c: F.length(F.bin(c)) - 1  # noqa: E731 — exact floor(log2(x)), x >= 1
    costed = (
        score.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang",
            (
                fl2(F.coalesce("c1", F.lit(0)) + F.col("v"))
                - fl2(F.coalesce("c12", F.lit(0)) + F.lit(1))
            ).alias("bits"),
        )
    )
    agg = costed.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("total_bits"),
    )
    return agg.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "total_bits",
        F.expr("(1000 * total_bits) div n_bigrams").alias("milli_bits"),
    )


# ---------------------------------------------------------------------------
# PX3 — the PERSISTED form of PX1's model: build the gram-bucketed LM
# count tables on a founding slice of the reference language (doc_id %
# 10 != 0), extend them with the rest (the nightly append — counts are
# additive, so extend ≡ rebuild exactly), score the WHOLE corpus against
# the extended counts.  The oracle is PX1's scoring SQL (PX_SCORING_CTES)
# verbatim — a missed, doubled, or half-merged gram count would shift
# some document's total_bits and the hash would diverge.  Store
# persistence, gp partition layout, retry idempotency (additive counts
# DOUBLE on replay without the doc witness), and the layout guard are
# pinned by tests/test_lm_counts.py.
# ---------------------------------------------------------------------------


@register(
    "PX3_incremental_lm_scoring",
    f"""
    WITH {PX_SCORING_CTES}
    SELECT doc_id, lang, n_bigrams, total_bits, milli_bits
    FROM scored ORDER BY doc_id
    """,
    doc="Persisted LM count tables: founding-slice counts nightly-extended with the delta must score every document identically to PX1's from-scratch model (additive extend≡rebuild, gram-hash-bucketed store).",
)
def px3_incremental_lm_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.lm_counts import (
        build_lm_counts,
        extend_lm_counts,
        score_with_counts,
    )

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("lang") == _PX1_REF_LANG).select("doc_id", "text")
    founding = build_lm_counts(train.filter(F.col("doc_id") % 10 != 0))
    extended = extend_lm_counts(founding, train.filter(F.col("doc_id") % 10 == 0))
    return (
        score_with_counts(docs, extended)
        .select("doc_id", "lang", "n_bigrams", "total_bits", "milli_bits")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# QB1 — token-budget quality selection.  Quality = type-token ratio in
# permille (integer — any integer score plugs in); tokens = whitespace
# words; budget = half the corpus's tokens (computed from the data, so
# the gate is scale-free across SFs).  Selection order is (quality DESC,
# seeded md5 key ASC, doc_id ASC) — the seeded key de-correlates the
# boundary draw from doc_id AND spreads the boundary score class
# uniformly over the 256 refinement buckets.  A document is kept iff the
# running token total through it stays <= budget (greedy prefix rule).
# ---------------------------------------------------------------------------
_QB1_SEED = "qb1"


def budget_select(t: DataFrame, n_levels: int = 1) -> DataFrame:
    """Aggregate-then-refine greedy prefix selection over
    (q_ppm DESC, skey, doc_id) — see the module docstring.  ``t`` needs
    columns (doc_id, q_ppm, n_tok, skey); the budget is computed as
    half of t's total tokens.  Returns the kept (doc_id, q_ppm, n_tok).

    ``n_levels`` is the number of 2-hex-char hash-bucket refinement
    levels between the score rollup and the final rank window: the
    boundary set shrinks ~256× per level, so the rank window's input is
    ~(boundary score class) / 256^n_levels.  Ordering by successive
    2-char substrings of ``skey`` IS ordering by ``skey`` (prefix
    decomposition), so every depth selects the identical greedy prefix —
    pinned by tests/test_quality.py across n_levels ∈ {0, 1, 2}.  One
    level suffices until a single score class holds ≥ ~256 executor-
    partitions' worth of the corpus; add levels, never a global sort.

    Window boundedness: the score cumsum runs over the per-score rollup
    (score RESOLUTION rows, ≤1001 for a permille score); each bucket
    cumsum over ≤256 rows per surviving boundary group; the final rank
    window over the one innermost boundary bucket — the only place a row
    window touches document rows at all.
    """
    from oc_meta_spark.plans.rank_refine import class_cumsum

    budget = t.agg(F.expr("sum(n_tok) div 2").alias("budget"))

    # the per-score rollup with running token totals — rank_refine's
    # class_cumsum (this function is where the pattern was first proven;
    # the helper now owns the rollup-cumsum step for all its consumers)
    cum_q = class_cumsum(t, [], ["q_ppm"], weight_col="n_tok", ascending=False).join(
        F.broadcast(budget)
    )
    full_q = cum_q.filter(F.col("cum") <= F.col("budget")).select("q_ppm")
    kept = [t.join(F.broadcast(full_q), "q_ppm", "left_semi")]

    # at most one score class straddles the budget; rem = tokens still
    # unspent when its docs start
    boundary = cum_q.filter(
        (F.col("cum_before") < F.col("budget")) & (F.col("cum") > F.col("budget"))
    ).select("q_ppm", (F.col("budget") - F.col("cum_before")).alias("rem"))
    bd = t.join(F.broadcast(boundary), "q_ppm")
    keys = ["q_ppm"]

    for lvl in range(1, n_levels + 1):
        b = f"b{lvl}"
        bd = bd.withColumn(b, F.substring("skey", 2 * lvl - 1, 2))
        per_b = bd.groupBy(*keys, "rem", b).agg(F.sum("n_tok").alias("tok"))
        w_b = (
            Window.partitionBy(*keys)
            .orderBy(b)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum_b = per_b.withColumn("cum", F.sum("tok").over(w_b)).withColumn(
            "cum_before", F.col("cum") - F.col("tok")
        )
        full_b = cum_b.filter(F.col("cum") <= F.col("rem")).select(*keys, b)
        keys = keys + [b]
        kept.append(bd.join(F.broadcast(full_b), keys, "left_semi"))
        bboundary = cum_b.filter(
            (F.col("cum_before") < F.col("rem")) & (F.col("cum") > F.col("rem"))
        ).select(*keys, (F.col("rem") - F.col("cum_before")).alias("rem2"))
        bd = (
            bd.drop("rem")
            .join(F.broadcast(bboundary), keys)
            .withColumnRenamed("rem2", "rem")
        )

    w_r = (
        Window.partitionBy(*keys)
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept.append(
        bd.withColumn("cum_r", F.sum("n_tok").over(w_r)).filter(
            F.col("cum_r") <= F.col("rem")
        )
    )

    cols = ["doc_id", "q_ppm", "n_tok"]
    out = kept[0].select(cols)
    for k in kept[1:]:
        out = out.unionByName(k.select(cols))
    return out


@register(
    "QB1_token_budget_selection",
    f"""
    WITH t AS (
      SELECT doc_id,
             (1000 * len(list_distinct(string_split(text, ' '))))
               // len(string_split(text, ' ')) AS q_ppm,
             len(string_split(text, ' ')) AS n_tok,
             md5('{_QB1_SEED}:' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    ),
    b AS (SELECT SUM(n_tok) // 2 AS budget FROM t),
    cum AS (
      SELECT doc_id, q_ppm, n_tok,
             SUM(n_tok) OVER (ORDER BY q_ppm DESC, skey, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(q_ppm AS BIGINT) AS q_ppm,
           CAST(n_tok AS BIGINT) AS n_tok
    FROM cum CROSS JOIN b WHERE cum <= budget ORDER BY doc_id
    """,
    doc="Token-budget quality selection: keep the highest-quality documents whose cumulative tokens fit half the corpus budget — aggregate-then-refine, pinned against the naive global-window oracle.",
)
def qb1_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    t = docs.select(
        "doc_id",
        F.expr(
            "(1000 * size(array_distinct(split(text, ' ')))) div size(split(text, ' '))"
        ).alias("q_ppm"),
        F.size(ws).alias("n_tok"),
        F.md5(
            F.concat(F.lit(_QB1_SEED), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("skey"),
    )
    return (
        budget_select(t)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("q_ppm").cast("long").alias("q_ppm"),
            F.col("n_tok").cast("long").alias("n_tok"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DR1 — per-domain reputation rollup.  Domains are the UF1 synthesis
# (source × doc_id-range → host).  Evidence per domain: document count,
# documents sharing their 5-word prefix with ANY other document in the
# corpus (template/boilerplate duplication — corpus-global, so a domain
# is charged for copying another domain's boilerplate too), and pooled
# type-token quality in permille.  Verdicts: ``quarantine`` when ≥ 1/4
# of the domain's documents are prefix-duplicated; else ``low_quality``
# below the quality floor; else ``ok``.
# ---------------------------------------------------------------------------
_DR1_PREFIX_WORDS = 5
_DR1_QUALITY_FLOOR_PPM = 380

# The ONE DuckDB rendering of the reputation rollup — DR2's persisted-
# stats gate shares it verbatim (the PX_SCORING_CTES discipline), so the
# store's build+extend path must reproduce the full-rescan verdicts bit
# for bit.
_DR1_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id,
             source || '-' || CAST((doc_id // 20) % 5 AS VARCHAR)
               || '.example.org' AS domain,
             array_to_string(string_split(text, ' ')[1:{_DR1_PREFIX_WORDS}], ' ')
               AS prefix5,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
    ),
    dup AS (SELECT prefix5 FROM docs GROUP BY prefix5 HAVING COUNT(*) >= 2),
    rolled AS (
      SELECT domain,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN prefix5 IN (SELECT prefix5 FROM dup)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
             CAST((1000 * SUM(n_uniq)) // SUM(n_words) AS BIGINT) AS q_ppm
      FROM docs GROUP BY domain
    )
    SELECT domain, n_docs, n_dup_docs, q_ppm,
           CASE WHEN 4 * n_dup_docs >= n_docs THEN 'quarantine'
                WHEN q_ppm < {_DR1_QUALITY_FLOOR_PPM} THEN 'low_quality'
                ELSE 'ok' END AS verdict
    FROM rolled ORDER BY domain
"""


def _dr_domain() -> F.Column:
    """The UF1/DR1 synthetic host (source × doc_id-range) — one
    definition for DR1's rescan and DR2's persisted-stats gate."""
    return F.concat(
        F.col("source"),
        F.lit("-"),
        F.expr("cast((doc_id div 20) % 5 as string)"),
        F.lit(".example.org"),
    )


@register(
    "DR1_domain_reputation",
    _DR1_ORACLE,
    doc="Web-curation domain reputation: per-host rollup of boilerplate duplication and pooled quality, with quarantine/low-quality/ok verdicts (RefinedWeb-style host-level filtering).",
)
def dr1_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    ws = F.split("text", " ")
    d = docs.select(
        "doc_id",
        _dr_domain().alias("domain"),
        F.array_join(F.slice(ws, 1, _DR1_PREFIX_WORDS), " ").alias("prefix5"),
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_uniq"),
    )
    dup = (
        d.groupBy("prefix5")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("prefix5")
    )
    # the dup-prefix table is boilerplate-vocabulary sized — unhinted
    # keyed semi-join (AQE broadcasts it when small)
    dup_per_domain = (
        d.join(dup, "prefix5", "left_semi")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_dup_docs"))
    )
    rolled = (
        d.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_uniq").alias("su"),
            F.sum("n_words").alias("sw"),
        )
        .join(dup_per_domain, "domain", "left")
        .select(
            "domain",
            "n_docs",
            F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
            F.expr("(1000 * su) div sw").alias("q_ppm"),
        )
    )
    return rolled.select(
        "domain",
        "n_docs",
        "n_dup_docs",
        "q_ppm",
        F.when(4 * F.col("n_dup_docs") >= F.col("n_docs"), "quarantine")
        .when(F.col("q_ppm") < _DR1_QUALITY_FLOOR_PPM, "low_quality")
        .otherwise("ok")
        .alias("verdict"),
    ).orderBy("domain")


# ---------------------------------------------------------------------------
# DR2 — the PERSISTED form of DR1: accumulate the per-domain evidence on
# a founding slice (doc_id % 10 != 0), extend with the rest (the nightly
# append — every accumulator is additive, so extend ≡ rebuild exactly),
# derive the verdicts from the store alone.  The oracle is DR1's SQL
# verbatim — the retroactive-dup property is the subtle part it pins: a
# prefix whose SECOND copy arrives only in the delta must charge the
# founding-slice holder too, exactly as a full rescan would (the store
# keeps per-(prefix, domain) counts, so the corpus-global dup rule is
# derived, never frozen at build time).  Store persistence, replay
# doubling, and the layout guard are pinned by tests/test_domain_stats.py.
# ---------------------------------------------------------------------------


@register(
    "DR2_incremental_domain_reputation",
    _DR1_ORACLE,
    doc="Persisted domain-reputation stats: founding-slice accumulators nightly-extended with the delta must yield DR1's full-rescan verdicts exactly (additive extend≡rebuild, derived corpus-global dup rule).",
)
def dr2_incremental_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.domain_stats import (
        build_domain_stats,
        extend_domain_stats,
        reputation_from_stats,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", _dr_domain().alias("domain"), "text"
    )
    founding = build_domain_stats(docs.filter(F.col("doc_id") % 10 != 0))
    extended = extend_domain_stats(founding, docs.filter(F.col("doc_id") % 10 == 0))
    return reputation_from_stats(extended, _DR1_QUALITY_FLOOR_PPM).orderBy("domain")
