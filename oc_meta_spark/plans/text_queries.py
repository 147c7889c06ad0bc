"""Scalar-function plans (SURVEY §2.8 C-class) and text-analysis operators
for the training-data pipeline (language-ID heuristic, quality scoring,
token counting, document fingerprinting).

The C-class functions are the reference's correctness surface
(oc_meta/lib/cleaner.py, lib/master_of_regex.py); here they are exercised
generically over the synthetic tables.  The bibliographic-exact versions
(applied to real metadata CSVs) live in :mod:`oc_meta_spark.functions` with
their own unit tests; these plans prove the *expressions* are engine-exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# Unicode dash variants → '-' and space variants → ' ' (reference tables at
# oc_meta/lib/cleaner.py:30-57).
DASHES = "\u2010\u2011\u2012\u2013\u2014\u2015\u2212\ufe58\ufe63\uff0d"
SPACES = "\u00a0\u2002\u2003\u2009\u202f\u3000"
TRANSLATE_FROM = DASHES + SPACES
TRANSLATE_TO = "-" * len(DASHES) + " " * len(SPACES)
NBSP = "\u00a0"
ENDASH = "\u2013"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# C1/C2 — unicode hyphen/space normalization via translate().  Dirty input
# is synthesized deterministically (inject an en-dash and nbsp per doc).
# ---------------------------------------------------------------------------
@register(
    "C1_normalize_hyphens_spaces",
    f"""
    WITH dirty AS (
      SELECT doc_id,
             replace(replace(text, ' ', CASE WHEN doc_id % 3 = 0 THEN '{NBSP}' ELSE ' ' END),
                     'a', CASE WHEN doc_id % 2 = 0 THEN '{ENDASH}' ELSE 'a' END) AS t
      FROM documents
    )
    SELECT doc_id,
           md5(translate(t, '{TRANSLATE_FROM}', '{TRANSLATE_TO}')) AS norm_hash,
           length(t) AS len_dirty,
           length(translate(t, '{TRANSLATE_FROM}', '{TRANSLATE_TO}')) AS len_norm
    FROM dirty ORDER BY doc_id
    """,
    doc="normalize_hyphens/normalize_spaces as translate() (SURVEY C1/C2/C11).",
)
def c1_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dirty = docs.withColumn(
        "t",
        F.replace(
            F.replace(
                F.col("text"),
                F.lit(" "),
                F.when(F.col("doc_id") % 3 == 0, F.lit(NBSP)).otherwise(F.lit(" ")),
            ),
            F.lit("a"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(ENDASH)).otherwise(F.lit("a")),
        ),
    )
    norm = F.translate(F.col("t"), TRANSLATE_FROM, TRANSLATE_TO)
    return dirty.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length("t").cast("bigint").alias("len_dirty"),
        F.length(norm).cast("bigint").alias("len_norm"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C3 — acronym-preserving title case: title-case each word unless it has an
# inner capital (reference clean_title, oc_meta/lib/cleaner.py:162-180).
# Expressed with a higher-order transform — no UDF.
# ---------------------------------------------------------------------------
@register(
    "C3_title_case_acronyms",
    r"""
    WITH src AS (
      SELECT p_partkey, CASE WHEN p_partkey % 5 = 0 THEN upper(p_name) ELSE p_name END AS raw
      FROM part
    )
    SELECT p_partkey AS partkey, raw,
           array_to_string(
             list_transform(string_split(raw, ' '),
               w -> CASE WHEN regexp_matches(substr(w, 2), '[A-Z]') THEN w
                         ELSE upper(substr(w, 1, 1)) || lower(substr(w, 2)) END),
             ' ') AS title
    FROM src ORDER BY partkey
    """,
    doc="clean_title: per-word title case preserving acronyms (SURVEY C3), UDF-free.",
)
def c3_title_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    raw = F.when(F.col("p_partkey") % 5 == 0, F.upper("p_name")).otherwise(F.col("p_name"))
    title = F.array_join(
        F.transform(
            F.split(F.col("raw"), " "),
            lambda w: F.when(
                w.substr(F.lit(2), F.length(w)).rlike("[A-Z]"), w
            ).otherwise(F.concat(F.upper(w.substr(1, 1)), F.lower(w.substr(F.lit(2), F.length(w))))),
        ),
        " ",
    )
    return (
        part.withColumn("raw", raw)
        .select(F.col("p_partkey").alias("partkey"), "raw", title.alias("title"))
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# C4 — partial-date cleaning: YYYY / YYYY-MM / YYYY-MM-DD strings parsed to
# (year, month, day) with NULL for absent components (reference clean_date,
# oc_meta/lib/cleaner.py:183-239; partial precision per SURVEY §1.2).
# Dirty inputs synthesized from event timestamps at 3 precisions.
# ---------------------------------------------------------------------------
@register(
    "C4_partial_date_parse",
    """
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y')
                  WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m')
                  ELSE strftime(ts, '%Y-%m-%d') END AS date_str
      FROM events WHERE user_id < 50
    )
    SELECT event_id, date_str,
           CAST(substr(date_str, 1, 4) AS INT) AS year,
           CASE WHEN length(date_str) >= 7 THEN CAST(substr(date_str, 6, 2) AS INT) END AS month,
           CASE WHEN length(date_str) >= 10 THEN CAST(substr(date_str, 9, 2) AS INT) END AS day
    FROM raw ORDER BY event_id
    """,
    doc="clean_date partial-precision parsing — dates stay strings (SURVEY C4, hard part §7.4.3).",
)
def c4_partial_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    date_str = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "yyyy-MM"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
    )
    raw = ev.withColumn("date_str", date_str)
    return raw.select(
        "event_id",
        "date_str",
        F.substring("date_str", 1, 4).cast("int").alias("year"),
        F.when(F.length("date_str") >= 7, F.substring("date_str", 6, 2).cast("int")).alias("month"),
        F.when(F.length("date_str") >= 10, F.substring("date_str", 9, 2).cast("int")).alias("day"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# C8 — identifier checksum validation (ISSN mod-11 with X check digit;
# reference normalize_id, oc_meta/lib/cleaner.py:373-415).  ISSNs are
# synthesized from supplier keys; some are corrupted to exercise rejection.
# ---------------------------------------------------------------------------
@register(
    "C8_issn_checksum_validation",
    """
    WITH base AS (
      SELECT s_suppkey, lpad(CAST(s_suppkey * 13 % 10000000 AS VARCHAR), 7, '0') AS digits
      FROM supplier
    ),
    chk AS (
      SELECT s_suppkey, digits,
             (8 * CAST(substr(digits, 1, 1) AS INT) + 7 * CAST(substr(digits, 2, 1) AS INT)
            + 6 * CAST(substr(digits, 3, 1) AS INT) + 5 * CAST(substr(digits, 4, 1) AS INT)
            + 4 * CAST(substr(digits, 5, 1) AS INT) + 3 * CAST(substr(digits, 6, 1) AS INT)
            + 2 * CAST(substr(digits, 7, 1) AS INT)) % 11 AS r
      FROM base
    ),
    issn AS (
      SELECT s_suppkey, digits,
             CASE WHEN r = 0 THEN '0' WHEN r = 1 THEN 'X'
                  ELSE CAST(11 - r AS VARCHAR) END AS check_digit
      FROM chk
    ),
    cand AS (
      SELECT s_suppkey,
             substr(digits, 1, 4) || '-' || substr(digits, 5, 3)
               || CASE WHEN s_suppkey % 11 = 0 THEN '0' ELSE check_digit END AS issn_str
      FROM issn
    )
    SELECT s_suppkey AS suppkey, issn_str,
           ((8 * CAST(substr(issn_str, 1, 1) AS INT) + 7 * CAST(substr(issn_str, 2, 1) AS INT)
           + 6 * CAST(substr(issn_str, 3, 1) AS INT) + 5 * CAST(substr(issn_str, 4, 1) AS INT)
           + 4 * CAST(substr(issn_str, 6, 1) AS INT) + 3 * CAST(substr(issn_str, 7, 1) AS INT)
           + 2 * CAST(substr(issn_str, 8, 1) AS INT)
           + CASE WHEN substr(issn_str, 9, 1) = 'X' THEN 10 ELSE CAST(substr(issn_str, 9, 1) AS INT) END)
           % 11 = 0) AND issn_str <> '0000-0000' AS valid
    FROM cand ORDER BY suppkey
    """,
    doc="ISSN mod-11 checksum validation as pure column arithmetic (SURVEY C8).",
)
def c8_issn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    base = supp.withColumn("digits", F.lpad(((F.col("s_suppkey") * 13) % 10000000).cast("string"), 7, "0"))

    def dig(col: str, i: int) -> F.Column:
        return F.substring(col, i, 1).cast("int")

    r = (
        8 * dig("digits", 1) + 7 * dig("digits", 2) + 6 * dig("digits", 3) + 5 * dig("digits", 4)
        + 4 * dig("digits", 5) + 3 * dig("digits", 6) + 2 * dig("digits", 7)
    ) % 11
    check = F.when(r == 0, "0").when(r == 1, "X").otherwise((11 - r).cast("string"))
    issn_str = F.concat(
        F.substring("digits", 1, 4),
        F.lit("-"),
        F.substring("digits", 5, 3),
        F.when(F.col("s_suppkey") % 11 == 0, F.lit("0")).otherwise(check),
    )
    cand = base.withColumn("issn_str", issn_str)
    last = F.when(F.substring("issn_str", 9, 1) == "X", F.lit(10)).otherwise(
        F.substring("issn_str", 9, 1).cast("int")
    )
    total = (
        8 * dig("issn_str", 1) + 7 * dig("issn_str", 2) + 6 * dig("issn_str", 3) + 5 * dig("issn_str", 4)
        + 4 * dig("issn_str", 6) + 3 * dig("issn_str", 7) + 2 * dig("issn_str", 8) + last
    ) % 11
    return cand.select(
        F.col("s_suppkey").alias("suppkey"),
        "issn_str",
        ((total == 0) & (F.col("issn_str") != "0000-0000")).alias("valid"),
    ).orderBy("suppkey")


# ---------------------------------------------------------------------------
# C10/C12 — `Name [id id]` micro-grammar: build then split with regex
# (reference split_name_and_ids, oc_meta/lib/master_of_regex.py:35-63 and
# its inverse build_name_ids_string, core/curator.py:830-838).
# ---------------------------------------------------------------------------
@register(
    "C10_split_name_and_ids",
    r"""
    WITH built AS (
      SELECT c_custkey,
             c_name || ' [key:' || CAST(c_custkey AS VARCHAR) || ' seg:' || c_mktsegment || ']' AS cell
      FROM customer
    )
    SELECT c_custkey AS custkey, cell,
           trim(regexp_extract(cell, '^(.*?)\s*\[(.*)\]$', 1)) AS name,
           regexp_extract(cell, '^(.*?)\s*\[(.*)\]$', 2) AS ids,
           string_split(regexp_extract(cell, '^(.*?)\s*\[(.*)\]$', 2), ' ')[1] AS first_id
    FROM built ORDER BY custkey
    """,
    doc="Cell micro-grammar round-trip: build_name_ids_string ∘ split_name_and_ids (SURVEY C10/C12).",
)
def c10_split_name_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cell = F.concat(
        F.col("c_name"), F.lit(" [key:"), F.col("c_custkey").cast("string"), F.lit(" seg:"), F.col("c_mktsegment"), F.lit("]")
    )
    built = cust.withColumn("cell", cell)
    pat = r"^(.*?)\s*\[(.*)\]$"
    return built.select(
        F.col("c_custkey").alias("custkey"),
        "cell",
        F.trim(F.regexp_extract("cell", pat, 1)).alias("name"),
        F.regexp_extract("cell", pat, 2).alias("ids"),
        F.split(F.regexp_extract("cell", pat, 2), " ").getItem(0).alias("first_id"),
    ).orderBy("custkey")


# ---------------------------------------------------------------------------
# T1 — token statistics (training-data pipeline: token counting over the
# documents table; whitespace tokenization with exact int arithmetic).
# ---------------------------------------------------------------------------
@register(
    "T1_token_stats",
    """
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
             length(text) - length(replace(text, ' ', '')) AS n_spaces
      FROM documents
    )
    SELECT doc_id, lang, n_tokens, n_spaces,
           CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token
    FROM toks ORDER BY doc_id
    """,
    doc="Whitespace token counting + per-doc stats (training-data text analysis).",
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("bigint")
    n_spaces = (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).cast("bigint")
    return (
        docs.select(
            "doc_id",
            "lang",
            n_tokens.alias("n_tokens"),
            n_spaces.alias("n_spaces"),
            (F.col("n_chars").cast("double") / n_tokens).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# T2 — language-ID heuristic: stopword-marker voting (training-data
# pipeline).  Markers are fixed lists; the prediction is the argmax vote
# with deterministic tie-break by marker-set order.
# ---------------------------------------------------------------------------
_MARKERS = {
    "en": ["the", "a", "value", "fast"],
    "fr": ["le", "la", "et", "query"],
    "de": ["der", "und", "das", "sort"],
}


@register(
    "T2_language_id_heuristic",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    votes AS (
      SELECT doc_id, lang,
             CAST(SUM(CASE WHEN w IN ('the','a','value','fast') THEN 1 ELSE 0 END) AS BIGINT) AS v_en,
             CAST(SUM(CASE WHEN w IN ('le','la','et','query') THEN 1 ELSE 0 END) AS BIGINT) AS v_fr,
             CAST(SUM(CASE WHEN w IN ('der','und','das','sort') THEN 1 ELSE 0 END) AS BIGINT) AS v_de
      FROM toks GROUP BY doc_id, lang
    )
    SELECT doc_id, lang AS actual,
           CASE WHEN v_en >= v_fr AND v_en >= v_de THEN 'en'
                WHEN v_fr >= v_de THEN 'fr' ELSE 'de' END AS predicted,
           v_en, v_fr, v_de
    FROM votes ORDER BY doc_id
    """,
    doc="n-gram/stopword language-ID heuristic with deterministic argmax (text analysis).",
)
def t2_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    votes = toks.groupBy("doc_id", "lang").agg(
        *[
            F.sum(F.when(F.col("w").isin(words), 1).otherwise(0)).cast("bigint").alias(f"v_{k}")
            for k, words in _MARKERS.items()
        ]
    )
    predicted = (
        F.when((F.col("v_en") >= F.col("v_fr")) & (F.col("v_en") >= F.col("v_de")), "en")
        .when(F.col("v_fr") >= F.col("v_de"), "fr")
        .otherwise("de")
    )
    return votes.select(
        "doc_id", F.col("lang").alias("actual"), predicted.alias("predicted"), "v_en", "v_fr", "v_de"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T3 — quality scoring: length / stopword-ratio / repetition features with
# exact arithmetic (training-data pipeline quality filters).
# ---------------------------------------------------------------------------
@register(
    "T3_quality_score",
    """
    WITH feats AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tok,
             len(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))) AS n_uniq,
             length(text) AS n_char,
             CAST(SUM(CASE WHEN w IN ('the','a') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
      FROM (SELECT doc_id, text, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, text
    )
    SELECT doc_id, n_tok, n_uniq, n_stop,
           CAST(n_uniq AS DOUBLE) / n_tok AS ttr,
           CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
           (n_tok >= 20 AND CAST(n_uniq AS DOUBLE) / n_tok > 0.3) AS keep
    FROM feats ORDER BY doc_id
    """,
    doc="Quality scoring: type-token ratio, stopword ratio, keep-filter (text analysis).",
)
def t3_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    base = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_uniq"),
        F.size(F.filter(words, lambda w: w.isin("the", "a"))).cast("bigint").alias("n_stop"),
    )
    ttr = F.col("n_uniq").cast("double") / F.col("n_tok")
    return base.select(
        "doc_id",
        "n_tok",
        "n_uniq",
        "n_stop",
        ttr.alias("ttr"),
        (F.col("n_stop").cast("double") / F.col("n_tok")).alias("stop_ratio"),
        ((F.col("n_tok") >= 20) & (ttr > 0.3)).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T4 — document fingerprinting: winnowing-style minimum over character
# shingle hashes (training-data pipeline; rolling-hash fingerprint).
# ---------------------------------------------------------------------------
@register(
    "T4_document_fingerprint",
    """
    WITH shingles AS (
      SELECT doc_id, md5(substr(text, CAST(i AS INT), 8)) AS h
      FROM documents
      CROSS JOIN (SELECT unnest(range(1, 1000, 4)) AS i)
      WHERE CAST(i AS INT) + 7 <= length(text)
    )
    SELECT doc_id, MIN(h) AS fingerprint, COUNT(*) AS n_shingles
    FROM shingles GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Winnowing-style shingle fingerprint: min-hash over 8-char shingles, stride 4 (text analysis).",
)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pos = spark.range(1, 1000, 4).select(F.col("id").cast("int").alias("i"))
    return (
        docs.crossJoin(F.broadcast(pos))
        .filter(F.col("i") + 7 <= F.length("text"))
        .select("doc_id", F.md5(F.expr("substr(text, i, 8)")).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("fingerprint"), F.count(F.lit(1)).alias("n_shingles"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# T5 — BPE-style subword pre-tokenization count (training-data pipeline).
# The GPT-2 pre-tokenizer splits on contractions, letter runs, digit runs,
# punctuation runs and whitespace; this uses the lookaround-free core of
# that pattern, with whitespace as an explicit ASCII class, so Java regex
# (Spark) and RE2 (DuckDB) agree exactly.
# ---------------------------------------------------------------------------

# Whitespace is spelled as an explicit class: Java's \s includes vertical
# tab while RE2's does not, so a bare \s would diverge between engines on
# \x0B input.
_WS = r"[ \t\n\r\f\x0B]"
_BPE_PATTERN = rf"'(?:s|t|re|ve|m|ll|d)| ?\p{{L}}+| ?\p{{N}}+| ?[^ \t\n\r\f\x0B\p{{L}}\p{{N}}]+|{_WS}+"


_BPE_SQL = _BPE_PATTERN.replace("'", "''")


@register(
    "T5_bpe_token_count",
    rf"""
    SELECT doc_id, lang,
           CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text, '{_BPE_SQL}')) AS chars_per_bpe_token
    FROM documents ORDER BY doc_id
    """,
    doc="GPT-2-style pre-tokenizer counts vs whitespace counts (training-data token accounting).",
)
def t5_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_ws = F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("bigint")
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0))).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length("text").cast("double") / n_bpe).alias("chars_per_bpe_token"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T6 — repetition quality signals (Gopher-style rules: Rae et al. 2021 §A1.1
# "repetition" filters).  Per document: unique-word ratio, the fraction of
# bigram occurrences taken by the single most frequent bigram, and the
# fraction of trigram occurrences belonging to trigrams that appear more
# than once.  All three are pure hash-aggregates over exploded n-grams —
# map-side partial aggregation, no window over the corpus, no UDF; the
# divisions are single int→double IEEE operations so both engines agree
# bitwise (plans/registry.py determinism contract).
# ---------------------------------------------------------------------------
@register(
    "T6_repetition_signals",
    """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    w AS (SELECT doc_id, unnest(ws) AS w FROM words),
    uq AS (SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT w) AS n_uniq FROM w GROUP BY doc_id),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words)
    ),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
    bga AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM bgc GROUP BY doc_id),
    tg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM words)
    ),
    tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g),
    tga AS (
      SELECT doc_id,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ,
             SUM(c) AS tot
      FROM tgc GROUP BY doc_id
    )
    SELECT uq.doc_id,
           uq.n_words,
           CAST(uq.n_uniq AS DOUBLE) / uq.n_words AS unique_word_ratio,
           CASE WHEN bga.tot > 0 THEN CAST(bga.top_c AS DOUBLE) / bga.tot ELSE 0.0 END AS top_bigram_frac,
           CASE WHEN tga.tot > 0 THEN CAST(tga.dup_occ AS DOUBLE) / tga.tot ELSE 0.0 END AS dup_trigram_frac
    FROM uq LEFT JOIN bga ON uq.doc_id = bga.doc_id
            LEFT JOIN tga ON uq.doc_id = tga.doc_id
    ORDER BY uq.doc_id
    """,
    doc="Gopher-style repetition filters: unique-word ratio, top-bigram fraction, duplicated-trigram fraction (training-data quality).",
)
def t6_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("ws"))
    w = docs.select("doc_id", F.explode("ws").alias("w"))
    uq = w.groupBy("doc_id").agg(
        F.count("*").alias("n_words"), F.countDistinct("w").alias("n_uniq")
    )
    # Guarded against Spark's descending sequence(1, 0): a 1-word doc must
    # yield zero bigrams, not a spurious partial gram from concat_ws dropping
    # the null out-of-range element.
    bg_arr = F.expr(
        "CASE WHEN size(ws) >= 2 THEN "
        "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', ws[i-1], ws[i])) "
        "ELSE array() END"
    )
    bg = docs.select("doc_id", F.explode(bg_arr).alias("g"))
    bgc = bg.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    bga = bgc.groupBy("doc_id").agg(F.max("c").alias("top_c"), F.sum("c").alias("tot_bg"))
    tg_arr = F.expr(
        "CASE WHEN size(ws) >= 3 THEN "
        "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])) "
        "ELSE array() END"
    )
    tg = docs.select("doc_id", F.explode(tg_arr).alias("g"))
    tgc = tg.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    tga = tgc.groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_occ"),
        F.sum("c").alias("tot_tg"),
    )
    return (
        uq.join(bga, "doc_id", "left")
        .join(tga, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (F.col("n_uniq").cast("double") / F.col("n_words")).alias("unique_word_ratio"),
            F.when(F.col("tot_bg") > 0, F.col("top_c").cast("double") / F.col("tot_bg"))
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
            F.when(F.col("tot_tg") > 0, F.col("dup_occ").cast("double") / F.col("tot_tg"))
            .otherwise(F.lit(0.0))
            .alias("dup_trigram_frac"),
        )
        .orderBy("doc_id")
    )
