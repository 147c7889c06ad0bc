"""Corpus-hygiene operators: benchmark decontamination and PII redaction.

Two more steps a production training-data pipeline runs between dedup and
shard-writing:

- DC1 — decontamination: find corpus documents that share any word n-gram
  with a benchmark/eval set.  Same inverted-index shape as the D18 Jaccard
  join (explode n-grams, equi-join on the gram, aggregate per pair) —
  candidate volume is O(shared grams), never corpus × benchmark.  At 100 TB
  the benchmark side is tiny and broadcasts; the corpus side's gram
  explosion is a narrow map feeding one shuffle keyed on the gram.
- DC2 — PII redaction: regex rewrite of email-shaped and phone-shaped
  substrings.  Pure per-row projection (scan-stage, zero shuffle); the
  patterns use a dialect-neutral regex subset so the SQL oracle and the
  JVM path agree byte-for-byte.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# benchmark set: every 50th document; 5-word grams (NGRAM — the one
# definition lives in decontam_index, whose GRAMS_EXPR is also the one
# Spark rendering of the guarded gram decomposition)
from oc_meta_spark.plans.decontam_index import NGRAM as _NGRAM  # noqa: E402

_BENCH_MOD = 50

# The ONE DuckDB rendering of the contamination report — DC4's
# persisted-index gate shares it verbatim (the PX_SCORING_CTES
# discipline), so the index's build+extend path must reproduce the
# from-scratch report bit for bit.
_DC1_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {_NGRAM - 2})) AS i FROM words)
    ),
    bench AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % {_BENCH_MOD} = 0),
    corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared_grams
    FROM corpus c JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id, b.bench_id
    ORDER BY c.doc_id, b.bench_id
"""


# ---------------------------------------------------------------------------
# DC4 — the PERSISTED form of DC1: the benchmark gram index is built on a
# founding benchmark slice (bench_id % 100 == 0), extended with the later
# releases (% 100 == 50 — eval sets GROW; the corpus never re-derives
# them), persisted through the shared store contract, and the corpus is
# decontaminated against the loaded index.  The oracle is DC1's SQL over
# the FULL benchmark set verbatim — extend≡rebuild, the parquet
# round-trip, and the probe are pinned in one value-level check (the
# IR2/PX3/DR2 discipline).  Store persistence details (layout guard,
# retry idempotency, gp partition attribute) are pinned by
# tests/test_decontam_index.py.  Registered FIRST in this module so the
# new gate lands inside the externally-verified window (round-10 ADVICE).
# ---------------------------------------------------------------------------
@register(
    "DC4_persisted_decontamination",
    _DC1_ORACLE,
    doc="Persisted benchmark-decontamination index: founding-slice gram index nightly-extended with new eval sets, written/read through the shared store contract, must reproduce DC1's from-scratch contamination report exactly.",
)
def dc4_persisted_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from oc_meta_spark.plans.decontam_index import (
        build_decontam_index,
        decontaminate,
        extend_decontam_index,
        read_decontam_index,
        write_decontam_index,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    founding = build_decontam_index(bench.filter(F.col("bench_id") % 100 == 0))
    extended = extend_decontam_index(
        founding, bench.filter(F.col("bench_id") % 100 != 0)
    )
    tmp = tempfile.mkdtemp(prefix="dc4_store_")
    try:
        # the full persisted cycle: write → read → probe (the gates that
        # write through a sink collect before rmtree — same discipline)
        write_decontam_index(extended, os.path.join(tmp, "idx"))
        index = read_decontam_index(spark, os.path.join(tmp, "idx"))
        out = (
            decontaminate(docs.filter(F.col("doc_id") % _BENCH_MOD != 0), index)
            .orderBy("doc_id", "bench_id")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "DC1_benchmark_decontamination",
    _DC1_ORACLE,
    doc="Benchmark decontamination: corpus docs sharing any 5-gram with the eval set (inverted-index join, broadcastable benchmark side).",
)
def dc1_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.decontam_index import GRAMS_EXPR

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    grams = docs.select("doc_id", F.explode(F.expr(GRAMS_EXPR)).alias("g")).dropDuplicates(
        ["doc_id", "g"]
    )
    bench = grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id", "bench_id")
    )


# dialect-neutral patterns: no \\d / \\b shorthand differences — explicit
# classes and anchors shared by RE2-style and Java regex engines
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
_PHONE_RE = "[+][0-9]{2}[- ][0-9]{3}[- ][0-9]{4,7}"


@register(
    "DC2_pii_redaction",
    f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'contact me at user' || CAST(doc_id AS VARCHAR) || '@example.org thanks'
               WHEN 1 THEN 'call +39 051 2098555 or +44 020 79460000 now'
               WHEN 2 THEN 'no personal data here'
               ELSE 'mixed a.b-c_d@mail.co and +12 345 67890 inline'
             END AS text
      FROM documents WHERE doc_id < 400
    )
    SELECT doc_id, text,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS redacted,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones
    FROM seeded ORDER BY doc_id
    """,
    doc="PII redaction: email/phone regex rewrite with per-doc match counts (scan-stage projection, zero shuffle).",
)
def dc2_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 400)
    text = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("contact me at user"), F.col("doc_id").cast("string"),
                        F.lit("@example.org thanks")))
        .when(F.col("doc_id") % 4 == 1, F.lit("call +39 051 2098555 or +44 020 79460000 now"))
        .when(F.col("doc_id") % 4 == 2, F.lit("no personal data here"))
        .otherwise(F.lit("mixed a.b-c_d@mail.co and +12 345 67890 inline"))
    )
    seeded = docs.select("doc_id", text.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return seeded.select(
        "doc_id",
        "text",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DC3 — FUZZY benchmark decontamination: DC1's exact 5-gram match misses
# paraphrased leakage, so the public decontamination recipes pair it with
# a near-dup pass (MinHash between corpus and benchmark — e.g. the GPT-3
# appendix / open dataset-cleaning pipelines).  The benchmark side is
# synthesized in-query as perturbed copies of the first 20 documents
# (every 15th word dropped — high shingle overlap, zero exact 5-gram
# guarantee), so the oracle-checked result is non-trivial: planted pairs
# survive the true-Jaccard verify, cross noise does not.
#
# Plan shape: shingle → k=8 MinHash → 4 bands × 2 rows (band match prob
# ≈ 1-(1-j²)⁴: ~0.9 at the planted j≈0.65, ~1% at noise j≈0.05) →
# candidates on (band, bucket) equi-join — benchmark side tiny, broadcast
# — → exact shingle-Jaccard verify ≥ 0.3.  Same block-then-verify 100 TB
# shape as D16; determinism is exact (md5 minhashes, double division).
# ---------------------------------------------------------------------------
_DC3_BENCH_N = 20
# Synthetic benchmark ids live at doc_id + this offset; the constant is
# baked into the oracle SQL, so the builder asserts max(doc_id) < offset
# at run time and fails loudly instead of letting real ids silently
# collide with planted ones above the safe scale factor (sf0.1 max
# doc_id ≈ 2e3).
_DC3_OFFSET = 500000
_DC3_DROP = 15
_DC3_K = 8
_DC3_ROWS_PER_BAND = 2
_DC3_THRESH = "0.3e0"


@register(
    "DC3_fuzzy_decontamination",
    f"""
    WITH bench AS (
      SELECT doc_id + {_DC3_OFFSET} AS bench_id,
             array_to_string(list_filter(string_split(text, ' '), (x, i) -> i % {_DC3_DROP} != 0), ' ') AS text
      FROM documents WHERE doc_id < {_DC3_BENCH_N}
    ),
    cs AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
    ),
    bs AS (
      SELECT DISTINCT bench_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS s
      FROM (SELECT bench_id, ws, unnest(range(1, len(ws) - 1)) AS i
            FROM (SELECT bench_id, string_split(text, ' ') AS ws FROM bench))
    ),
    cmh AS (
      SELECT doc_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
      FROM cs CROSS JOIN (SELECT unnest(range({_DC3_K})) AS k) GROUP BY doc_id, k
    ),
    bmh AS (
      SELECT bench_id, k, MIN(md5(s || '#' || CAST(k AS VARCHAR))) AS h
      FROM bs CROSS JOIN (SELECT unnest(range({_DC3_K})) AS k) GROUP BY bench_id, k
    ),
    cb AS (
      SELECT doc_id, k // {_DC3_ROWS_PER_BAND} AS band,
             md5(string_agg(h, '|' ORDER BY k)) AS bucket
      FROM cmh GROUP BY doc_id, k // {_DC3_ROWS_PER_BAND}
    ),
    bb AS (
      SELECT bench_id, k // {_DC3_ROWS_PER_BAND} AS band,
             md5(string_agg(h, '|' ORDER BY k)) AS bucket
      FROM bmh GROUP BY bench_id, k // {_DC3_ROWS_PER_BAND}
    ),
    cand AS (
      SELECT DISTINCT c.doc_id, b.bench_id
      FROM cb c JOIN bb b ON c.band = b.band AND c.bucket = b.bucket
    ),
    inter AS (
      SELECT cand.doc_id, cand.bench_id, COUNT(*) AS ni
      FROM cand
      JOIN cs ON cs.doc_id = cand.doc_id
      JOIN bs ON bs.bench_id = cand.bench_id AND bs.s = cs.s
      GROUP BY cand.doc_id, cand.bench_id
    ),
    csz AS (SELECT doc_id, COUNT(*) AS nc FROM cs GROUP BY doc_id),
    bsz AS (SELECT bench_id, COUNT(*) AS nb FROM bs GROUP BY bench_id)
    SELECT i.doc_id, i.bench_id,
           CAST(i.ni AS DOUBLE) / (c.nc + b.nb - i.ni) AS jaccard
    FROM inter i
    JOIN csz c ON c.doc_id = i.doc_id
    JOIN bsz b ON b.bench_id = i.bench_id
    WHERE CAST(i.ni AS DOUBLE) / (c.nc + b.nb - i.ni) >= {_DC3_THRESH}
    ORDER BY i.doc_id, i.bench_id
    """,
    doc="Fuzzy decontamination: MinHash-banded corpus x benchmark near-dup with exact Jaccard verify, over in-query perturbed benchmark copies.",
)
def dc3_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.dedup_queries import _shingles

    from oc_meta_spark.plans.similarity_queries import assert_planted_offset_safe

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    assert_planted_offset_safe(docs, "doc_id", _DC3_OFFSET, "DC3_fuzzy_decontamination")
    bench = docs.filter(F.col("doc_id") < _DC3_BENCH_N).select(
        (F.col("doc_id") + _DC3_OFFSET).alias("bench_id"),
        F.array_join(
            F.filter(F.split("text", " "), lambda x, i: (i + 1) % _DC3_DROP != 0), " "
        ).alias("text"),
    )
    cs = _shingles(docs)
    bs = _shingles(bench.withColumnRenamed("bench_id", "doc_id")).withColumnRenamed(
        "doc_id", "bench_id"
    )
    ks = spark.range(_DC3_K).select(F.col("id").cast("int").alias("k"))

    def minhash_bands(sh: DataFrame, key: str) -> DataFrame:
        mh = (
            sh.crossJoin(F.broadcast(ks))
            .groupBy(key, "k")
            .agg(F.min(F.md5(F.concat_ws("#", "s", "k"))).alias("h"))
        )
        return (
            mh.withColumn("band", F.floor(F.col("k") / _DC3_ROWS_PER_BAND))
            .groupBy(key, "band")
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.sort_array(F.collect_list(F.struct("k", "h"))),
                            lambda x: x["h"],
                        ),
                        "|",
                    )
                ).alias("bucket")
            )
        )

    cb = minhash_bands(cs, "doc_id")
    bb = minhash_bands(bs, "bench_id")
    cand = (
        cb.join(F.broadcast(bb), ["band", "bucket"])
        .select("doc_id", "bench_id")
        .dropDuplicates()
    )
    inter = (
        cand.join(cs, "doc_id")
        .join(bs, ["bench_id", "s"])
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    csz = cs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nc"))
    bsz = bs.groupBy("bench_id").agg(F.count(F.lit(1)).alias("nb"))
    jac = F.col("ni").cast("double") / (F.col("nc") + F.col("nb") - F.col("ni"))
    return (
        inter.join(csz, "doc_id")
        .join(F.broadcast(bsz), "bench_id")
        .select("doc_id", "bench_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.3)
        .orderBy("doc_id", "bench_id")
    )
