"""Persisted benchmark-decontamination index — DC1's nightly shape.

DC1's gate re-explodes the benchmark set per run; a production pipeline
decontaminates EVERY nightly corpus delta against a benchmark list that
itself grows (new eval sets get added, never re-derived from the
corpus), so the benchmark gram index is built once and extended as
benchmarks land — the sixth persisted store, and the first written
entirely on the shared contract (plans/store_contract.py; reference
analog: the resumable-cache discipline of
oc_meta/run/meta_process.py:183-190):

- ``grams``: (bench_id, g) — one row per (benchmark doc, DISTINCT
  5-gram), hive-partitioned by ``gp`` = the 2-char md5 prefix of the
  gram (the gram-hash bucketing of the sibling stores: gram cardinality
  is unbounded, its hash prefix bounds file counts).
- ``benchmarks``: (bench_id, h) — every indexed benchmark doc, gram-less
  (< 5 words) included: the retry-idempotency witness (exactly the
  postings-index ``docs`` argument), plus the md5 of the text it was
  indexed under — the reference the revision guard compares a
  re-presented bench_id against.
- ``meta``: the layout marker.

Gram rows are disjoint per bench_id, so ``extend_decontam_index``
(index the delta, union) is EXACTLY equivalent to rebuilding from the
full benchmark list, at delta cost, and idempotent under retried
appends (``fresh_only``); re-adding a known bench_id with DIFFERENT
text is a revision — REFUSED loudly (a silently-dropped revision would
leave grams unique to the revised text unindexed, and contamination
against them unreported — the one store where a silent miss is most
costly), mirroring ingest_batch's revision refusal.

``decontaminate`` is DC1's contaminated-pair kernel over the persisted
index — which is why the DC4 gate's oracle is DC1's SQL verbatim:
build-on-a-slice + extend-with-the-rest must reproduce the from-scratch
contamination report bit for bit.

Scale shape (100 TB corpus, benchmark list ~10⁵-10⁷ grams): the index
is benchmark-sized — orders of magnitude below the corpus — so the
probe join BROADCASTS it (DC1's documented shape); the corpus side's
gram explosion is a narrow map consumed by the broadcast hash join, no
corpus shuffle at all.  The nightly benchmark append touches delta rows
only.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# meta marker: grams/ partitioned by gp; v2 = benchmarks carries the
# content hash ``h`` (the revision guard's witness) — v1 stores lack it
# and must be rebuilt, not misread as all-null hashes
DECONTAM_LAYOUT = "gp_v2"

NGRAM = 5  # DC1's gram length — one definition, imported by the gates

# the guarded gram expression (over a pre-split ``ws`` array column):
# Spark's sequence(1, 0) is DESCENDING, so an unguarded transform over
# sub-N-word docs would emit spurious partial grams (concat_ws silently
# drops null out-of-range elements); docs with fewer than N words must
# produce zero grams, matching the oracle's empty range.  THE Spark
# rendering of the gram decomposition — hygiene_queries imports it (this
# module registers no gates, so the import direction cannot perturb the
# registry's rotation order).
GRAMS_EXPR = (
    f"CASE WHEN size(ws) >= {NGRAM} THEN "
    f"transform(sequence(1, size(ws) - {NGRAM - 1}), "
    f"i -> concat_ws(' ', {', '.join(f'ws[i+{j}-1]' for j in range(NGRAM))})) "
    f"ELSE array() END"
)


@dataclass
class DecontamIndex:
    """The persisted benchmark gram index (see module doc)."""

    grams: DataFrame  # (bench_id, g, gp)
    benchmarks: DataFrame  # (bench_id, h): indexed docs + content hash


def _distinct_grams(docs: DataFrame, key: str) -> DataFrame:
    """(key, g): one row per (doc, distinct 5-gram)."""
    return (
        docs.select(key, F.split("text", " ").alias("ws"))
        .select(key, F.explode(F.expr(GRAMS_EXPR)).alias("g"))
        .dropDuplicates([key, "g"])
    )


def build_decontam_index(bench_docs: DataFrame) -> DecontamIndex:
    """Index a (bench_id, text) benchmark list: distinct 5-grams per doc
    plus the gram-hash partition column."""
    grams = _distinct_grams(bench_docs, "bench_id").withColumn(
        "gp", F.substring(F.md5("g"), 1, 2)
    )
    return DecontamIndex(
        grams=grams,
        benchmarks=bench_docs.select("bench_id", F.md5("text").alias("h")),
    )


def decontam_delta(index: DecontamIndex, new_bench: DataFrame) -> DecontamIndex:
    """The revision-guarded DELTA index for newly-released benchmark docs
    — what ``extend_decontam_index`` unions in, exposed separately so the
    nightly fold can retroactively probe the existing corpus against
    exactly the new grams (plans/nightly.py) at delta cost.

    A known bench_id re-presented with DIFFERENT text is a REVISION and
    is refused loudly (the stored ``h`` is the witness): silently
    dropping it would leave grams unique to the revised text unindexed
    and contamination against them unreported.  A revision needs an
    index rebuild from the corrected benchmark list.  Identical
    re-presentation is a retry and drops out via ``fresh_only`` — both
    probes are broadcast delta-keyed semis; the index side is scanned,
    never shuffled."""
    from oc_meta_spark.plans.incremental import fresh_only

    hashed = new_bench.select("bench_id", "text", F.md5("text").alias("nh"))
    drift = (
        index.benchmarks.join(
            F.broadcast(hashed.select("bench_id", "nh").dropDuplicates(["bench_id"])),
            "bench_id",
        )
        .filter(F.col("nh") != F.col("h"))
    )
    first_drift = drift.take(1)
    if first_drift:
        raise ValueError(
            f"bench_id {first_drift[0]['bench_id']} was already indexed with "
            "different text — a benchmark revision needs an index rebuild, "
            "not an append (grams unique to the revised text would go "
            "unindexed); refusing the extend"
        )
    fresh = fresh_only(hashed.select("bench_id", "text"), index.benchmarks, "bench_id")
    return build_decontam_index(fresh)


def extend_decontam_index(index: DecontamIndex, new_bench: DataFrame) -> DecontamIndex:
    """Append newly-released benchmark docs: gram rows are per-doc
    disjoint, so indexing the genuinely-new docs (``decontam_delta`` —
    revision-refusing, retry-idempotent) and unioning EXACTLY equals a
    rebuild from the full list, at delta cost."""
    delta = decontam_delta(index, new_bench)
    return DecontamIndex(
        grams=index.grams.unionByName(delta.grams),
        benchmarks=index.benchmarks.unionByName(delta.benchmarks),
    )


def write_decontam_index(index: DecontamIndex, path: str) -> None:
    """Persist grams/ hive-partitioned by ``gp``, benchmarks/ plain, and
    the one-row meta/ layout marker — the shared store contract."""
    from oc_meta_spark.plans.store_contract import write_store

    write_store(
        path,
        {"grams": (index.grams, "gp"), "benchmarks": (index.benchmarks, None)},
        "layout string",
        (DECONTAM_LAYOUT,),
    )


def read_decontam_index(spark: SparkSession, path: str) -> DecontamIndex:
    """Load a persisted index, refusing a foreign layout; explicit gram
    schema keeps ``gp`` a true partition attribute (the contract's
    rule)."""
    from oc_meta_spark.plans.store_contract import check_meta, read_meta, read_table

    meta = read_meta(spark, path)
    check_meta(meta, {"layout": DECONTAM_LAYOUT}, path, "decontamination index")
    return DecontamIndex(
        grams=read_table(spark, path, "grams", "bench_id bigint, g string, gp string"),
        benchmarks=read_table(spark, path, "benchmarks", "bench_id bigint, h string"),
    )


def decontaminate(corpus_docs: DataFrame, index: DecontamIndex) -> DataFrame:
    """(doc_id, bench_id, n_shared_grams): DC1's contamination report for
    a (doc_id, text) corpus slice against the persisted index.  The index
    side is benchmark-sized and BROADCASTS (DC1's documented scale shape:
    the corpus's gram explosion is a narrow map into the broadcast hash
    join — zero corpus shuffle before the per-pair rollup)."""
    corpus_grams = _distinct_grams(corpus_docs, "doc_id")
    return (
        corpus_grams.join(F.broadcast(index.grams.select("bench_id", "g")), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
