"""Persisted domain-reputation statistics — DR1's nightly shape.  DR1's
gate re-scans the whole corpus per run; a production crawl rolls the
per-domain evidence up ONCE and extends it nightly, under the
persisted-store contract of the signature/IVF/postings/LM-count stores
(plans/incremental.py, ivf_index.py, postings_index.py, lm_counts.py;
reference analog: the resumable-cache discipline of
oc_meta/run/meta_process.py:183-190):

- ``domain_stats``: (domain, n_docs, sum_uniq, sum_words) — the pooled-
  quality accumulators, ADDITIVE, one row per domain (host-vocabulary
  sized, plain parquet).
- ``prefix_domain``: (prefix5, domain, n_docs) — how many of a domain's
  documents open with each 5-word prefix, hive-partitioned by ``pp`` =
  the 2-char md5 prefix of prefix5 (the gram-hash bucketing of the
  sibling stores).  The boilerplate-duplication evidence is DERIVED:
  a prefix is duplicated iff its count summed over all domains >= 2, and
  a domain's n_dup_docs is the sum of its counts over duplicated
  prefixes — so the corpus-global dup rule stays exact under nightly
  growth (a prefix that becomes duplicated only when tonight's copy
  lands retroactively charges yesterday's holder, exactly as a full
  rescan would).
- ``docs``: (doc_id) — the retry-idempotency witness (counts are
  additive: a replayed delta would silently double them without it).
- ``meta``: the layout marker.

Every accumulator is additive, so ``extend_domain_stats`` (count the
genuinely-new docs, merge per key) EXACTLY equals a rebuild from the
full corpus, at delta cost — the merge is ONE full-outer equi-join per
table (null-coalesced sums; r13, guide §3), each side referenced
exactly once.  ``reputation_from_stats`` derives DR1's verdict table from
the store — which is why the DR2 gate's oracle is DR1's SQL verbatim.

Scale shape (100 TB crawl): the store is vocabulary-sized (hosts,
distinct prefixes); the nightly extend costs O(delta); the verdict
derivation never touches a document — two vocabulary-table aggregates
and one keyed semi-join.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DOMAIN_STATS_LAYOUT = "pp_v1"  # meta marker: prefix_domain/ partitioned by pp

_PREFIX_WORDS = 5  # DR1's boilerplate-prefix length — one definition


@dataclass
class DomainStats:
    """The persisted reputation accumulators (see module doc)."""

    domain_stats: DataFrame  # (domain, n_docs, sum_uniq, sum_words)
    prefix_domain: DataFrame  # (prefix5, domain, n_docs, pp)
    docs: DataFrame  # (doc_id): every counted document


def _evidence(docs: DataFrame) -> DataFrame:
    ws = F.split("text", " ")
    return docs.select(
        "doc_id",
        "domain",
        F.array_join(F.slice(ws, 1, _PREFIX_WORDS), " ").alias("prefix5"),
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_uniq"),
    )


def build_domain_stats(docs: DataFrame) -> DomainStats:
    """Accumulate a (doc_id, domain, text) corpus into the store shape."""
    ev = _evidence(docs)
    domain_stats = ev.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_uniq").alias("sum_uniq"),
        F.sum("n_words").alias("sum_words"),
    )
    prefix_domain = (
        ev.groupBy("prefix5", "domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("pp", F.substring(F.md5("prefix5"), 1, 2))
    )
    return DomainStats(
        domain_stats=domain_stats,
        prefix_domain=prefix_domain,
        docs=docs.select("doc_id"),
    )


def materialized_domain_stats(docs: DataFrame) -> DomainStats:
    """``build_domain_stats`` with every table ``localCheckpoint``-ed in
    DEPENDENCY order — the fold-bootstrap form (plans/nightly.py); the
    persisted path gets this materialization for free from
    ``write_domain_stats`` → ``read_domain_stats``.  The per-doc evidence
    pass is checkpointed first so the corpus is scanned ONCE for both
    output aggregates (left lazy, the two checkpoint jobs each re-run
    the split/distinct projection; and without any checkpoint, the
    folds' semi/anti extend splits re-evaluate the founding subtree up
    to 2^batches times at read time — r12 measurement: IN2's domain
    component read ran ~4× a single build's cost at two batches)."""
    ev = _evidence(docs).localCheckpoint()
    domain_stats = ev.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_uniq").alias("sum_uniq"),
        F.sum("n_words").alias("sum_words"),
    ).localCheckpoint()
    prefix_domain = (
        ev.groupBy("prefix5", "domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("pp", F.substring(F.md5("prefix5"), 1, 2))
        .localCheckpoint()
    )
    return DomainStats(
        domain_stats=domain_stats,
        prefix_domain=prefix_domain,
        docs=docs.select("doc_id").localCheckpoint(),
    )


def extend_domain_stats(stats: DomainStats, new_docs: DataFrame) -> DomainStats:
    """The nightly append: accumulate the genuinely-new documents and
    merge per key.  Additive accumulators make this EXACTLY a rebuild at
    delta cost; the doc-level witness keeps a replayed delta from
    doubling counts.

    The merge is ONE full-outer equi-join per table (r13, guide §3): a
    key in the store only keeps its row, a key only in the delta enters
    with its row, a shared key adds — null-coalesced sums over an outer
    join ARE the per-key additive merge.  The previous shape (broadcast
    semi + anti probes, re-aggregate touched ∪ delta, union back) scanned
    the store TWICE and referenced the delta twice, costing ~6 jobs per
    extend; in the in-memory fold (plans/nightly.py) the double
    references also doubled the lazy chain per batch.  One join
    references store and delta ONCE each, so the fold's read-time plan
    is depth-N over the founding checkpoints, never 2^N.  Both tables
    are vocabulary-bounded (hosts; distinct boilerplate prefixes), so
    one keyed exchange per nightly merge is the cheap side of the trade
    against a second full store scan — and the persisted nightly path
    rewrites the merged table anyway, paying that exchange regardless."""
    from oc_meta_spark.plans.incremental import fresh_only

    fresh = fresh_only(
        new_docs.select("doc_id", "domain", "text"), stats.docs, "doc_id"
    )
    delta = build_domain_stats(fresh)

    z = F.lit(0)
    merged_d = (
        stats.domain_stats.alias("s")
        .join(delta.domain_stats.alias("d"), ["domain"], "full_outer")
        .select(
            "domain",
            (F.coalesce("s.n_docs", z) + F.coalesce("d.n_docs", z)).alias("n_docs"),
            (F.coalesce("s.sum_uniq", z) + F.coalesce("d.sum_uniq", z)).alias("sum_uniq"),
            (F.coalesce("s.sum_words", z) + F.coalesce("d.sum_words", z)).alias(
                "sum_words"
            ),
        )
    )

    merged_p = (
        stats.prefix_domain.alias("s")
        .join(delta.prefix_domain.alias("d"), ["pp", "prefix5", "domain"], "full_outer")
        .select(
            "prefix5",
            "domain",
            (F.coalesce("s.n_docs", z) + F.coalesce("d.n_docs", z)).alias("n_docs"),
            "pp",
        )
    )

    return DomainStats(
        domain_stats=merged_d,
        prefix_domain=merged_p,
        docs=stats.docs.unionByName(delta.docs),
    )


def write_domain_stats(stats: DomainStats, path: str) -> None:
    """Persist domain_stats/ plain (host-vocabulary sized), prefix_domain/
    hive-partitioned by ``pp``, docs/ plain, and the one-row meta/ layout
    marker — the shared store contract (plans/store_contract.py)."""
    from oc_meta_spark.plans.store_contract import write_store

    write_store(
        path,
        {
            "domain_stats": (stats.domain_stats, None),
            "prefix_domain": (stats.prefix_domain, "pp"),
            "docs": (stats.docs, None),
        },
        "layout string",
        (DOMAIN_STATS_LAYOUT,),
    )


def read_domain_stats(spark: SparkSession, path: str) -> DomainStats:
    """Load a persisted store, refusing a foreign layout; explicit read
    schemas keep ``pp`` a true partition attribute (the store contract's
    rule)."""
    from oc_meta_spark.plans.store_contract import check_meta, read_meta, read_table

    meta = read_meta(spark, path)
    check_meta(meta, {"layout": DOMAIN_STATS_LAYOUT}, path, "domain-stats store")
    return DomainStats(
        domain_stats=read_table(spark, path, "domain_stats", None),
        prefix_domain=read_table(
            spark,
            path,
            "prefix_domain",
            "prefix5 string, domain string, n_docs bigint, pp string",
        ),
        docs=read_table(spark, path, "docs", None),
    )


def reputation_from_stats(
    stats: DomainStats, quality_floor_ppm: int
) -> DataFrame:
    """DR1's verdict table derived from the accumulators — never touching
    a document: dup prefixes from the global prefix rollup (>= 2 docs
    corpus-wide), n_dup_docs per domain over the dup set (unhinted keyed
    semi-join — boilerplate-vocabulary sized), pooled q_ppm from the
    additive sums, the quarantine/low_quality/ok thresholds."""
    dup = (
        stats.prefix_domain.groupBy("prefix5")
        .agg(F.sum("n_docs").alias("c"))
        .filter(F.col("c") >= 2)
        .select("prefix5")
    )
    dup_per_domain = (
        stats.prefix_domain.join(dup, "prefix5", "left_semi")
        .groupBy("domain")
        .agg(F.sum("n_docs").alias("n_dup_docs"))
    )
    return (
        stats.domain_stats.join(dup_per_domain, "domain", "left")
        .select(
            "domain",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
            F.expr("(1000 * sum_uniq) div sum_words").alias("q_ppm"),
        )
        .select(
            "domain",
            "n_docs",
            "n_dup_docs",
            "q_ppm",
            F.when(4 * F.col("n_dup_docs") >= F.col("n_docs"), "quarantine")
            .when(F.col("q_ppm") < quality_floor_ppm, "low_quality")
            .otherwise("ok")
            .alias("verdict"),
        )
    )
