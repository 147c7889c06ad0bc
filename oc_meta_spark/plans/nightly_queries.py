"""IN2 — the composed nightly pipeline gate: one two-batch ingest fold
maintains EVERY persisted corpus store (dedup signature index, postings
index, LM count tables, domain-reputation stats) from the same survivor
sets, and the oracle re-derives every store's queryable output FROM
SCRATCH over the final corpus.

What this pins that the isolated gates (IN1, IR2, PX3, DR2) cannot:

- the stores are consistent with EACH OTHER — every store's membership
  is exactly the corpus the dedup verdicts admitted (base ∪ survivors),
  so a document can never be searchable but unscoreable;
- each store's extend≡rebuild holds THROUGH the fold — extended twice,
  from survivor sets the classification itself produced, not from a
  hand-picked founding/delta split;
- the dedup verdicts themselves (IN1's two-batch fold semantics, with
  in-batch holder collapse and cross-batch survivor dedup) are
  re-pinned alongside.

Output: one tall (component, key, val) frame —
  ``verdict``    key=doc_id,  val=verdict:matched_existing(-1):batch
  ``search``     key=rank,    val=doc_id:score:n_terms_hit (IR1's terms/k
                              over the final postings store)
  ``lm_head``    key=w1,      val=c1 (the FULL head-count table)
  ``lm_bigram``  key=w1 w2,   val=c12 for repeated bigrams (c12 >= 2 —
                              where an additive-merge double-count would
                              land; presence is covered by lm_head)
  ``domain``     key=domain,  val=n_docs:n_dup_docs:q_ppm:verdict (DR1's
                              reputation verdicts from the final stats)

The oracle reuses the shared renderings verbatim: the ingest fold's CTEs
(plans/ingest_fold_oracle.py — IN1's chain), IR1's scoring, DR1's
rollup, and the PX bigram decomposition — the one-rendering-per-shared-
contract discipline.

Reference analog: oc_meta/run/meta_process.py's single per-chunk
pipeline writing data + provenance + counters together — one unit of
work updates every table or none.  Persisted form:
streaming/ingest.py's ``nightly=True`` manifest composition (pinned by
tests/test_streaming_ingest.py); this gate runs the bounded in-memory
fold (plans/nightly.py) — same kernels, no filesystem round-trip.

Scale notes (100 TB corpus, ~1 TB nightly delta): the fold adds no scan
class the isolated extends don't already pay — one classification per
batch (ID1's delta-prefiltered probes), then O(delta) extends per store;
the gate's output components are store-sized reads (postings top-k via
TakeOrderedAndProject, vocabulary-sized LM/domain rollups).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.ingest_fold_oracle import IN_FOLD_CTES
from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table

# IR1's query and DR1's thresholds, imported DIRECTLY from their owning
# modules: the registry's explicit ROTATION list (round-12) decoupled the
# externally-sampled gate order from module import order, so importing a
# registering module for its constants no longer perturbs anything — the
# round-11 restated-literals workaround (and its equality-pin test) is
# gone.
from oc_meta_spark.plans.quality_queries import (  # noqa: E402
    _DR1_PREFIX_WORDS as _IN2_PREFIX_WORDS,
    _DR1_QUALITY_FLOOR_PPM as _IN2_QUALITY_FLOOR_PPM,
    _dr_domain,
)
from oc_meta_spark.plans.retrieval_queries import (  # noqa: E402
    _IR1_K as _IN2_K,
    _IR1_TERMS as _IN2_TERMS,
)

_TERMS_SQL = ", ".join(f"'{t}'" for t in _IN2_TERMS)

_IN2_ORACLE = f"""
    WITH {IN_FOLD_CTES},
    corpus_final AS (
      SELECT doc_id, text FROM corpus1 UNION ALL SELECT doc_id, text FROM surv1
    ),
    verdict_rows AS (
      SELECT 'verdict' AS component, CAST(doc_id AS VARCHAR) AS key,
             verdict || ':' || CAST(COALESCE(matched_existing, -1) AS VARCHAR)
                     || ':' || CAST(batch AS VARCHAR) AS val
      FROM (SELECT * FROM ver0 UNION ALL SELECT * FROM ver1)
    ),
    sn AS (SELECT COUNT(*) AS n_docs FROM corpus_final),
    stf AS (
      SELECT doc_id, w AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus_final)
      WHERE w IN ({_TERMS_SQL})
      GROUP BY doc_id, w
    ),
    sdf AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM stf GROUP BY term),
    sscored AS (
      SELECT stf.doc_id,
             SUM(stf.tf * ((1000 * sn.n_docs) // sdf.df)) AS score,
             COUNT(*) AS n_terms_hit
      FROM stf JOIN sdf USING (term) CROSS JOIN sn
      GROUP BY stf.doc_id
    ),
    srk AS (
      SELECT doc_id, score, n_terms_hit,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM sscored
    ),
    search_rows AS (
      SELECT 'search' AS component, CAST(rank AS VARCHAR) AS key,
             CAST(doc_id AS VARCHAR) || ':' || CAST(score AS VARCHAR)
               || ':' || CAST(n_terms_hit AS VARCHAR) AS val
      FROM srk WHERE rank <= {_IN2_K}
    ),
    big AS (
      SELECT ws[i] AS w1, ws[i+1] AS w2
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i
            FROM (SELECT string_split(text, ' ') AS ws FROM corpus_final))
    ),
    head_rows AS (
      SELECT 'lm_head' AS component, w1 AS key, CAST(COUNT(*) AS VARCHAR) AS val
      FROM big GROUP BY w1
    ),
    bigram_rows AS (
      SELECT 'lm_bigram' AS component, w1 || ' ' || w2 AS key,
             CAST(cnt AS VARCHAR) AS val
      FROM (SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2)
      WHERE cnt >= 2
    ),
    ddocs AS (
      SELECT c.doc_id,
             d.source || '-' || CAST((c.doc_id // 20) % 5 AS VARCHAR)
               || '.example.org' AS domain,
             array_to_string(string_split(c.text, ' ')[1:{_IN2_PREFIX_WORDS}], ' ')
               AS prefix5,
             len(string_split(c.text, ' ')) AS n_words,
             len(list_distinct(string_split(c.text, ' '))) AS n_uniq
      FROM corpus_final c JOIN documents d ON d.doc_id = c.doc_id
    ),
    ddup AS (SELECT prefix5 FROM ddocs GROUP BY prefix5 HAVING COUNT(*) >= 2),
    drolled AS (
      SELECT domain,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN prefix5 IN (SELECT prefix5 FROM ddup)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
             CAST((1000 * SUM(n_uniq)) // SUM(n_words) AS BIGINT) AS q_ppm
      FROM ddocs GROUP BY domain
    ),
    domain_rows AS (
      SELECT 'domain' AS component, domain AS key,
             CAST(n_docs AS VARCHAR) || ':' || CAST(n_dup_docs AS VARCHAR)
               || ':' || CAST(q_ppm AS VARCHAR) || ':'
               || CASE WHEN 4 * n_dup_docs >= n_docs THEN 'quarantine'
                       WHEN q_ppm < {_IN2_QUALITY_FLOOR_PPM} THEN 'low_quality'
                       ELSE 'ok' END AS val
      FROM drolled
    )
    SELECT component, key, val FROM (
      SELECT * FROM verdict_rows
      UNION ALL SELECT * FROM search_rows
      UNION ALL SELECT * FROM head_rows
      UNION ALL SELECT * FROM bigram_rows
      UNION ALL SELECT * FROM domain_rows
    )
    ORDER BY component, key, val
"""


def _tagged(df: DataFrame, component: str, key, val) -> DataFrame:
    return df.select(
        F.lit(component).alias("component"),
        key.cast("string").alias("key"),
        val.alias("val"),
    )


# ---------------------------------------------------------------------------
# IN2 — the composed nightly fold (see module doc).
# ---------------------------------------------------------------------------
@register(
    "IN2_composed_nightly_fold",
    _IN2_ORACLE,
    doc="Composed nightly pipeline: one two-batch ingest fold extends the signature, postings, LM-count and domain-stat stores from the same survivor sets; every store's output re-derived from scratch over the final corpus by the oracle.",
)
def in2_composed_nightly_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy imports: incremental_queries registers gates — importing it at
    # module import time would perturb the registry's rotation order
    from oc_meta_spark.plans.domain_stats import reputation_from_stats
    from oc_meta_spark.plans.incremental_queries import in1_planted_batches
    from oc_meta_spark.plans.nightly import build_nightly_stores, nightly_fold
    from oc_meta_spark.plans.postings_index import search_postings

    docs = load_table(spark, "documents", sf_dir)
    # the UF1/DR1 synthetic host — imported, not restated (see the
    # constants block above)
    doms = docs.select("doc_id", _dr_domain().alias("domain"))
    base = (
        docs.filter(~(F.col("doc_id") % 10).isin(0, 1))
        .select("doc_id", "text")
        .join(doms, "doc_id")
    )
    batches = [
        b.join(doms, "doc_id").select("doc_id", "text", "domain")
        for b in in1_planted_batches(docs.select("doc_id", "text"))
    ]
    verdicts, stores = nightly_fold(batches, build_nightly_stores(base))

    verdict_rows = _tagged(
        verdicts,
        "verdict",
        F.col("doc_id"),
        F.concat_ws(
            ":",
            "verdict",
            F.coalesce(F.col("matched_existing"), F.lit(-1)).cast("string"),
            F.col("batch").cast("string"),
        ),
    )
    search_rows = _tagged(
        search_postings(stores.postings, list(_IN2_TERMS), _IN2_K),
        "search",
        F.col("rank"),
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("score").cast("string"),
            F.col("n_terms_hit").cast("string"),
        ),
    )
    head_rows = _tagged(
        stores.lm.heads, "lm_head", F.col("w1"), F.col("c1").cast("string")
    )
    bigram_rows = _tagged(
        stores.lm.bigrams.filter(F.col("c12") >= 2),
        "lm_bigram",
        F.concat_ws(" ", "w1", "w2"),
        F.col("c12").cast("string"),
    )
    domain_rows = _tagged(
        reputation_from_stats(stores.domains, _IN2_QUALITY_FLOOR_PPM),
        "domain",
        F.col("domain"),
        F.concat_ws(
            ":",
            F.col("n_docs").cast("string"),
            F.col("n_dup_docs").cast("string"),
            F.col("q_ppm").cast("string"),
            "verdict",
        ),
    )
    return (
        verdict_rows.unionByName(search_rows)
        .unionByName(head_rows)
        .unionByName(bigram_rows)
        .unionByName(domain_rows)
        .orderBy("component", "key", "val")
    )


# ---------------------------------------------------------------------------
# IN3 — the nightly fold WITH the decontamination composition: the same
# two-batch ingest fold as IN2, interleaved with a MID-FOLD benchmark
# release — batch 0 probes its survivors against the founding benchmark
# index, the release indexes the remaining eval sets and retroactively
# probes the corpus-so-far, batch 1 probes against the full index.  The
# oracle is DC1's from-scratch contamination report over (final corpus ×
# final benchmark list) — the gram CTEs below are DC1's decomposition
# (hygiene_queries._DC1_ORACLE) applied to the fold's corpus_final, so a
# pair missed, doubled, or probed against stale grams by the interleaved
# cadences diverges the hash.
#
# Benchmark set: the documents at doc_id % _BENCH_MOD == 0 with their
# ORIGINAL texts (eval sets are released, never derived from the planted
# corpus); founding slice = % 100 == 0, mid-fold release = % 100 == 50.
# Those doc_ids all fall in batch 0's residue (%50==0 ⇒ %10==0), where
# IN1's plant replaces their text with an exact-dup donor — so they are
# classified away and the corpus/benchmark sides stay disjoint on both
# engines by construction.
# ---------------------------------------------------------------------------
from oc_meta_spark.plans.hygiene_queries import _BENCH_MOD  # noqa: E402


def _in3_grams_sql(src: str, key: str, alias: str) -> str:
    """DC1's N-gram decomposition as a CTE body over ``src`` — the DuckDB
    mirror of decontam_index.GRAMS_EXPR (sub-N-word rows yield no grams:
    the range is empty), parameterized by the shared NGRAM constant."""
    from oc_meta_spark.plans.decontam_index import NGRAM

    g = " || ' ' || ".join(f"ws[i+{j}]" for j in range(NGRAM))
    return (
        f"SELECT DISTINCT {key} AS {alias}, {g} AS g "
        f"FROM (SELECT {key}, ws, unnest(range(1, len(ws) - {NGRAM - 2})) AS i "
        f"FROM (SELECT {key}, string_split(text, ' ') AS ws FROM {src}))"
    )


_IN3_ORACLE = f"""
    WITH {IN_FOLD_CTES},
    corpus_final AS (
      SELECT doc_id, text FROM corpus1 UNION ALL SELECT doc_id, text FROM surv1
    ),
    cgrams AS ({_in3_grams_sql("corpus_final", "doc_id", "doc_id")}),
    bench_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_BENCH_MOD} = 0
    ),
    bgrams AS ({_in3_grams_sql("bench_docs", "doc_id", "bench_id")})
    SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared_grams
    FROM cgrams c JOIN bgrams b ON c.g = b.g
    GROUP BY c.doc_id, b.bench_id
    ORDER BY c.doc_id, b.bench_id
"""


@register(
    "IN3_nightly_decontam_fold",
    _IN3_ORACLE,
    doc="Nightly fold with the decontamination composition: corpus batches probe survivors against the benchmark gram index, a mid-fold eval-set release extends the index and retroactively probes the corpus — the final ledger must equal DC1's from-scratch report over (final corpus × final benchmarks).",
)
def in3_nightly_decontam_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.plans.decontam_index import build_decontam_index
    from oc_meta_spark.plans.incremental_queries import in1_planted_batches
    from oc_meta_spark.plans.nightly import build_nightly_stores, nightly_decontam_fold

    docs = load_table(spark, "documents", sf_dir)
    doms = docs.select("doc_id", _dr_domain().alias("domain"))
    base = (
        docs.filter(~(F.col("doc_id") % 10).isin(0, 1))
        .select("doc_id", "text")
        .join(doms, "doc_id")
    )
    batches = [
        b.join(doms, "doc_id").select("doc_id", "text", "domain")
        for b in in1_planted_batches(docs.select("doc_id", "text"))
    ]
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    founding = build_decontam_index(bench.filter(F.col("bench_id") % 100 == 0))
    events = [
        ("batch", batches[0]),
        ("bench", bench.filter(F.col("bench_id") % 100 != 0)),
        ("batch", batches[1]),
    ]
    _verdicts, _stores, _idx, contam = nightly_decontam_fold(
        base, events, build_nightly_stores(base), founding
    )
    return contam.select("doc_id", "bench_id", "n_shared_grams").orderBy(
        "doc_id", "bench_id"
    )
