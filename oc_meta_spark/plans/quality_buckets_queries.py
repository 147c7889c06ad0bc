"""PX2 — perplexity-bucketed corpus split: CCNet's actual OUTPUT
structure (Wenzek et al. 2020, public paper).  CCNet does not merely
filter on LM perplexity; it partitions each language's documents into
``head`` / ``middle`` / ``tail`` perplexity tertiles so downstream
consumers choose their quality/recall trade-off per slice.  This gate
reproduces that: PX1's integer-bits scorer (one shared kernel,
:func:`oc_meta_spark.plans.quality_queries.lm_bits_scores`), then a
per-language exact tertile by rank — bucket =
``(3·(rank−1)) div n_lang`` over (milli_bits asc, doc_id asc), the QT1
integer-rank discipline (never NTILE, whose remainder distribution is
engine-defined).

Sub-2-word documents have no bigrams, hence no score, hence no bucket —
the same unscorable-doc contract as PX1.

Scale shape (100 TB): everything up to the per-doc score is PX1's plan
(vocabulary-sized count joins, narrow maps, one rollup); the tertile
rank is ONE window partitioned by language — partition-parallel (the
MX2/MX4 per-stratum argument; a language is big but bounded, and a
mega-language can be salt-split by the QB1 aggregate-then-refine
pattern since the bucket rule is a pure rank threshold).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oc_meta_spark.plans.quality_queries import PX_SCORING_CTES, lm_bits_scores
from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table


@register(
    "PX2_perplexity_tertile_split",
    f"""
    WITH {PX_SCORING_CTES},
    ranked AS (
      SELECT doc_id, lang, milli_bits,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY milli_bits, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(milli_bits AS BIGINT) AS milli_bits,
           CASE (3 * (r - 1)) // n
                WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM ranked ORDER BY doc_id
    """,
    doc="CCNet head/middle/tail split: per-language exact perplexity tertiles over the shared integer-bits LM scorer — rank-threshold buckets, never engine-defined NTILE.",
)
def px2_perplexity_tertile_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    scored = lm_bits_scores(docs)
    w_r = Window.partitionBy("lang").orderBy("milli_bits", "doc_id")
    w_n = Window.partitionBy("lang")
    ranked = scored.withColumn("r", F.row_number().over(w_r)).withColumn(
        "n", F.count(F.lit(1)).over(w_n)
    )
    return ranked.select(
        "doc_id",
        "lang",
        "milli_bits",
        F.when(F.expr("(3 * (r - 1)) div n") == 0, "head")
        .when(F.expr("(3 * (r - 1)) div n") == 1, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).orderBy("doc_id")
