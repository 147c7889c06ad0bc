"""Oracle-gated entry for the media exact-dedup path (multimodal leg of
the dedup family).

The driver's synthetic tables carry no binary column, so a payload with
PLANTED collisions is derived deterministically per document
(``source:n_chars%100`` UTF-8 encoded — low-cardinality, so duplicate
payloads are guaranteed at any SF) and the operator under test is the
REAL media path: JVM-side ``sha2`` over a ``binary`` column
(operators/multimodal.py:100-111), never Python.  DuckDB's ``sha256``
produces the same lowercase hex, making digests oracle-comparable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oc_meta_spark.plans.registry import register
from oc_meta_spark.sources.tables import load_table


@register(
    "M1_media_exact_dedup",
    """
    SELECT sha256(source || ':' || CAST(n_chars % 100 AS VARCHAR)) AS digest,
           MIN(doc_id) AS canonical_media_id,
           COUNT(*) AS n_copies,
           list_aggregate(list_sort(list(doc_id)), 'string_agg', ',') AS media_ids
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY digest
    """,
    doc="Exact media dedup by content digest — JVM sha2 over binary payloads (multimodal dedup leg).",
)
def m1_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.operators.multimodal import exact_dedup_media

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(
            F.concat_ws(":", F.col("source"), (F.col("n_chars") % 100).cast("string")), "UTF-8"
        ).alias("payload"),
    )
    return (
        exact_dedup_media(media)
        .select(
            "digest",
            "canonical_media_id",
            "n_copies",
            F.array_join(F.transform("media_ids", lambda x: x.cast("string")), ",").alias("media_ids"),
        )
        .orderBy("digest")
    )
