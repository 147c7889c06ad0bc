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


@register(
    "M2_video_frame_sampling",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'video/mp4' ELSE 'image/png' END AS mime,
             500 + (doc_id % 7) * 900 AS duration_ms
      FROM documents
    )
    SELECT media_id, mime, CAST(u.ts AS BIGINT) AS sample_ts_ms
    FROM media,
         UNNEST(range(0, CAST(greatest(duration_ms - 1, 0) AS BIGINT) + 1, 1000)) AS u(ts)
    WHERE mime LIKE 'video/%'
    ORDER BY media_id, sample_ts_ms
    """,
    doc="Video frame-sampling fan-out: one row per sampled timestamp via the production frame_sample plan (multimodal plumbing; decode itself is the documented stub).",
)
def m2_video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oc_meta_spark.operators.multimodal import frame_sample

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video/mp4").otherwise("image/png").alias("mime"),
        (500 + (F.col("doc_id") % 7) * 900).cast("long").alias("duration_ms"),
    )
    return (
        frame_sample(media, every_ms=1000)
        .select("media_id", "mime", F.col("sample_ts_ms").cast("bigint").alias("sample_ts_ms"))
        .orderBy("media_id", "sample_ts_ms")
    )
