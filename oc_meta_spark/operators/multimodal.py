"""Multimodal column plumbing (training-data pipeline extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; all Spark-side plumbing (schema, partition-aware batch iteration,
Arrow batch shapes, output contracts) is real and tested.  The actual codec
work (decode/resize/frame-sample) is stubbed: the decode libraries are not
in this container, so ``decode_fn`` defaults to a clearly-marked
deterministic fake and real deployments inject e.g. PIL/ffmpeg-backed
functions with the same signature.

Pattern notes for 100 TB:
- ``mapInPandas`` streams Arrow record batches — constant memory per task
  regardless of per-file payload count;
- binary payloads are never collected to the driver;
- feature extraction emits fixed-width vectors so downstream similarity
  search reuses the embedding operators unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(payload: bytes, mime: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats derived from the
    payload digest.  Replace with a real codec-backed function in
    production — same signature, same output width.
    """
    if payload is None:
        return [0.0] * 8
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def real_decode(payload: bytes, mime: str) -> list[float]:
    """The production decode hook — requires codec libraries not present in
    this container."""
    raise NotImplementedError(
        "media decode requires image/audio codecs (PIL/ffmpeg); inject a "
        "decode_fn with the same signature"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] = fake_decode,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (Arrow batches).

    The iterator contract keeps one Arrow batch in memory per task; payload
    bytes stay on the executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_fn(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "digest": [
                        hashlib.sha256(p).hexdigest() if p is not None else None for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "payload", "mime").mapInPandas(run, FEATURE_SCHEMA)


def exact_dedup_media(media: DataFrame) -> DataFrame:
    """Exact payload dedup by content digest (JVM-side sha2, no Python)."""
    return (
        media.withColumn("digest", F.sha2(F.col("payload"), 256))
        .groupBy("digest")
        .agg(
            F.min("media_id").alias("canonical_media_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list("media_id")).alias("media_ids"),
        )
        .filter(F.col("n_copies") > 1)
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.

    The *plumbing* (timestamp fan-out, partition shape) is real; frame
    extraction itself is the stubbed decode step.
    """
    return (
        media.filter(F.col("mime").startswith("video/"))
        .withColumn(
            "sample_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "mime", "sample_ts_ms")
    )
