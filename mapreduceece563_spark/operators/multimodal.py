"""Multimodal-column plumbing: binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extraction
steps are Arrow-batched ``mapInPandas`` stages (the one place Python
is the right tool — per-payload work that built-in expressions can't
express). The codec libraries (Pillow/ffmpeg/...) are NOT in this
container, so the decode step is stubbed behind
``NotImplementedError`` with a deterministic fake for tests — the
Spark-side plumbing (schema, batch iteration, partitioning) is real
and is what this module actually provides.

Scale posture: payload bytes never pass through a shuffle here — all
stages are map-only over the scan; metadata-only plans prune the
payload column entirely (check ReadSchema). Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs never materializes at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_md5", T.StringType(), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> list[int]:
    """Decode an image payload to pixel data.

    Real decoding needs an image codec library that is not available
    in this environment; ``fake=True`` substitutes a deterministic
    4x4 grayscale derived from the payload digest so pipelines can be
    tested end to end."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True"
        )
    digest = hashlib.md5(payload).digest()
    return [b for b in digest]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The pattern to copy for any real extractor: mapInPandas with an
    iterator of batches (constant memory), payload column accessed
    only inside the batch loop, output schema declared up front."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table fabricated from documents: the text
    bytes stand in for an opaque payload (the container has no real
    image/audio fixtures). Gives the multimodal path a real, oracle-
    checkable input."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: attach binary payloads, run the
    Arrow-batched extractor, return per-media features. Oracle-checked
    because the fake payload is derived from text deterministically."""
    return extract_features(documents_as_media(spark, sf_dir)).select(
        F.col("media_id").alias("doc_id"), "n_bytes", "payload_md5"
    )


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""
