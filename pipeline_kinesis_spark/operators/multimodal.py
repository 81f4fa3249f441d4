"""Multimodal column plumbing (SURVEY.md §2C C5).

Media (image/audio/video) are opaque ``binary`` payloads + typed metadata
structs. The Spark-side plumbing — schema, partition-aware batch iteration,
Arrow-batched mapInPandas signatures — is real and tested; only the actual
codec decode is stubbed (this container ships no image/audio libs), behind
``NotImplementedError`` with a deterministic fake used by tests.

At 100 TB the pattern is: binary parquet columns, ``mapInPandas`` with
modest ``spark.sql.execution.arrow.maxRecordsPerBatch`` (payloads are big),
and metadata-only predicates pushed to the scan so decode touches only
selected rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pipeline_kinesis_spark.io import load
from pipeline_kinesis_spark.operators import QuerySpec

# Canonical media-row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("n_bytes", LongType(), True),
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def decode_media(payload: bytes, mime: str) -> object:
    """Real codec decode — intentionally stubbed (no PIL/ffmpeg here).

    Cluster deployments plug a decoder in; tests use fake_features().
    """
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "container; use fake_features() for plumbing tests"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: sha256 → FEATURE_DIM floats
    in [0, 1). Keeps the full Arrow/pandas path real and reproducible."""
    h = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over media rows (Arrow-batched).

    Input must have media_id/modality/payload columns. Batch shape: the
    iterator yields pandas frames sized by arrow.maxRecordsPerBatch, so
    executor memory stays bounded no matter the payload size distribution.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": pdf["payload"].map(fake_features),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes +
    metadata struct. Stands in for real image/audio parquet."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "utf-8"))
            .cast("long")
            .alias("n_bytes"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over binary payload sizes — the query
    shape that must NOT decode payloads (column pruning keeps the binary
    column unread)."""
    m = media_from_documents(spark, sf_dir)
    return m.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


MULTIMODAL_META_SQL = """
SELECT
  'text' AS modality,
  count(*) AS n_media,
  sum(CAST(octet_length(encode(text)) AS BIGINT)) AS total_bytes,
  max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full plumbing query: binary payloads → mapInPandas feature
    extraction → per-modality feature norm stats. Rows-only check (the
    fake extractor is engine-local); the Arrow batch path is what's
    exercised."""
    feats = extract_features(media_from_documents(spark, sf_dir))
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.transform("features", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    return feats.select(
        "media_id", "modality", "n_bytes", norm.alias("feat_norm")
    )


QUERIES: dict[str, QuerySpec] = {
    "multimodal_meta_stats": QuerySpec(
        multimodal_meta_stats, MULTIMODAL_META_SQL
    ),
    "multimodal_features": QuerySpec(multimodal_features, None),
}
