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
  CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
  max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full plumbing query: binary payloads → mapInPandas feature
    extraction → per-row feature norm. The deterministic stand-in
    extractor (sha256 → 16 dyadic floats) is reproducible in DuckDB
    (sha256 + hex cast), so the ENTIRE Arrow batch path — binary column
    in, Python worker, Arrow back — is oracle-checked end to end; both
    engines sum squares in the same ascending order, so the IEEE result
    is bit-identical."""
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


def _features_sql() -> str:
    feats = ",\n         ".join(
        f"CAST(concat('0x', substr(h, {4 * i + 1}, 4)) AS INTEGER)"
        f" / 65536.0 AS f{i}"
        for i in range(FEATURE_DIM)
    )
    sq_sum = " + ".join(f"f{i}*f{i}" for i in range(FEATURE_DIM))
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, 'text' AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS h  -- VARCHAR overload hashes the UTF-8 bytes
  FROM documents
), f AS (
  SELECT media_id, modality, n_bytes,
         {feats}
  FROM m
)
SELECT media_id, modality, n_bytes,
       round(sqrt({sq_sum}), 6) AS feat_norm
FROM f
"""


MULTIMODAL_FEATURES_SQL = _features_sql()


def mixed_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized mixed-modality media: documents cycled through
    image/audio/video with deterministic column-arithmetic metadata, so
    downstream operators have an oracle-expressible input."""
    d = load(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    is_image = F.col("doc_id") % 3 == 0
    is_video = F.col("doc_id") % 3 == 2
    return d.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.concat(F.lit("x/"), modality).alias("mime"),
            F.octet_length(F.encode("text", "utf-8"))
            .cast("long")
            .alias("n_bytes"),
            F.when(is_image, 64 + (F.col("n_chars") % 8) * 16)
            .cast("long")
            .alias("width"),
            F.when(is_image, 64 + (F.col("n_chars") % 6) * 16)
            .cast("long")
            .alias("height"),
            F.when(is_video, (F.col("n_chars") % 7 + 1) * 900)
            .cast("long")
            .alias("duration_ms"),
        ).alias("meta"),
    )


RESIZE_W, RESIZE_H = 224, 224


def resize_images(df: DataFrame) -> DataFrame:
    """Image resize plumbing via mapInPandas: Arrow-batched rows in, rows
    with target dimensions out. The pixel transform itself is the stubbed
    decode step (decode_media) — payload passes through; everything
    Spark-side (schema, pruning, batch shape) is the production path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": RESIZE_W,
                    "out_h": RESIZE_H,
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                }
            )

    return df.mapInPandas(
        run, "media_id BIGINT, out_w BIGINT, out_h BIGINT, n_bytes BIGINT"
    )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every image to 224×224 (C5 resize surface)."""
    m = mixed_media_table(spark, sf_dir).filter(
        F.col("modality") == "image"
    )
    return resize_images(m.select("media_id", "payload"))


MULTIMODAL_RESIZE_SQL = """
SELECT
  doc_id AS media_id,
  CAST(224 AS BIGINT) AS out_w,
  CAST(224 AS BIGINT) AS out_h,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id % 3 = 0
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (C5): one row per sampled frame per video — a pure
    JVM explode over the duration metadata (sequence + explode), so frame
    fan-out never touches Python; the frame DECODE would hang off each
    row via extract_features/decode_media on a real cluster."""
    step = 1000
    v = mixed_media_table(spark, sf_dir).filter(
        F.col("modality") == "video"
    )
    return (
        v.select(
            "media_id",
            F.col("meta.duration_ms").alias("duration_ms"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.col("meta.duration_ms") / step).cast("long"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "duration_ms",
            "frame_idx",
            (F.col("frame_idx") * step).alias("frame_ts_ms"),
        )
    )


MULTIMODAL_FRAME_SAMPLE_SQL = """
SELECT
  doc_id AS media_id,
  CAST((n_chars % 7 + 1) * 900 AS BIGINT) AS duration_ms,
  CAST(unnest(range(0, (n_chars % 7 + 1) * 900 // 1000 + 1)) AS BIGINT)
    AS frame_idx,
  CAST(unnest(range(0, (n_chars % 7 + 1) * 900 // 1000 + 1)) * 1000
    AS BIGINT) AS frame_ts_ms
FROM documents
WHERE doc_id % 3 = 2
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_meta_stats": QuerySpec(
        multimodal_meta_stats, MULTIMODAL_META_SQL
    ),
    "multimodal_features": QuerySpec(
        multimodal_features, MULTIMODAL_FEATURES_SQL
    ),
    "multimodal_resize": QuerySpec(multimodal_resize, MULTIMODAL_RESIZE_SQL),
    "multimodal_frame_sample": QuerySpec(
        multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL
    ),
}
