"""Multimodal column plumbing (SURVEY.md §2C C5).

Media (image/audio/video) are opaque ``binary`` payloads + typed metadata
structs. The Spark-side plumbing — schema, partition-aware batch iteration,
Arrow-batched mapInPandas signatures — is real and tested, and
``decode_media`` REALLY decodes the uncompressed containers (PPM P6,
24-bit BMP, PCM16 WAV) in pure numpy/stdlib; only compressed codecs
(JPEG/PNG/MP3/H.264 — no codec libs in this container) stay behind
``NotImplementedError``, with a deterministic fake for their plumbing
tests.

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


def decode_media(payload: bytes, mime: str = "") -> object:
    """Decode uncompressed media containers in pure numpy/stdlib — no
    codec libraries needed: PPM P6 (binary RGB), BMP (24-bit
    uncompressed BI_RGB), WAV (PCM16 RIFF). Dispatch is by magic bytes,
    so the mime hint is advisory. Returns an ``(h, w, 3) uint8`` pixel
    array for images, ``(sample_rate, (n, channels) int16 array)`` for
    audio. Compressed codecs (JPEG/PNG/MP3/H.264) stay environment-gated
    — cluster deployments plug a real decoder into this same dispatch.
    """
    if payload is None:
        raise ValueError("empty payload")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"no pure-numpy decoder for this container (mime={mime!r}); "
        "compressed codecs require libraries not present in this "
        "container — use fake_features() for plumbing tests"
    )


# -- PPM (P6): the simplest interchange image format ------------------------


def _ppm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integer tokens after the
    magic, skipping ``#`` comments; returns (values, offset past the
    single whitespace byte that terminates the header)."""
    vals: list[int] = []
    i = 2  # past the 2-byte magic
    cur = b""
    while len(vals) < n:
        c = buf[i : i + 1]
        if not c:
            raise ValueError("truncated PPM header")
        if c == b"#":  # comment to end of line
            while buf[i : i + 1] not in (b"\n", b""):
                i += 1
        elif c in b" \t\r\n":
            if cur:
                vals.append(int(cur))
                cur = b""
        else:
            cur += c
        i += 1
    return vals, i


def _decode_ppm(payload: bytes) -> "np.ndarray":
    import numpy as np

    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    need = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return raster.reshape(h, w, 3)


def encode_ppm(pixels) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6). Fixture/export helper."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


# -- BMP: 24-bit uncompressed BI_RGB ----------------------------------------


def _decode_bmp(payload: bytes) -> "np.ndarray":
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BI_RGB BMP supported "
            f"(bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]  # stored bottom-up
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    import struct

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    body = raster.tobytes()
    off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


# -- WAV: PCM16 RIFF --------------------------------------------------------


def _decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    import struct

    import numpy as np

    pos, rate, channels, bits = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", payload, pos)
            bits = struct.unpack_from("<H", payload, pos + 14)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 WAV supported (fmt={fmt}, bits={bits})"
                )
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            samples = np.frombuffer(
                payload, dtype="<i2", count=size // 2, offset=pos
            ).reshape(-1, channels)
            return rate, samples
        pos += size + (size & 1)  # chunks pad to even length
    raise ValueError("no data chunk in WAV payload")


def encode_wav(rate: int, samples) -> bytes:
    """(n, channels) int16 → PCM16 RIFF/WAVE."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    channels = a.shape[1]
    body = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    chunks = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks) - 4) + chunks


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


PIXEL_STATS_SCHEMA = (
    "media_id BIGINT, width BIGINT, height BIGINT, "
    "mean_px DOUBLE, min_px BIGINT, max_px BIGINT"
)


def decode_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL-decode path over image payloads (PPM/BMP): Arrow-batched
    mapInPandas decoding each payload to pixels and emitting per-image
    statistics — the shape every image-quality/dedup filter at 100 TB
    takes (decode confined to executor-side batches, stats columns out).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_media(bytes(payload))
                recs.append(
                    (
                        mid,
                        px.shape[1],
                        px.shape[0],
                        float(px.mean()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "mean_px",
                    "min_px",
                    "max_px",
                ],
            )

    return df.mapInPandas(run, PIXEL_STATS_SCHEMA)


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
