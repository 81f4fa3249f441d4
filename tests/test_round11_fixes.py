"""Round-11 items: B25 event-time watermark views (VERDICT r10 "Next
round" #2) and the no-hardlink attained-pin fallback (r10 "What's
wrong" #1)."""

from __future__ import annotations

import uuid

import pytest

from pipeline_kinesis_spark.engine import Engine
from pipeline_kinesis_spark.sources.file_replay import write_record_file


def _rec(data: str, seq: int) -> dict:
    # one shard: per-shard sequence order is a total order, so the
    # watermark-advancing sentinel (highest seq) is consumed last
    return {
        "data": data,
        "partition_key": "pk",
        "shard_id": "shardId-000000000000",
        "sequence_number": f"{seq:056d}",
    }


def test_watermark_view_drops_late_rows(spark, tmp_path):
    """A continuous view created with watermark_column/delay must drop
    rows arriving behind the watermark and never reopen finalized
    windows — the engine-level twin of the streaming_watermark_drop
    gate row."""
    tag = uuid.uuid4().hex[:8]
    root = str(tmp_path)
    stream, view = f"wmv_s_{tag}", f"wmv_v_{tag}"
    # batch 1: two on-time rows in the [10:00,10:30) window, then the
    # sentinel at 23:00 that advances the watermark to 22:50
    write_record_file(
        f"{root}/replay",
        [
            _rec("1,a,2024-01-01T10:05:00", 1),
            _rec("2,a,2024-01-01T10:20:00", 2),
            _rec("0,__advance__,2024-01-01T23:00:00", 10**9),
        ],
    )
    eng = Engine(
        spark,
        metadata_dir=f"{root}/meta",
        trigger_interval="50 milliseconds",
    )
    try:
        eng.add_endpoint(f"wmv_ep_{tag}", url=root)
        eng.create_stream(
            stream,
            "event_id BIGINT, event_type STRING, event_time TIMESTAMP",
        )
        # the sentinel must flow THROUGH the aggregation (Catalyst
        # pushes a WHERE below the watermark node, so a filtered
        # sentinel would never advance event time); it is excluded at
        # read time instead
        eng.create_continuous_view(
            view,
            f"SELECT window(event_time, '30 minutes').start AS ws, "
            f"event_type, count(*) AS n FROM {stream} "
            f"GROUP BY window(event_time, '30 minutes'), event_type",
            stream=stream,
            output_mode="append",
            watermark_column="event_time",
            watermark_delay_seconds=600,
        )
        eng.consume_begin(
            f"wmv_ep_{tag}", "replay", stream, fmt="csv", delimiter=",",
        )
        eng.wait_for_ingest(timeout_s=120)
        # batch 2: a LATE row in the already-finalized window — must be
        # dropped, not merged into a reopened window
        write_record_file(
            f"{root}/replay",
            [_rec("3,a,2024-01-01T10:10:00", 10**12)],
        )
        eng.wait_for_ingest(timeout_s=120)
        rows = {
            (r.ws.isoformat(), r.event_type, int(r.n))
            for r in eng.view_table(view)
            .filter("event_type <> '__advance__'")
            .collect()
        }
        assert ("2024-01-01T10:00:00", "a", 2) in rows
        assert ("2024-01-01T10:00:00", "a", 3) not in rows
    finally:
        eng.consume_end_all()


def test_watermark_view_durable_upsert(spark, tmp_path):
    """The production shape: watermark + update-mode parquet_upsert.
    Late rows are dropped at the watermark BEFORE the merge, finalized
    window rows persist in the store, and aggregation state evicts
    behind the watermark instead of growing with runtime."""
    tag = uuid.uuid4().hex[:8]
    root = str(tmp_path)
    stream, view = f"wmd_s_{tag}", f"wmd_v_{tag}"
    write_record_file(
        f"{root}/replay",
        [
            _rec("1,a,2024-01-01T10:05:00", 1),
            _rec("2,a,2024-01-01T10:20:00", 2),
            _rec("0,__advance__,2024-01-01T23:00:00", 10**9),
        ],
    )
    eng = Engine(
        spark,
        metadata_dir=f"{root}/meta",
        trigger_interval="50 milliseconds",
    )
    try:
        eng.add_endpoint(f"wmd_ep_{tag}", url=root)
        eng.create_stream(
            stream,
            "event_id BIGINT, event_type STRING, event_time TIMESTAMP",
        )
        eng.create_continuous_view(
            view,
            f"SELECT window(event_time, '30 minutes').start AS ws, "
            f"event_type, count(*) AS n FROM {stream} "
            f"GROUP BY window(event_time, '30 minutes'), event_type",
            stream=stream,
            output_mode="update",
            materialize="parquet_upsert",
            key_cols=["ws", "event_type"],
            watermark_column="event_time",
            watermark_delay_seconds=600,
        )
        eng.consume_begin(
            f"wmd_ep_{tag}", "replay", stream, fmt="csv", delimiter=",",
        )
        eng.wait_for_ingest(timeout_s=120)
        write_record_file(
            f"{root}/replay",
            [_rec("3,a,2024-01-01T10:10:00", 10**12)],
        )
        eng.wait_for_ingest(timeout_s=120)
        rows = {
            (r.ws.isoformat(), r.event_type, int(r.n))
            for r in eng.view_table(view)
            .filter("event_type <> '__advance__'")
            .collect()
        }
        # the durable store holds the finalized window; the late row
        # never reopened it
        assert rows == {("2024-01-01T10:00:00", "a", 2)}
    finally:
        eng.consume_end_all()


def test_watermark_view_validation(spark, tmp_path):
    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    eng.create_stream("wmval_s", "k STRING, ts TIMESTAMP")
    with pytest.raises(ValueError, match="go together"):
        eng.create_continuous_view(
            "wmval_v1",
            "SELECT k, count(*) AS n FROM wmval_s GROUP BY k",
            stream="wmval_s",
            watermark_column="ts",
        )
    with pytest.raises(ValueError, match="complete mode never drops"):
        eng.create_continuous_view(
            "wmval_v2",
            "SELECT k, count(*) AS n FROM wmval_s GROUP BY k",
            stream="wmval_s",
            watermark_column="ts",
            watermark_delay_seconds=60,
        )
    with pytest.raises(ValueError, match="manage their own watermark"):
        eng.create_continuous_view(
            "wmval_v3",
            "SELECT k, count(*) AS n FROM wmval_s GROUP BY k",
            stream="wmval_s",
            output_mode="update",
            sw_seconds=3600,
            watermark_column="ts",
            watermark_delay_seconds=60,
        )


@pytest.mark.parametrize(
    "fmt,delim,quote,escape",
    [
        ("csv", ",", '"', '"'),     # quote == escape (RFC-4180 style)
        ("csv", "|", "'", "\\"),
        ("csv", "\x01", "`", "^"),  # control-byte delimiter
        ("text", "\t", None, None),
        ("json", ",", None, None),
    ],
)
def test_parse_records_option_matrix_containment(
    spark, fmt, delim, quote, escape
):
    """Distilled from tools/fuzz_parse.py (VERDICT r10 #6): across the
    COPY-option matrix, every adversarial payload either parses or
    quarantines — the action never throws and no row vanishes."""
    from pipeline_kinesis_spark.ingest.parse import (
        parse_records,
        split_quarantine,
    )
    from pipeline_kinesis_spark.sources.records import RECORD_SCHEMA

    q = quote or '"'
    hostile = [
        "plain,line,1",
        f"a{delim}b{delim}c",
        f"a{delim}{q}unbalanced",
        f"{q}x{delim}y{q}{delim}2",           # delimiter inside quotes
        "",                                    # empty payload
        delim * 5,                             # only delimiters
        "\x00\xff\x7f",                        # control/high bytes
        f"too{delim}many{delim}fields{delim}x{delim}y",
        '{"a": "v"',                           # truncated JSON
        "[" * 40,                              # deep JSON nesting
        "a" * 5000,                            # long single field
    ]
    records = spark.createDataFrame(
        [(ln, f"{i:04d}", "pk", None, "shardId-0")
         for i, ln in enumerate(hostile)],
        RECORD_SCHEMA,
    )
    parsed = parse_records(
        records, "a STRING, b STRING, c BIGINT",
        fmt=fmt, delimiter=delim, quote=quote, escape=escape,
    )
    good, bad = split_quarantine(parsed)
    assert good.count() + bad.count() == len(hostile)


def test_avi_truncation_exhaustive_containment():
    """VERDICT r10 "next round" #6: the RIFF container walk under
    TRUNCATION, systematically — decode_media of a valid MJPEG AVI cut
    at EVERY byte boundary must either succeed (enough frames survive)
    or raise the ValueError/NotImplementedError contract; any
    mechanical exception (struct.error, IndexError, ZeroDivisionError)
    escaping means an executor-task crash instead of a dead-letter."""
    import numpy as np

    from pipeline_kinesis_spark.operators.avi import encode_avi_mjpeg
    from pipeline_kinesis_spark.operators.multimodal import decode_media

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    avi = encode_avi_mjpeg(5.0, np.stack([px, 255 - px]))
    outcomes = {"ok": 0, "contract": 0}
    for cut in range(len(avi)):
        try:
            decode_media(avi[:cut], "video/avi")
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["contract"] += 1
        # anything else propagates and fails the test
    # sanity: both outcomes occur (full-file prefix decodes near the
    # end; early cuts are contract errors)
    assert outcomes["contract"] > 0
    assert decode_media(avi, "video/avi")[1].shape[0] == 2


def test_png_deflate_bomb_capped():
    """A PNG declaring tiny dims whose IDAT inflates far past the
    raster must not materialize the expansion: decode is capped at the
    pass-walk byte count and still yields the declared image."""
    import struct
    import zlib

    import numpy as np

    from pipeline_kinesis_spark.operators.multimodal import decode_media

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    w = h = 4
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # raster needs h*(1+w*3) = 52 bytes; append a 64 MB zero bomb
    raster = b"\x00" + b"\x10" * (w * 3)
    bomb = zlib.compress(raster * h + b"\x00" * (64 << 20), 9)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    px = decode_media(png, "image/png")
    assert px.shape == (h, w, 3)
    assert int(px[0, 0, 0]) == 0x10


def test_tiff_decompression_bombs_capped():
    """TIFF deflate/LZW/PackBits strips are capped at the strip's row
    span — a strip inflating to gigabytes never materializes. The
    legit round-trips must be byte-identical with the caps in place."""
    import numpy as np

    from pipeline_kinesis_spark.operators.multimodal import decode_media
    from pipeline_kinesis_spark.operators.tiff import (
        _lzw_decode,
        _lzw_encode,
        _packbits_decode,
        _packbits_encode,
        encode_tiff,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    for comp in ("lzw", "packbits", "deflate"):
        assert np.array_equal(
            decode_media(encode_tiff(px, compression=comp), "image/tiff"),
            px,
        ), comp
    # the caps themselves
    payload = b"abc" * 1000
    assert _lzw_decode(_lzw_encode(payload), max_out=10) == payload[:10]
    assert (
        _packbits_decode(_packbits_encode(payload), max_out=10)
        == payload[:10]
    )


def test_wav_ima_forged_spb_rejected():
    """ADVICE r10 #4: the IMA ADPCM vectorized decoder allocates
    (blocks, channels, spb) int64 BEFORE per-block validation — a
    forged wSamplesPerBlock must be rejected at the fmt chunk (the
    TIFF value-overruns-payload pattern), never sized into an
    allocation (65535 ch x 65535 spb would be 34 GB from ~256 KB)."""
    import struct

    import numpy as np

    from pipeline_kinesis_spark.operators.multimodal import (
        decode_media,
        encode_wav_ima,
    )

    a = ((np.arange(2048) * 37) % 251 - 125).astype(np.int16)
    wav = bytearray(encode_wav_ima(16000, a))
    # sanity: the legit file round-trips (spb == block capacity)
    rate, samples = decode_media(bytes(wav), "audio/wav")
    assert rate == 16000 and len(samples) == 2048
    # fmt chunk data starts at 20; wSamplesPerBlock is its bytes 18-19
    forged = bytearray(wav)
    struct.pack_into("<H", forged, 38, 65535)
    with pytest.raises(ValueError, match="overruns block capacity"):
        decode_media(bytes(forged), "audio/wav")
    # forged block_align of 0 (bytes 12-13 of the fmt data): must be a
    # contained ValueError, not a ZeroDivisionError task crash
    forged2 = bytearray(wav)
    struct.pack_into("<H", forged2, 32, 0)
    with pytest.raises(ValueError, match="cannot hold"):
        decode_media(bytes(forged2), "audio/wav")


def test_default_driver_mem_derives_from_host(monkeypatch):
    """ADVICE r10 #2: the driver-heap default scales with host RAM
    (floor 2g, cap 48g) instead of assuming one target box; the env
    override wins."""
    from pipeline_kinesis_spark import session as S

    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "5g")
    assert S._default_driver_mem() == "5g"
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM")
    v = S._default_driver_mem()
    assert v.endswith("g") and 2 <= int(v[:-1]) <= 48


def test_ivf_train_cap_resolves_at_call_time(spark, sf_dir, monkeypatch):
    """ADVICE r10 #1: monkeypatching IVF_TRAIN_CAP must actually engage
    the sampled-training path — the cap is resolved from the module
    global at call time, never bound as a definition-time default."""
    import pipeline_kinesis_spark.operators.similarity as S
    from pipeline_kinesis_spark.io import load
    from pyspark.sql import functions as F

    fe = S._with_dvec(load(spark, sf_dir, "embeddings")).withColumn(
        "fvec", F.col("dvec")
    )
    n = fe.count()
    assert n > 64
    monkeypatch.setattr(S, "IVF_TRAIN_CAP", 64)
    assert S._ivf_train_df(fe, n).count() == 64
    monkeypatch.setattr(S, "IVF_TRAIN_CAP", n + 1)
    assert S._ivf_train_df(fe, n).count() == n


def test_sqlapi_watermark_options(spark, tmp_path):
    """WITH (watermark='10 minutes', watermark_column='ts',
    output_mode='append') reaches create_continuous_view."""
    from pipeline_kinesis_spark.sqlapi import execute

    eng = Engine(spark, metadata_dir=str(tmp_path / "meta"))
    execute(eng, "CREATE STREAM wmsql_s (k text, ts timestamp)")
    execute(
        eng,
        "CREATE CONTINUOUS VIEW wmsql_v WITH (watermark='10 minutes', "
        "watermark_column='ts', output_mode='append') AS "
        "SELECT window(ts, '30 minutes').start AS ws, count(*) AS n "
        "FROM wmsql_s GROUP BY window(ts, '30 minutes')",
    )
    vd = eng.catalog.state.views["wmsql_v"]
    assert vd["watermark_column"] == "ts"
    assert vd["watermark_delay_seconds"] == 600
    assert vd["output_mode"] == "append"
