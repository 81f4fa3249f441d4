"""Round-12 items: the PackBits cap honored at the final run boundary
(ADVICE r11 #1), the PNG exact-raster stream-integrity probe restored
on top of the inflate-bomb cap (ADVICE r11 #2), and the lock-protected
shuffle-pin helper for streaming gate-row starts (VERDICT r11 "What's
wrong" #3)."""

from __future__ import annotations

import struct
import threading
import zlib

import numpy as np
import pytest

from pipeline_kinesis_spark.operators.multimodal import (
    _decode_png,
    encode_png,
)
from pipeline_kinesis_spark.operators.tiff import _packbits_decode
from pipeline_kinesis_spark.streaming.pinned_start import pinned_shuffle


class TestPackbitsCap:
    def test_final_literal_run_truncated_to_cap(self):
        # one literal run of 100 bytes; max_out=10 must not leak the
        # overshoot (pre-fix this returned all 100 bytes)
        data = bytes([99]) + bytes(range(100))
        assert _packbits_decode(data, max_out=10) == bytes(range(10))

    def test_final_repeat_run_truncated_to_cap(self):
        # repeat run: n=133 -> 257-133 = 124 copies of 0xAB
        data = bytes([133, 0xAB])
        assert _packbits_decode(data, max_out=10) == b"\xab" * 10

    def test_uncapped_and_exact_cap_unchanged(self):
        data = bytes([2]) + b"xyz" + bytes([255, 0x41])
        full = b"xyz" + b"AA"
        assert _packbits_decode(data) == full
        assert _packbits_decode(data, max_out=len(full)) == full


def _flip_idat_tail(png: bytes) -> bytes:
    """Corrupt the LAST byte of the IDAT zlib stream (its adler32
    trailer) in place. Chunk CRCs are not checked by the decoder, so
    no CRC rewrite is needed."""
    pos = 8
    buf = bytearray(png)
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = bytes(buf[pos + 4 : pos + 8])
        if ctype == b"IDAT":
            last = pos + 8 + length - 1
            buf[last] ^= 0xFF
            return bytes(buf)
        pos += 12 + length
    raise AssertionError("no IDAT chunk")


def _png_with_idat(png: bytes, idat: bytes) -> bytes:
    """Rebuild the PNG with a replacement IDAT payload."""
    pos = 8
    out = bytearray(png[:8])
    while pos + 8 <= len(png):
        (length,) = struct.unpack_from(">I", png, pos)
        ctype = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IDAT":
            data = idat
        out += struct.pack(">I", len(data))
        out += ctype + data
        out += struct.pack(">I", zlib.crc32(ctype + data))
    return bytes(out)


class TestPngStreamIntegrity:
    def setup_method(self):
        self.pixels = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        self.png = encode_png(self.pixels)

    def test_valid_png_still_decodes(self):
        rgb = _decode_png(self.png)
        assert np.array_equal(rgb, self.pixels)

    def test_corrupt_adler_rejected(self):
        # pre-fix the capped decompressobj never read the adler32 for
        # exact-raster streams, so this decoded silently
        bad = _flip_idat_tail(self.png)
        with pytest.raises((zlib.error, ValueError)):
            _decode_png(bad)

    def test_oversized_inflate_still_decodes_capped(self):
        # IDAT that inflates past the raster byte count: plain
        # decompress always accepted these (the walk ignores the
        # excess) and the r10 bomb test pins that — the integrity
        # probe must keep the lenient contract without materializing
        # the excess (its adler32 goes unvalidated by design)
        raster = bytearray()
        for y in range(4):
            raster.append(0)  # filter byte
            raster += self.pixels[y].tobytes()
        oversized = zlib.compress(bytes(raster) + b"\x00" * 64)
        out = _decode_png(_png_with_idat(self.png, oversized))
        assert np.array_equal(out, self.pixels)

    def test_truncated_stream_rejected(self):
        raster = bytearray()
        for y in range(4):
            raster.append(0)
            raster += self.pixels[y].tobytes()
        good = zlib.compress(bytes(raster))
        bad = _png_with_idat(self.png, good[:-5])
        with pytest.raises((zlib.error, ValueError)):
            _decode_png(bad)


_KEY = "spark.sql.shuffle.partitions"


@pytest.mark.parametrize("dedup", [True, "10 minutes"])
def test_engine_consume_dedup_redelivery(spark, tmp_path, dedup):
    """consume_begin(dedup=...) collapses wire-level redeliveries —
    the same (shard, seqnum) record arriving again in a later batch
    file — before parse, so the archive and every standing view see
    each record exactly once (B26 over the at-least-once wire,
    pipeline_kinesis.c:744-758). Covers both the exact and the
    watermark-bounded form."""
    import uuid

    from pipeline_kinesis_spark.engine import Engine
    from pipeline_kinesis_spark.sources.file_replay import (
        write_record_file,
    )

    tag = uuid.uuid4().hex[:8]
    root = str(tmp_path)

    def recs(ids, ts="2024-01-01T10:00:00"):
        return [
            {
                "data": f"{i},t{i % 2}",
                "partition_key": "pk",
                "shard_id": "shardId-000000000000",
                "sequence_number": f"{i:056d}",
                "approximate_arrival_timestamp": ts,
            }
            for i in ids
        ]

    # batch 1: records 0-9; batch 2 REDELIVERS 3..6 (same seqnums)
    # plus genuinely-new 10-14
    write_record_file(f"{root}/replay", recs(range(10)))
    eng = Engine(
        spark,
        metadata_dir=f"{root}/meta",
        trigger_interval="50 milliseconds",
        shuffle_partitions=2,
    )
    stream, view = f"ddr_s_{tag}", f"ddr_v_{tag}"
    try:
        eng.add_endpoint(f"ddr_ep_{tag}", url=root)
        eng.create_stream(stream, "event_id BIGINT, event_type STRING")
        eng.create_continuous_view(
            view,
            f"SELECT event_type, count(*) AS n, sum(event_id) AS s "
            f"FROM {stream} GROUP BY event_type",
            stream=stream,
        )
        eng.consume_begin(
            f"ddr_ep_{tag}", "replay", stream, fmt="csv", delimiter=",",
            dedup=dedup,
        )
        eng.wait_for_ingest(timeout_s=120)
        write_record_file(
            f"{root}/replay",
            recs(range(3, 7), ts="2024-01-01T10:01:00")
            + recs(range(10, 15), ts="2024-01-01T10:01:00"),
        )
        eng.wait_for_ingest(timeout_s=120)
        got = {
            r.event_type: (int(r.n), int(r.s))
            for r in eng.view_table(view).collect()
        }
        ids = list(range(15))  # each exactly once
        want = {
            f"t{k}": (
                sum(1 for i in ids if i % 2 == k),
                sum(i for i in ids if i % 2 == k),
            )
            for k in (0, 1)
        }
        assert got == want
        # the durable archive is deduped too
        assert eng.stream_table(stream).count() == 15
    finally:
        eng.consume_end_all()


def test_engine_shuffle_partitions_pin(spark, tmp_path):
    """Engine(shuffle_partitions=N) must start its standing queries at
    width N (state-store layout follows the pipeline's data volume, not
    the session default) and leave the session conf untouched."""
    import glob
    import uuid

    from pipeline_kinesis_spark.engine import Engine
    from pipeline_kinesis_spark.sources.file_replay import (
        write_record_file,
    )

    tag = uuid.uuid4().hex[:8]
    root = str(tmp_path)
    prev = spark.conf.get(_KEY)
    write_record_file(
        f"{root}/replay",
        [
            {
                "data": f"{i},t{i % 3}",
                "partition_key": "pk",
                "shard_id": "shardId-000000000000",
                "sequence_number": f"{i:056d}",
            }
            for i in range(30)
        ],
    )
    eng = Engine(
        spark,
        metadata_dir=f"{root}/meta",
        trigger_interval="50 milliseconds",
        shuffle_partitions=2,
    )
    stream, view = f"esp_s_{tag}", f"esp_v_{tag}"
    try:
        eng.add_endpoint(f"esp_ep_{tag}", url=root)
        eng.create_stream(stream, "event_id BIGINT, event_type STRING")
        eng.create_continuous_view(
            view,
            f"SELECT event_type, count(*) AS n FROM {stream} "
            f"GROUP BY event_type",
            stream=stream,
        )
        cons = eng.consume_begin(
            f"esp_ep_{tag}", "replay", stream, fmt="csv", delimiter=",",
        )
        eng.wait_for_ingest(timeout_s=120)
        assert sum(
            r.n for r in eng.view_table(view).collect()
        ) == 30
        # the aggregation state under the view checkpoint must be laid
        # out at the ENGINE's width, not the session's
        state_parts = glob.glob(
            f"{root}/meta/checkpoints/{cons.id}/view_{view}/state/0/*"
        )
        part_dirs = [p for p in state_parts if p.rsplit("/", 1)[-1].isdigit()]
        assert len(part_dirs) == 2, state_parts
    finally:
        eng.consume_end_all()
    assert spark.conf.get(_KEY) == prev


class TestPinnedShuffle:
    def test_restores_on_error(self, spark):
        # the session conf must come back even when the body (the
        # .start() call in the gate rows) raises
        prev = spark.conf.get(_KEY)
        with pytest.raises(RuntimeError, match="boom"):
            with pinned_shuffle(spark, 4):
                assert spark.conf.get(_KEY) == "4"
                raise RuntimeError("boom")
        assert spark.conf.get(_KEY) == prev

    def test_nominal_pin_and_restore(self, spark):
        prev = spark.conf.get(_KEY)
        with pinned_shuffle(spark, 7):
            assert spark.conf.get(_KEY) == "7"
        assert spark.conf.get(_KEY) == prev

    def test_concurrent_pins_serialize(self, spark):
        # two threads pinning different widths must each observe their
        # own width inside the body (the lock serializes the windows)
        # and leave the session value untouched afterwards
        prev = spark.conf.get(_KEY)
        errors: list[Exception] = []

        def pin(n: int) -> None:
            try:
                for _ in range(20):
                    with pinned_shuffle(spark, n):
                        if spark.conf.get(_KEY) != str(n):
                            raise AssertionError(
                                f"pin {n} observed {spark.conf.get(_KEY)}"
                            )
            except Exception as exc:  # noqa: BLE001 - collected for assert
                errors.append(exc)

        threads = [
            threading.Thread(target=pin, args=(n,)) for n in (3, 5, 9)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert spark.conf.get(_KEY) == prev
