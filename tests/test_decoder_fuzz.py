"""Foreign-file decode containment: distilled fuzz regressions.

tools/fuzz_decoders.py found ~1,250 contract escapes (struct.error,
zlib.error, IndexError, KeyError, StopIteration leaking from mutated
or truncated payloads) before the operators/decode_guard.py boundary
landed. This test pins the contract deterministically: every decoder
either returns a result or raises ValueError/NotImplementedError —
nothing else — for a fixed mutation corpus per codec, plus explicit
cases for each escape class the finder hit and for forged header
dimensions that would otherwise size an executor-killing allocation.
"""

from __future__ import annotations

import importlib.util
import pathlib
import struct
import zlib

import numpy as np
import pytest

from pipeline_kinesis_spark.operators.decode_guard import MAX_DECODE_ELEMS
from pipeline_kinesis_spark.operators.multimodal import decode_media

_TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"
_spec = importlib.util.spec_from_file_location(
    "fuzz_decoders", _TOOLS / "fuzz_decoders.py"
)
fuzz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fuzz)

ACCEPTABLE = (ValueError, NotImplementedError)
N_CASES = 120  # per codec; the offline finder runs thousands


@pytest.fixture(scope="module")
def seeds():
    return fuzz.build_seeds(np.random.default_rng(9))


@pytest.mark.parametrize(
    "codec",
    ["ppm", "bmp", "png", "gif", "jpeg", "wav", "flac", "tiff", "avi"],
)
def test_mutation_corpus_honors_decode_contract(codec, seeds):
    # fuzz._codec_key, not hash(): built-in hash is salted per process
    # (PYTHONHASHSEED), which made this corpus silently differ per run
    rng = np.random.default_rng([9, fuzz._codec_key(codec)])
    for i in range(N_CASES):
        payload = fuzz.make_case(codec, seeds[codec], rng)
        try:
            decode_media(payload)
        except ACCEPTABLE:
            pass
        # anything else propagates and fails the test with the real
        # exception + case index in the traceback


def _png_chunk(t: bytes, d: bytes) -> bytes:
    return struct.pack(">I", len(d)) + t + d + struct.pack(
        ">I", zlib.crc32(t + d)
    )


def test_forged_png_dims_rejected_before_allocation():
    ihdr = struct.pack(">IIBBBBB", 100000, 100000, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\0" * 64))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="claims .* elements"):
        decode_media(png)
    assert 100000 * 100000 * 4 > MAX_DECODE_ELEMS  # the case is real


def test_forged_gif_dims_rejected():
    # logical screen + image descriptor claiming 65535x65535
    gif = bytearray(fuzz.build_seeds(np.random.default_rng(9))["gif"][0])
    i = 13 + 768  # header + 256-entry GCT → image separator
    assert gif[i] == 0x2C
    gif[i + 5 : i + 9] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError):
        decode_media(bytes(gif))


def test_forged_gif_lzw_min_code_rejected_before_allocation():
    # r10 budget fuzz (seed 100815): a mutated LZW minimum-code-size
    # byte (0x87) sized the base string table as 2**min_code entries →
    # MemoryError escaped the decode contract. The spec bounds root
    # codes at 2..8 bits (12-bit total cap); the decoder must reject
    # the byte BEFORE allocating.
    gif = bytearray(fuzz.build_seeds(np.random.default_rng(9))["gif"][0])
    i = 13 + 768  # header + 256-entry GCT → image separator
    assert gif[i] == 0x2C and gif[i + 10] == 8  # LZW min-code byte
    for forged in (0x87, 0xFF, 0x0C, 0x00):
        gif[i + 10] = forged
        with pytest.raises(ValueError, match="minimum code size"):
            decode_media(bytes(gif))


def test_forged_tiff_ifd_count_rejected_before_allocation():
    # r10 budget fuzz (seed 100815): a mutated IFD entry count
    # (0x2ba90000 on a rational-typed tag) sized a placeholder list of
    # count elements → MemoryError. An entry's value bytes must fit
    # inside the payload.
    from pipeline_kinesis_spark.operators.tiff import encode_tiff

    px = np.full((4, 4, 3), 7, np.uint8)
    enc = bytearray(encode_tiff(px))
    (ifd_off,) = struct.unpack_from("<I", enc, 4)
    (n_entries,) = struct.unpack_from("<H", enc, ifd_off)
    # forge every entry's count in turn; all must reject, none allocate
    for k in range(n_entries):
        forged = bytearray(enc)
        struct.pack_into("<I", forged, ifd_off + 2 + 12 * k + 4, 0x2BA90000)
        with pytest.raises(ValueError):
            decode_media(bytes(forged))


def test_truncated_tiff_ifd_value_is_valueerror():
    # IFD entry whose value offset points past the payload: the raw
    # struct.error must surface as ValueError (decode_guard boundary)
    from pipeline_kinesis_spark.operators.tiff import decode_tiff

    px = np.full((4, 4, 3), 7, np.uint8)
    from pipeline_kinesis_spark.operators.tiff import encode_tiff

    enc = encode_tiff(px)
    with pytest.raises(ValueError):
        decode_tiff(enc[: len(enc) - 9])


def test_zlib_damage_in_png_is_valueerror():
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    from pipeline_kinesis_spark.operators.multimodal import encode_png

    enc = bytearray(encode_png(px))
    i = enc.index(b"IDAT") + 12
    enc[i] ^= 0xFF
    with pytest.raises(ValueError):
        decode_media(bytes(enc))


def test_contract_exceptions_pass_through_unwrapped():
    # the guard must not swallow the contract itself: unsupported
    # feature messages keep their original NotImplementedError type
    px = np.full((2, 2, 3), 5, np.uint8)
    from pipeline_kinesis_spark.operators.avi import (
        decode_avi,
        encode_avi_mjpeg,
    )

    enc = bytearray(encode_avi_mjpeg(2.0, np.stack([px])))
    i = enc.find(b"vids")
    enc[i + 4 : i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi(bytes(enc))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
