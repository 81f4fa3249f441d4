"""TIFF codec (C5 images): bit-exact round-trips across the baseline
matrix — compression (none/PackBits/LZW/Deflate) × predictor ×
byte order × photometric (RGB/gray/WhiteIsZero/palette) — plus the
TIFF-LZW early-change boundary and the magic-byte dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_kinesis_spark.operators.multimodal import decode_media
from pipeline_kinesis_spark.operators.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def _gray(h, w):
    return np.repeat(_gradient(h, w)[:, :, :1], 3, axis=2)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("pred", [1, 2])
def test_rgb_round_trip_all_compressions(comp, pred):
    px = _gradient(13, 17)  # odd dims: strip tails + row boundaries
    enc = encode_tiff(px, compression=comp, predictor=pred, rows_per_strip=5)
    assert np.array_equal(decode_tiff(enc), px)


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_both_byte_orders(bo):
    px = _gradient(9, 31)
    enc = encode_tiff(px, compression="lzw", byte_order=bo)
    assert np.array_equal(decode_tiff(enc), px)


@pytest.mark.parametrize("photo", ["gray", "gray_inverted"])
def test_grayscale_photometrics(photo):
    px = _gray(11, 7)
    enc = encode_tiff(px, compression="packbits", photometric=photo)
    assert np.array_equal(decode_tiff(enc), px)


def test_palette_photometric():
    px = np.repeat((_gradient(16, 16)[:, :, :1] // 16 * 16), 3, axis=2)
    enc = encode_tiff(px, compression="deflate", photometric="palette")
    assert np.array_equal(decode_tiff(enc), px)


def test_palette_rejects_too_many_colors():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="256 colors"):
        encode_tiff(px, photometric="palette")


def test_random_noise_survives_lzw_table_reset():
    # >4093 incompressible-table entries forces the mid-stream Clear
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(120, 200, 3)).astype(np.uint8)
    enc = encode_tiff(px, compression="lzw")
    assert np.array_equal(decode_tiff(enc), px)


def test_lzw_early_change_boundary_lengths():
    # the flush-lands-on-width-threshold case: sweep lengths around the
    # 9→10 bit boundary (253 emitted codes) with incompressible data
    rng = np.random.default_rng(6)
    for n in range(240, 280):
        data = bytes(rng.integers(0, 256, size=n).astype(np.uint8))
        assert _lzw_decode(_lzw_encode(data)) == data, n


def test_packbits_runs_and_literals():
    cases = [
        b"",
        b"\x00" * 400,  # long runs split at 128
        bytes(range(256)),  # pure literal, split at 128
        b"aaabccccddddddeffg" * 9,
    ]
    for data in cases:
        assert _packbits_decode(_packbits_encode(data)) == data


def test_multi_strip_assembly():
    px = _gradient(37, 5)
    enc = encode_tiff(px, compression="none", rows_per_strip=4)
    assert np.array_equal(decode_tiff(enc), px)


def test_dispatch_by_magic_bytes():
    px = _gradient(6, 4)
    for bo in ("II", "MM"):
        assert np.array_equal(
            decode_media(encode_tiff(px, byte_order=bo)), px
        )


def test_not_tiff_rejected():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"ABCD1234")


def test_truncated_payload_rejected():
    px = _gradient(8, 8)
    enc = encode_tiff(px, compression="none")
    # the IFD sits at the end; chopping the payload must fail loudly
    # with a truncation error, not an arbitrary parse exception
    for cut in (10, 40, len(enc) - 8):
        with pytest.raises(ValueError, match="truncated TIFF"):
            decode_tiff(enc[:cut])


def test_short_strip_data_rejected():
    px = _gradient(8, 8)
    enc = bytearray(encode_tiff(px, compression="none"))
    # shrink the declared strip byte count (tag 279) so assembled rows
    # run short of h*row_bytes
    import struct

    (ifd_off,) = struct.unpack_from("<I", enc, 4)
    (n,) = struct.unpack_from("<H", enc, ifd_off)
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", enc, off)
        if tag == 279 and cnt == 1:
            struct.pack_into("<I", enc, off + 8, 16)  # was h*w*3
    with pytest.raises(ValueError, match="truncated TIFF strip data"):
        decode_tiff(bytes(enc))


def test_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=40),
        w=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31),
        comp=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
        pred=st.sampled_from([1, 2]),
        bo=st.sampled_from(["II", "MM"]),
        rps=st.integers(min_value=1, max_value=41),
    )
    def check(h, w, seed, comp, pred, bo, rps):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        enc = encode_tiff(
            px,
            compression=comp,
            predictor=pred,
            byte_order=bo,
            rows_per_strip=rps,
        )
        assert np.array_equal(decode_tiff(enc), px)

    check()
