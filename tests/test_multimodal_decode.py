"""Pure-numpy media decode (C5): PPM/BMP/WAV round-trips with planted
pixel/sample statistics, plus the real-decode path through Spark's
Arrow-batched mapInPandas plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_kinesis_spark.operators.multimodal import (
    decode_media,
    decode_pixel_stats,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def _gradient(h, w):
    """Deterministic (h, w, 3) gradient with known statistics."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def test_ppm_round_trip_and_header_comments():
    px = _gradient(13, 17)
    assert (decode_media(encode_ppm(px)) == px).all()
    # comments and arbitrary whitespace in the header must parse
    body = encode_ppm(px)
    hacked = b"P6 # comment\n# full line comment\n 17\t13 # dims\n255\n"
    hacked += body[body.index(b"255\n") + 4 :]
    assert (decode_media(hacked) == px).all()


def test_bmp_round_trip_odd_width_padding_and_orientation():
    # odd width exercises the 4-byte row padding; asymmetric corner
    # pixels prove the bottom-up flip and BGR→RGB swap are right
    px = _gradient(5, 7)
    px[0, 0] = [255, 0, 0]  # top-left pure red
    px[4, 6] = [0, 0, 255]  # bottom-right pure blue
    got = decode_media(encode_bmp(px))
    assert got.shape == (5, 7, 3)
    assert (got == px).all()
    assert list(got[0, 0]) == [255, 0, 0]
    assert list(got[4, 6]) == [0, 0, 255]


def test_wav_round_trip_stereo_pcm16():
    t = np.arange(800)
    samples = np.stack(
        [
            (10_000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16),
            (5_000 * np.cos(2 * np.pi * 220 * t / 8000)).astype(np.int16),
        ],
        axis=1,
    )
    rate, got = decode_media(encode_wav(8000, samples))
    assert rate == 8000
    assert got.shape == (800, 2)
    assert (got == samples).all()


def test_compressed_codecs_stay_gated():
    with pytest.raises(NotImplementedError, match="decoder"):
        decode_media(b"\x89PNG\r\n\x1a\n....", "image/png")
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        # BMP container but 32-bit: unsupported variant must not
        # silently misdecode
        bad = bytearray(encode_bmp(_gradient(2, 2)))
        bad[28] = 32
        decode_media(bytes(bad))


def test_codec_round_trips_property():
    """Property check across dimensions/content: encode→decode is the
    identity for every supported container, including widths that hit
    each BMP padding residue and odd/even WAV chunk lengths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 13),
        seed=st.integers(0, 2**31 - 1),
    )
    def image_rt(h, w, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_media(encode_ppm(px)) == px).all()
        assert (decode_media(encode_bmp(px)) == px).all()

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(1, 300),
        ch=st.integers(1, 2),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_rt(n, ch, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
        rate, got = decode_media(encode_wav(16000, s))
        assert rate == 16000 and (got == s).all()

    image_rt()
    wav_rt()


def test_decode_pixel_stats_through_spark_plumbing(spark):
    """Planted solid-color images of known mean: the REAL decode runs
    inside Arrow-batched mapInPandas and the per-image statistics come
    back exact — the full binary-column → executor decode → stats path,
    mixing PPM and BMP containers in one column."""
    rows = []
    for i in range(8):
        level = 30 * i  # mean_px == level exactly for a solid image
        px = np.full((6, 4, 3), level, dtype=np.uint8)
        payload = encode_ppm(px) if i % 2 == 0 else encode_bmp(px)
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r.media_id: r for r in decode_pixel_stats(df).collect()}
    assert len(got) == 8
    for i in range(8):
        r = got[i]
        assert (r.width, r.height) == (4, 6)
        assert r.mean_px == float(30 * i)
        assert r.min_px == r.max_px == 30 * i
