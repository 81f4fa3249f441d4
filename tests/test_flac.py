"""FLAC codec (C5 audio): bit-exact lossless round-trips through every
decoder path — subframe models (constant/verbatim/fixed/LPC), stereo
decorrelation modes, Rice partitioning + escape, wasted bits — plus the
CRC-8/CRC-16/MD5 integrity checks and the magic-byte dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_kinesis_spark.operators.flac import decode_flac, encode_flac
from pipeline_kinesis_spark.operators.multimodal import decode_media


def _signal(n, channels, seed=7):
    """Deterministic mildly-autocorrelated int16 test signal (cumsum of
    small steps — gives fixed/LPC predictors something to model)."""
    rng = np.random.default_rng(seed)
    steps = rng.integers(-900, 900, size=(n, channels))
    return np.cumsum(steps // 30, axis=0).astype(np.int16)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("subframe", ["verbatim", "fixed", "lpc"])
def test_subframe_models_round_trip(channels, subframe):
    x = _signal(700, channels)
    enc = encode_flac(16000, x, block_size=256, subframe=subframe)
    rate, dec = decode_flac(enc)
    assert rate == 16000
    assert dec.dtype == np.int16
    assert np.array_equal(dec, x)


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_modes_round_trip(stereo):
    # correlated channels: the side channel is small, the +1-bit side
    # subframe depth is still exercised by the occasional big diff
    x = _signal(512, 2)
    x[:, 1] = x[:, 0] + (np.arange(512) % 7 - 3)
    x[100, 1] = -32768  # force a wide side sample (17-bit depth path)
    x[100, 0] = 32767
    enc = encode_flac(44100, x, block_size=128, subframe="fixed", stereo=stereo)
    rate, dec = decode_flac(enc)
    assert np.array_equal(dec, x)


def test_constant_subframe_and_multi_frame_stream():
    x = np.full((10000, 1), -1234, dtype=np.int16)
    enc = encode_flac(8000, x, block_size=4096, subframe="constant")
    rate, dec = decode_flac(enc)
    assert np.array_equal(dec, x)
    # constant compresses massively — proves the model actually engaged
    assert len(enc) < 200


@pytest.mark.parametrize("porder", [0, 1, 3])
def test_rice_partition_orders(porder):
    x = _signal(512, 1)
    enc = encode_flac(8000, x, block_size=512, partition_order=porder,
                      subframe="fixed")
    assert np.array_equal(decode_flac(enc)[1], x)


def test_rice_escape_to_raw_encoding():
    x = _signal(256, 2)
    enc = encode_flac(8000, x, block_size=256, force_escape=True)
    assert np.array_equal(decode_flac(enc)[1], x)


def test_wasted_bits_shift():
    base = _signal(300, 1) // 16  # headroom for the shift
    enc = encode_flac(22050, base, subframe="fixed", wasted_bits=4)
    rate, dec = decode_flac(enc)
    assert np.array_equal(dec, (base.astype(np.int64) << 4).astype(np.int16))


def test_wasted_bits_with_stereo_decorrelation():
    # mid = (l+r)>>1 keeps FEWER trailing zeros than the inputs when
    # l'+r' is odd — the encoder must use what each decorrelated
    # channel actually shares, not the caller's maximum
    x = _signal(256, 2) // 8
    for mode in ("mid_side", "left_side", "right_side", "auto"):
        enc = encode_flac(8000, x, wasted_bits=2, stereo=mode)
        assert np.array_equal(
            decode_flac(enc)[1], (x.astype(np.int64) << 2).astype(np.int16)
        ), mode


def test_8bit_stream_uses_one_byte_md5():
    # RFC 9639: the STREAMINFO MD5 hashes samples at their stored width
    # — 1 byte for bps<=8. A 2-byte hash would reject every valid
    # externally-encoded 8-bit FLAC.
    rng = np.random.default_rng(11)
    x = rng.integers(-128, 128, size=(500, 2)).astype(np.int16)
    enc = encode_flac(8000, x, bits_per_sample=8, block_size=192)
    rate, dec = decode_flac(enc)
    assert np.array_equal(dec, x)
    with pytest.raises(ValueError, match="overflow"):
        encode_flac(8000, np.full((4, 1), 300, np.int16), bits_per_sample=8)


def test_lpc_on_pathological_signals():
    # all-zero (autocorrelation zero) and pure DC both hit Levinson
    # -Durbin early-outs
    for x in (
        np.zeros((200, 1), dtype=np.int16),
        np.full((200, 1), 77, dtype=np.int16),
    ):
        enc = encode_flac(8000, x, subframe="lpc")
        assert np.array_equal(decode_flac(enc)[1], x)


def test_partial_final_frame():
    x = _signal(1000, 2)  # 1000 = 3×256 + 232: last frame is short
    enc = encode_flac(48000, x, block_size=256)
    assert np.array_equal(decode_flac(enc)[1], x)


def test_dispatch_by_magic_bytes():
    x = _signal(128, 1)
    rate, dec = decode_media(encode_flac(12000, x))
    assert rate == 12000
    assert np.array_equal(dec, x)


def test_frame_crc16_detects_payload_corruption():
    x = _signal(400, 1)
    enc = bytearray(encode_flac(8000, x, block_size=512))
    # flip a bit deep in the frame body (past fLaC + 38-byte metadata +
    # frame header region)
    enc[len(enc) - 10] ^= 0x40
    with pytest.raises(ValueError, match="CRC|MD5|sync|truncated"):
        decode_flac(bytes(enc))


def test_header_crc8_detects_header_corruption():
    x = _signal(400, 1)
    enc = bytearray(encode_flac(8000, x, block_size=512))
    # the frame starts right after fLaC(4) + metadata header(4) +
    # STREAMINFO(34); byte 4 of the frame header is the coded number
    enc[42 + 4] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|coded-number"):
        decode_flac(bytes(enc))


def test_streaminfo_md5_guards_whole_stream():
    x = _signal(300, 2)
    enc = bytearray(encode_flac(8000, x))
    # corrupt the stored MD5 itself: frames decode fine, MD5 check fires
    enc[26] ^= 0xFF  # inside the 16-byte MD5 field (bytes 26..41)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


def test_spectral_features_on_decoded_sine():
    # the non-SQL-expressible half of audio feature extraction: a pure
    # sine survives the FLAC round trip bit-exactly, so its spectrum
    # peaks at the injected bin
    n, rate, freq = 1024, 8000, 500.0
    t = np.arange(n) / rate
    x = (12000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)[:, None]
    _, dec = decode_flac(encode_flac(rate, x, subframe="lpc"))
    assert np.array_equal(dec, x)
    spec = np.abs(np.fft.rfft(dec[:, 0].astype(np.float64)))
    peak_hz = np.argmax(spec[1:]) * rate / n + rate / n
    assert abs(peak_hz - freq) <= rate / n  # within one bin
    centroid = float(
        (spec * np.arange(spec.size)).sum() / spec.sum()
    ) * rate / n
    assert 300 < centroid < 900  # energy concentrated around 500 Hz


def test_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=600),
        channels=st.integers(min_value=1, max_value=3),
        seed=st.integers(min_value=0, max_value=2**31),
        subframe=st.sampled_from(["auto", "verbatim", "fixed", "lpc"]),
        stereo=st.sampled_from(
            ["independent", "left_side", "right_side", "mid_side"]
        ),
        block=st.sampled_from([64, 192, 256, 4096]),
    )
    def check(n, channels, seed, subframe, stereo, block):
        rng = np.random.default_rng(seed)
        x = rng.integers(-32768, 32768, size=(n, channels)).astype(np.int16)
        enc = encode_flac(
            16000, x, block_size=block, subframe=subframe, stereo=stereo
        )
        rate, dec = decode_flac(enc)
        assert rate == 16000
        assert np.array_equal(dec, x)

    check()
