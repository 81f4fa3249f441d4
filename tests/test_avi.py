"""MJPEG AVI video (C5): container round-trips on top of the in-repo
JPEG codec — exact for solid frames, PSNR-bounded for content — plus
fps carriage, codec gating, and the magic-byte dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_kinesis_spark.operators.avi import decode_avi, encode_avi_mjpeg
from pipeline_kinesis_spark.operators.multimodal import decode_media


def _gradient_frame(h, w, phase):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + phase) % 256, (y * 5 + phase) % 256, (x + y) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_solid_frames_round_trip_exactly():
    levels = [0, 17, 128, 200, 255]
    frames = np.stack([np.full((16, 12, 3), lv, np.uint8) for lv in levels])
    fps, dec = decode_avi(encode_avi_mjpeg(24.0, frames))
    assert fps == 24.0
    assert np.array_equal(dec, frames)


def test_content_frames_decode_close():
    frames = np.stack([_gradient_frame(32, 24, p) for p in (0, 60, 120)])
    fps, dec = decode_avi(encode_avi_mjpeg(29.97, frames))
    assert abs(fps - 29.97) < 0.01
    assert dec.shape == frames.shape
    err = np.abs(dec.astype(int) - frames.astype(int)).mean()
    assert err < 3.0  # JPEG-lossy but close on smooth content


def test_single_frame_and_odd_dims():
    frames = _gradient_frame(7, 5, 9)[None]
    fps, dec = decode_avi(encode_avi_mjpeg(1.0, frames))
    assert dec.shape == (1, 7, 5, 3)


def test_dispatch_by_magic_bytes_and_wav_disambiguation():
    frames = np.full((2, 6, 4, 3), 50, np.uint8)
    fps, dec = decode_media(encode_avi_mjpeg(10.0, frames))
    assert np.array_equal(dec, frames)
    # RIFF/WAVE still routes to the audio decoder
    from pipeline_kinesis_spark.operators.multimodal import encode_wav

    rate, samples = decode_media(
        encode_wav(8000, np.arange(32, dtype=np.int16))
    )
    assert rate == 8000 and samples.shape == (32, 1)


def test_non_mjpeg_codec_gated_honestly():
    frames = np.full((1, 6, 4, 3), 9, np.uint8)
    enc = bytearray(encode_avi_mjpeg(5.0, frames))
    i = enc.find(b"vids")  # strh handler sits right after fccType
    enc[i + 4 : i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi(bytes(enc))


def test_empty_and_corrupt_rejected():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    frames = np.full((1, 6, 4, 3), 9, np.uint8)
    enc = encode_avi_mjpeg(5.0, frames)
    movi = enc.find(b"movi")
    with pytest.raises(ValueError, match="no video frames"):
        decode_avi(enc[: movi - 8])  # chop the movi list off
