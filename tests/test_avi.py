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
    # chopping anywhere must surface as ValueError (truncation or
    # no-frames), never struct.error — callers filter with ValueError
    for cut in (40, enc.find(b"movi") - 8, len(enc) - 6):
        with pytest.raises(ValueError, match="truncated AVI|no video"):
            decode_avi(enc[:cut])


def test_rec_grouped_interleaved_layout():
    # interleaved capture writers nest frame chunks in LIST('rec ')
    # groups one level below movi — repackage the twin's output
    import struct

    frames = np.stack(
        [np.full((6, 4, 3), lv, np.uint8) for lv in (30, 60)]
    )
    enc = encode_avi_mjpeg(12.0, frames)
    movi_at = enc.find(b"LIST", 12)
    # locate the movi LIST (skip hdrl)
    while enc[movi_at + 8 : movi_at + 12] != b"movi":
        (sz,) = struct.unpack_from("<I", enc, movi_at + 4)
        movi_at += 8 + sz + (sz & 1)
    (movi_sz,) = struct.unpack_from("<I", enc, movi_at + 4)
    body = enc[movi_at + 12 : movi_at + 8 + movi_sz]
    rec = b"LIST" + struct.pack("<I", 4 + len(body)) + b"rec " + body
    new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    rebuilt = bytearray(
        enc[:movi_at] + new_movi + enc[movi_at + 8 + movi_sz :]
    )
    struct.pack_into("<I", rebuilt, 4, len(rebuilt) - 8)  # riff size
    fps, dec = decode_avi(bytes(rebuilt))
    assert fps == 12.0
    assert np.array_equal(dec, frames)


def test_secondary_stream_frames_not_mixed_in():
    # a '01dc' chunk from another stream must not join our frame stack
    import struct

    frames = np.full((1, 6, 4, 3), 77, np.uint8)
    enc = encode_avi_mjpeg(8.0, frames)
    movi_at = enc.find(b"LIST", 12)
    while enc[movi_at + 8 : movi_at + 12] != b"movi":
        (sz,) = struct.unpack_from("<I", enc, movi_at + 4)
        movi_at += 8 + sz + (sz & 1)
    (movi_sz,) = struct.unpack_from("<I", enc, movi_at + 4)
    alien = b"01dc" + struct.pack("<I", 4) + b"\xde\xad\xbe\xef"
    insert_at = movi_at + 8 + movi_sz
    rebuilt = bytearray(enc)
    rebuilt[movi_at + 4 : movi_at + 8] = struct.pack("<I", movi_sz + len(alien))
    rebuilt[insert_at:insert_at] = alien
    struct.pack_into("<I", rebuilt, 4, len(rebuilt) - 8)
    fps, dec = decode_avi(bytes(rebuilt))
    assert dec.shape == (1, 6, 4, 3)  # alien frame ignored
