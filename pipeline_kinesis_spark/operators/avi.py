"""MJPEG AVI — real video decode/encode on top of the in-repo JPEG
codec, pure python/numpy from the public RIFF/AVI layout.

Closes the video modality of SURVEY.md §2C C5 honestly: an MJPEG AVI is
a RIFF container (the same chunk grammar as WAV) whose ``00dc`` frame
chunks are ordinary JPEG streams — so the existing from-the-spec JPEG
decoder (baseline + progressive, multimodal.py) does the heavy lifting
and the container layer here is ~200 lines of chunk walking. H.264/H.265
stay gated (motion compensation + CABAC tables are beyond spec-text
reimplementation); MJPEG is the standard fallback codec real capture
pipelines emit.

Layout implemented (public AVI RIFF spec / BITMAPINFOHEADER):

- ``RIFF('AVI ')`` → ``LIST('hdrl')``: ``avih`` main header
  (microseconds per frame, total frames, dimensions), ``LIST('strl')``
  with ``strh`` (fccType 'vids', handler 'MJPG', rate/scale fps) and
  ``strf`` (BITMAPINFOHEADER, biCompression 'MJPG').
- ``LIST('movi')``: ``00dc`` chunks, one JPEG stream per frame (word-
  aligned), optional ``idx1`` index (written, not required to read).

Decode returns ``(fps, (n, h, w, 3) uint8 frames)``; the encoder twin
wraps ``encode_jpeg`` per frame so solid-frame streams round-trip
EXACTLY (the luma transform of r=g=b is identity — same property the
image decode gate leans on). Scale shape: per-payload work confined to
Arrow-batched executor tasks (multimodal.py plumbing).
"""

from __future__ import annotations

import struct

from pipeline_kinesis_spark.operators.decode_guard import foreign_file_guard

__all__ = ["decode_avi", "encode_avi_mjpeg"]


def _chunks(buf: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_size) over a RIFF chunk run;
    chunks pad to even length. Declared sizes are clamped to the buffer
    so a truncated payload surfaces as ValueError, never struct.error."""
    end = min(end, len(buf))
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", buf, pos)
        if pos + 8 + size > len(buf):
            raise ValueError(
                "truncated AVI: chunk "
                f"{cid!r} declares {size} bytes past end of payload"
            )
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def _decode_avi_impl(payload: bytes) -> tuple[float, "np.ndarray"]:
    """MJPEG AVI → (fps, (n_frames, h, w, 3) uint8). Frame JPEGs are
    decoded by the in-repo baseline/progressive JPEG decoder through
    the same dispatch production payloads take."""
    import numpy as np

    from pipeline_kinesis_spark.operators.multimodal import _decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    fps = None
    usec_per_frame = None
    vid_stream = None  # stream number of the MJPG 'vids' strl
    stream_idx = 0
    frames: list["np.ndarray"] = []

    def collect_frames(pos: int, stop: int) -> None:
        """Walk a movi-list body; interleaved writers nest frame chunks
        one level deeper inside LIST('rec ') groups."""
        want = b"%02ddc" % (vid_stream if vid_stream is not None else 0)
        for c2, b2, s2 in _chunks(payload, pos, stop):
            if c2 == b"LIST" and payload[b2 : b2 + 4] == b"rec ":
                collect_frames(b2 + 4, b2 + s2)
            elif c2 == want:  # NNdc: frame for OUR video stream only
                frames.append(_decode_jpeg(payload[b2 : b2 + s2]))

    for cid, body, size in _chunks(payload, 12, end):
        if cid != b"LIST":
            continue
        list_type = payload[body : body + 4]
        if list_type == b"hdrl":
            for c2, b2, s2 in _chunks(payload, body + 4, body + size):
                if c2 == b"avih":
                    (usec_per_frame,) = struct.unpack_from(
                        "<I", payload, b2
                    )
                elif c2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in _chunks(payload, b2 + 4, b2 + s2):
                        if c3 == b"strh":
                            fcc_type, handler = struct.unpack_from(
                                "<4s4s", payload, b3
                            )
                            if fcc_type == b"vids":
                                if handler not in (b"MJPG", b"mjpg"):
                                    raise NotImplementedError(
                                        f"AVI video codec "
                                        f"{handler!r}: only MJPG is "
                                        "implemented (H.264 et al. "
                                        "need decoder libraries)"
                                    )
                                if vid_stream is None:
                                    vid_stream = stream_idx
                                    scale, rate = struct.unpack_from(
                                        "<II", payload, b3 + 20
                                    )
                                    if scale:
                                        fps = rate / scale
                    stream_idx += 1
        elif list_type == b"movi":
            collect_frames(body + 4, body + size)
    if not frames:
        raise ValueError("AVI stream holds no video frames")
    if fps is None:
        fps = 1e6 / usec_per_frame if usec_per_frame else 25.0
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"AVI frames disagree on dimensions: {shapes}")
    return float(fps), np.stack(frames)


def encode_avi_mjpeg(fps: float, frames, quality_subsampling="4:4:4") -> bytes:
    """(n, h, w, 3) uint8 + fps → MJPEG AVI (encoder twin). Each frame
    is a baseline JPEG from the in-repo encoder; fps is carried as
    rate/scale = round(fps*1000)/1000 plus the avih microsecond field."""
    import numpy as np

    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError("expected (n, h, w, 3) uint8 frames")
    n, h, w, _ = a.shape
    if fps <= 0:
        raise ValueError("fps must be positive")
    jpegs = [
        encode_jpeg(a[i], subsampling=quality_subsampling) for i in range(n)
    ]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    rate = max(1, round(fps * 1000))
    scale = 1000
    usec = round(1e6 * scale / rate)
    max_frame = max(len(j) for j in jpegs)

    # avih: usec/frame, max bytes/sec, padding, flags(HASINDEX),
    # total frames, initial frames, streams, buffer, w, h, reserved[4]
    avih = struct.pack(
        "<14I",
        usec,
        max_frame * rate // scale,
        0,
        0x10,
        n,
        0,
        1,
        max_frame,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    # strh: fccType, handler, flags, prio+lang, initial, scale, rate,
    # start, length, buffer, quality, samplesize, rcFrame(4 shorts)
    strh = struct.pack(
        "<4s4sIIIIIIIIiI4H",
        b"vids",
        b"MJPG",
        0,
        0,
        0,
        scale,
        rate,
        0,
        n,
        max_frame,
        -1,
        0,
        0,
        0,
        w,
        h,
    )
    # strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = list_chunk(b"movi", movi_body)

    # idx1: one entry per frame — offset is relative to the 'movi' list
    # type fourcc (the common convention)
    idx_entries = []
    off = 4
    for j in jpegs:
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", 0x10, off, len(j))
        )
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload):
    """Guarded entry: see _decode_avi_impl for the format walk; mechanical
    parse crashes from foreign bytes surface as ValueError
    (operators/decode_guard.py)."""
    with foreign_file_guard("AVI"):
        return _decode_avi_impl(payload)
