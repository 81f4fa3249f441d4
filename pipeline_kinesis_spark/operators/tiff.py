"""TIFF (baseline, TIFF 6.0 spec) — decoder + encoder twin, pure
python/numpy, no codec libraries.

TIFF rounds out the image side of the multimodal surface (SURVEY.md §2C
C5): it is the container scientific/scan corpora ship in, and — like
FLAC on the audio side — everything baseline TIFF needs is algorithmic:
IFD tag walking, strip assembly, PackBits RLE, the TIFF variant of LZW
(MSB-first codes with the "early change" width bump one code before
GIF's), zlib Deflate, and the horizontal-differencing predictor. No
constant tables to transcribe.

Implemented from the public TIFF 6.0 specification:

- Both byte orders (``II`` little, ``MM`` big); first IFD only.
- 8-bit samples, chunky planar config; photometric 0 (WhiteIsZero),
  1 (BlackIsZero), 2 (RGB), 3 (Palette with 16-bit colormap).
- Compression 1 (none), 5 (LZW), 8/32946 (Deflate), 32773 (PackBits),
  over multi-strip images; Predictor 2 (horizontal differencing).

Decode returns ``(h, w, 3) uint8`` like every other image decoder here;
the encoder twin emits all of the above for bit-exact round-trip tests
and the image decode gate row. Scale shape: runs inside Arrow-batched
``mapInPandas`` executor batches (see multimodal.py).
"""

from __future__ import annotations

import struct

from pipeline_kinesis_spark.operators.decode_guard import (
    check_dims,
    foreign_file_guard,
)
import zlib

__all__ = ["decode_tiff", "encode_tiff"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# -- PackBits (TIFF 6.0 §9) --------------------------------------------------


def _packbits_decode(data: bytes, max_out: int | None = None) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        if max_out is not None and len(out) >= max_out:
            break
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    # the cap is only checked between runs, so a final overshooting run
    # can leave up to 128 extra bytes in the buffer — honor the
    # contract at the boundary too (ADVICE r11 #1)
    if max_out is not None:
        return bytes(out[:max_out])
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal group: until the next >=3 run or 128 bytes
        j = i
        while j < n and j - i < 128:
            if (
                j + 2 < n
                and data[j] == data[j + 1] == data[j + 2]
            ):
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# -- TIFF LZW (TIFF 6.0 §13: MSB-first codes, early change) ------------------

_CLEAR, _EOI = 256, 257


_LZW_BASE = [bytes([i]) for i in range(256)] + [b"", b""]


def _lzw_decode(data: bytes, max_out: int | None = None) -> bytes:
    # Hot loop: lengths, the width mask, and the early-change threshold
    # are kept in locals (profiling showed ~1.1M len() calls per strip
    # batch dominating the walltime at 0.46 MB/s/core).
    #
    # max_out caps the decoded size (an LZW bomb expands ~4096x: each
    # 12-bit code can emit a dictionary string thousands of bytes
    # long). The raster slice always discarded the excess; the cap
    # stops it from being materialized — same guard family as the
    # deflate strips (ADVICE r10 #4, the GIF decoder's npix bound).
    out = bytearray()
    table = _LZW_BASE.copy()
    ncodes = 258
    width = 9
    mask = (1 << width) - 1
    bump_at = (1 << width) - 2
    acc = nacc = 0
    prev: bytes | None = None
    pos = 0
    nbytes = len(data)
    while True:
        while nacc < width:
            if pos >= nbytes:
                return bytes(out)  # missing EOI: tolerate truncation
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        nacc -= width
        code = (acc >> nacc) & mask
        # keep the accumulator machine-word sized: without this it
        # grows 8 bits per byte for the whole strip and every shift
        # becomes an O(strip) bigint op (quadratic decode)
        acc &= (1 << nacc) - 1
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            del table[258:]
            ncodes = 258
            width = 9
            mask = (1 << width) - 1
            bump_at = (1 << width) - 2
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < ncodes:
            entry = table[code]
            table.append(prev + entry[:1])
            ncodes += 1
        elif code == ncodes:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
            ncodes += 1
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if max_out is not None and len(out) >= max_out:
            return bytes(out[:max_out])
        prev = entry
        # early change: width bumps when the NEXT added code would be
        # 2^width - 1 (one earlier than GIF). The decoder's table runs
        # one entry BEHIND the encoder's (no add on the first post-clear
        # code, and the KwKwK case references one-ahead), hence -2 here
        # against the encoder's `next_code == 2^width - 1`.
        if ncodes >= bump_at and width < 12:
            width += 1
            mask = (1 << width) - 1
            bump_at = (1 << width) - 2
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # early change, mirror of the decoder
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset (spec §13)
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
        # the decoder cannot tell this flush emit from a normal one, so
        # it will account a (never-used) table entry for it before
        # reading the next code — mirror that virtual add, else EOI goes
        # out one bit narrower than the decoder reads it whenever the
        # flush lands exactly on a width threshold
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


# -- decode ------------------------------------------------------------------


def _decode_tiff_impl(payload: bytes) -> "np.ndarray":
    import numpy as np

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF: IFD offset beyond payload")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise ValueError("truncated TIFF: IFD overruns payload")

    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        tag, typ, count, raw = struct.unpack_from(
            e + "HHI4s", payload, ifd_off + 2 + 12 * k
        )
        size = _TYPE_SIZES.get(typ, 1) * count
        if size > len(payload):
            # an entry's value bytes must lie inside the file; a forged
            # count field otherwise sizes a value buffer (or, below, a
            # placeholder list) of up to 2**32 elements before any data
            # is read (r10 fuzz: count=0x2ba90000 -> MemoryError)
            raise ValueError("TIFF IFD entry value overruns payload")
        if size <= 4:
            buf = raw
        else:
            (off,) = struct.unpack_from(e + "I", raw, 0)
            buf = payload[off : off + size]
        if typ == 3:
            vals = list(struct.unpack_from(e + f"{count}H", buf, 0))
        elif typ == 4:
            vals = list(struct.unpack_from(e + f"{count}I", buf, 0))
        elif typ == 1:
            vals = list(buf[:count])
        else:
            # rationals/ASCII: values are never read, only first-element
            # presence via one(); don't materialize count entries
            vals = [0] * min(count, 1)
        tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    check_dims("TIFF", w, h, 3)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit TIFF samples (got {bits})")
    if one(284, 1) != 1:
        raise NotImplementedError("planar TIFF (PlanarConfiguration=2)")
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/byte counts")

    row_bytes = w * spp
    raw = bytearray()
    for idx, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        strip_cap = (
            min(rows_per_strip, max(h - idx * rows_per_strip, 0))
            * row_bytes
        )
        if strip_cap <= 0:
            # surplus strips beyond the raster contribute nothing —
            # and zlib treats max_length=0 as UNLIMITED, so never let
            # a zero cap reach the decompressor
            continue
        if compression == 1:
            data = strip
        elif compression == 5:
            data = _lzw_decode(strip, max_out=strip_cap)
        elif compression in (8, 32946):
            # deflate-bomb guard: a strip never legitimately inflates
            # past its row span (check_dims bounds w*h but not the
            # stream) — cap the inflation at what the raster consumes
            # instead of materializing an attacker-chosen expansion.
            # Over-long output was always sliced off below; the cap
            # just stops it from ever existing.
            data = zlib.decompressobj().decompress(strip, strip_cap)
        elif compression == 32773:
            data = _packbits_decode(strip, max_out=strip_cap)
        else:
            raise NotImplementedError(
                f"TIFF compression {compression} (baseline: 1/5/8/32773)"
            )
        nrows = min(rows_per_strip, h - idx * rows_per_strip)
        raw += data[: nrows * row_bytes]
    if len(raw) < h * row_bytes:
        raise ValueError("truncated TIFF strip data")

    img = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * row_bytes)
    img = img.reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: undo with a cumulative sum mod 256
        img = np.cumsum(img.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")

    if photometric == 2:  # RGB
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples per pixel")
        return np.ascontiguousarray(img[:, :, :3])
    if photometric in (0, 1):  # grayscale (0 = WhiteIsZero)
        g = img[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photometric == 3:  # palette, 16-bit colormap in R..G..B thirds
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing its ColorMap")
        third = len(cmap) // 3
        lut = (
            np.asarray(cmap, dtype=np.uint32).reshape(3, third).T >> 8
        ).astype(np.uint8)
        return lut[img[:, :, 0]]
    raise NotImplementedError(f"TIFF photometric {photometric}")


# -- encode ------------------------------------------------------------------

_COMP_CODES = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def encode_tiff(
    pixels,
    *,
    compression: str = "none",
    photometric: str = "rgb",
    predictor: int = 1,
    byte_order: str = "II",
    rows_per_strip: int | None = None,
) -> bytes:
    """(h, w, 3) uint8 → baseline TIFF.

    ``photometric``: 'rgb' | 'gray' | 'gray_inverted' (WhiteIsZero) |
    'palette' (input must have ≤256 distinct colors). ``predictor=2``
    enables horizontal differencing (any compression). ``byte_order``
    'II' or 'MM' exercises both decoder endianness paths.
    """
    import numpy as np

    a = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 pixels")
    h, w, _ = a.shape
    e = {"II": "<", "MM": ">"}[byte_order]
    comp = _COMP_CODES[compression]

    colormap: list[int] | None = None
    if photometric == "rgb":
        photo, spp, plane = 2, 3, a
    elif photometric in ("gray", "gray_inverted"):
        if not (a[:, :, 0] == a[:, :, 1]).all() or not (
            a[:, :, 0] == a[:, :, 2]
        ).all():
            raise ValueError("gray photometric needs r==g==b input")
        g = a[:, :, 0]
        photo = 1 if photometric == "gray" else 0
        if photo == 0:
            g = 255 - g
        spp, plane = 1, g[:, :, None]
    elif photometric == "palette":
        flat = a.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette photometric needs ≤256 colors")
        photo, spp = 3, 1
        plane = inverse.astype(np.uint8).reshape(h, w, 1)
        # 16-bit colormap, R then G then B thirds (TIFF 6.0 §23);
        # <<8 | value makes the decoder's >>8 exact
        cm = colors.astype(np.uint32)
        cm16 = (cm << 8) | cm
        colormap = [int(v) for v in cm16.T.reshape(-1)]
    else:
        raise ValueError(f"unknown photometric {photometric!r}")

    if predictor == 2:
        diff = plane.astype(np.int16)
        diff[:, 1:, :] = diff[:, 1:, :] - plane.astype(np.int16)[:, :-1, :]
        plane = diff.astype(np.uint8)
    elif predictor != 1:
        raise ValueError("predictor must be 1 or 2")

    rps = rows_per_strip or max(1, 8192 // max(1, w * spp))
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        data = plane[y0 : y0 + rps].tobytes()
        if comp == 1:
            strips.append(data)
        elif comp == 5:
            strips.append(_lzw_encode(data))
        elif comp == 8:
            strips.append(zlib.compress(data, 6))
        else:
            strips.append(_packbits_encode(data))

    # layout: 8-byte header | strip data | out-of-line tag values | IFD
    out = bytearray(struct.pack(e + "2sH", byte_order.encode(), 42))
    out += b"\x00\x00\x00\x00"  # IFD offset patched below
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
        if len(out) & 1:
            out += b"\x00"  # word-align

    entries: list[tuple[int, int, int, bytes]] = []

    def add(tag: int, typ: int, vals: list[int]) -> None:
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        packed = struct.pack(e + f"{len(vals)}{fmt}", *vals)
        if len(packed) <= 4:
            entries.append((tag, typ, len(vals), packed.ljust(4, b"\x00")))
        else:
            nonlocal_off = len(out)
            out.extend(packed)
            if len(out) & 1:
                out.extend(b"\x00")
            entries.append(
                (tag, typ, len(vals), struct.pack(e + "I", nonlocal_off))
            )

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [comp])
    add(262, 3, [photo])
    add(273, 4, strip_offsets)
    add(277, 3, [spp])
    add(278, 4, [rps])
    add(279, 4, [len(s) for s in strips])
    add(284, 3, [1])
    if predictor == 2:
        add(317, 3, [2])
    if colormap is not None:
        add(320, 3, colormap)

    entries.sort(key=lambda t: t[0])  # spec: ascending tag order
    ifd_off = len(out)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack(e + "HHI", tag, typ, count) + val
    out += struct.pack(e + "I", 0)  # no next IFD
    struct.pack_into(e + "I", out, 4, ifd_off)
    return bytes(out)


def decode_tiff(payload):
    """Guarded entry: see _decode_tiff_impl for the format walk; mechanical
    parse crashes from foreign bytes surface as ValueError
    (operators/decode_guard.py)."""
    with foreign_file_guard("TIFF"):
        return _decode_tiff_impl(payload)
