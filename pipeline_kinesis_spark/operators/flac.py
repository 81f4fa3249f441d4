"""FLAC (Free Lossless Audio Codec) — decoder + encoder twin, pure
python/numpy from the public spec (RFC 9639 / xiph.org format docs).

FLAC is the lossless member of the multimodal audio surface (SURVEY.md
§2C C5): unlike the G.711/ADPCM companders the decode is BIT-EXACT, so
the encoder twin enables exact round-trip tests and an arithmetic DuckDB
oracle (see ``multimodal.multimodal_audio_stats``). Everything here is
algorithmic — Rice entropy coding, polynomial "fixed" predictors, in-
stream quantized LPC coefficients, CRC-8/CRC-16 integrity, MD5 of the
unencoded samples — which is what makes a from-the-spec implementation
tractable: FLAC has no large constant tables to transcribe (contrast
MP3's Huffman/synthesis-window tables, which stay environment-gated).

Layout implemented (RFC 9639 §8-9):

- ``fLaC`` magic, STREAMINFO metadata block (mandatory, first).
- Frames: 14-bit sync, blocking strategy, coded block-size/sample-rate,
  channel assignment (independent, left/side, right/side, mid/side),
  UTF-8-coded frame number, CRC-8 header check, CRC-16 frame check.
- Subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (in-stream
  precision + shift + coefficients), optional wasted-bits shift.
- Residual: partitioned Rice (4-bit and 5-bit parameter variants) with
  the escape-to-raw encoding.

Scale shape: like the other codecs this runs inside Arrow-batched
``mapInPandas`` executor batches (see multimodal.py) — the driver never
sees a payload.
"""

from __future__ import annotations

import hashlib
import struct

from pipeline_kinesis_spark.operators.decode_guard import foreign_file_guard

__all__ = ["decode_flac", "encode_flac"]


# -- CRCs (RFC 9639 §9.2-9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005, both
# MSB-first, init 0, no reflection) -----------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    """256-entry table for a byte-at-a-time MSB-first CRC (same math as
    the per-bit loop, precomputed per input byte)."""
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    tbl = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        tbl.append(crc)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    tbl = _CRC8_TBL
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    tbl = _CRC16_TBL
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[(crc >> 8) ^ b]
    return crc


# -- MSB-first bit I/O -------------------------------------------------------


class _DecodeAccel:
    """Shared per-payload acceleration structures for the decode path:
    the payload as an unpacked bit array (numpy), the positions of its
    1-bits (Rice unary runs end at a 1-bit, so a sorted ones index
    turns per-bit unary scanning into pointer arithmetic), and a
    zero-padded byte copy for branchless multi-byte windows. Built
    once per decode_flac call and shared by every frame's reader."""

    __slots__ = ("bits", "ones", "padded", "padded_u8")

    def __init__(self, buf: bytes):
        import numpy as np

        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.padded = bytes(buf) + b"\x00" * 8
        self.padded_u8 = np.frombuffer(self.padded, dtype=np.uint8)


class _BitReader:
    """MSB-first bit reader over a bytes buffer (FLAC is big-endian at
    the bit level throughout). With an attached _DecodeAccel, the bulk
    methods (read_rice / read_signed_block) replace per-bit Python
    loops with ones-index walks and numpy block extraction."""

    def __init__(self, buf: bytes, pos: int = 0, accel=None):
        self.buf = buf
        self.byte = pos  # next byte index
        self.bit = 0  # bits already consumed from buf[byte]
        self.accel = accel

    def tell_bytes(self) -> int:
        return self.byte + (1 if self.bit else 0)

    def align(self) -> None:
        if self.bit:
            self.byte += 1
            self.bit = 0

    def read(self, nbits: int) -> int:
        out = 0
        need = nbits
        while need > 0:
            if self.byte >= len(self.buf):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(avail, need)
            cur = self.buf[self.byte]
            chunk = (cur >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.bit += take
            if self.bit == 8:
                self.byte += 1
                self.bit = 0
            need -= take
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        """Count of 0-bits before the terminating 1-bit (RFC 9639 Rice
        quotient / wasted-bits encoding)."""
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def read_rice(self, count: int, param: int) -> list[int]:
        """`count` Rice(param) codes → residual values (unzigzagged).
        Accelerated path: each code is a unary run ending at the next
        1-bit — found by walking the payload's sorted ones index —
        followed by `param` literal bits pulled from a 5-byte window
        of the padded buffer. One small Python step per CODE instead
        of one per BIT."""
        if count == 0:
            # Legal per RFC 9639: the first partition of a subframe
            # holds blocksize>>porder - predictor_order samples, which
            # is zero when they're equal. No bits are consumed, so the
            # position needs no update (the accelerated path would
            # index starts[0] on an empty array otherwise).
            return []
        if self.accel is None:
            out = []
            for _ in range(count):
                q = self.read_unary()
                u = (q << param) | self.read(param)
                out.append(_unzigzag(u))
            return out
        import numpy as np

        a = self.accel
        p = p0 = (self.byte << 3) + self.bit
        ones = a.ones
        j = int(np.searchsorted(ones, p))
        # codes consume <= count terminator ones + count*param payload
        # ones; slice that window to a plain int list once
        window = ones[j : j + count * (param + 1) + 1].tolist()
        nw = len(window)
        total_ones = len(ones)
        step = param + 1
        # pass 1 — terminator positions (the only sequential part:
        # each code's unary run starts where the previous code's
        # payload ended, so the walk skips the payload's 1-bits).
        # Kept to ~4 int ops per code; the payload/unzigzag math is
        # batched in numpy below (was int.from_bytes + shifts per code)
        bs = [0] * count
        wi = 0
        for i in range(count):
            while True:
                if wi >= nw:
                    # pathological run: extend the window
                    j += nw
                    window = ones[j : j + count * step + 16].tolist()
                    nw = len(window)
                    wi = 0
                    if not nw:
                        if j >= total_ones:
                            raise ValueError("truncated FLAC bitstream")
                        continue
                b = window[wi]
                if b >= p:
                    break
                wi += 1
            wi += 1
            bs[i] = b
            p = b + step
        if p > len(self.buf) * 8:
            raise ValueError("truncated FLAC bitstream")
        self.byte, self.bit = p >> 3, p & 7
        # pass 2 — quotients, payload bits, unzigzag: all vectorized.
        # Code i's unary run starts at the original position for i=0,
        # else one-past the previous terminator plus its payload.
        b_arr = np.asarray(bs, dtype=np.int64)
        starts = np.empty(count, dtype=np.int64)
        starts[0] = p0
        starts[1:] = b_arr[:-1] + step
        u = b_arr - starts
        if param:
            s_arr = b_arr + 1
            byte0 = s_arr >> 3
            pb = a.padded_u8
            chunk = (
                (pb[byte0].astype(np.int64) << 32)
                | (pb[byte0 + 1].astype(np.int64) << 24)
                | (pb[byte0 + 2].astype(np.int64) << 16)
                | (pb[byte0 + 3].astype(np.int64) << 8)
                | pb[byte0 + 4]
            )
            payload = (chunk >> (40 - (s_arr & 7) - param)) & (
                (1 << param) - 1
            )
            u = (u << param) | payload
        return ((u >> 1) ^ -(u & 1)).tolist()  # unzigzag

    def read_signed_block(self, count: int, width: int) -> list[int]:
        """`count` consecutive `width`-bit two's-complement values
        (verbatim subframes, warmups, escaped partitions) — extracted
        as one (count, width) bit-matrix multiply."""
        if count == 0:
            return []
        if self.accel is None or width == 0 or count < 8:
            return [self.read_signed(width) for _ in range(count)]
        import numpy as np

        a = self.accel
        s = (self.byte << 3) + self.bit
        e = s + count * width
        if e > len(a.bits):
            raise ValueError("truncated FLAC bitstream")
        seg = a.bits[s:e].reshape(count, width).astype(np.int64)
        weights = np.left_shift(
            1, np.arange(width - 1, -1, -1, dtype=np.int64)
        )
        v = seg @ weights
        half = 1 << (width - 1)
        v = np.where(v >= half, v - (1 << width), v)
        self.byte, self.bit = e >> 3, e & 7
        return v.tolist()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0, "unaligned"
        return bytes(self.out)


# -- UTF-8-style coded number (RFC 9639 §9.1.5: standard UTF-8 extended
# to 7 bytes so 36-bit sample numbers fit) ----------------------------------

_UTF8_RANGES = (
    (7, 1, 0x00),
    (11, 2, 0xC0),
    (16, 3, 0xE0),
    (21, 4, 0xF0),
    (26, 5, 0xF8),
    (31, 6, 0xFC),
    (36, 7, 0xFE),
)


def _write_coded_number(w: _BitWriter, v: int) -> None:
    for bits, nbytes, lead in _UTF8_RANGES:
        if v < (1 << bits):
            if nbytes == 1:
                w.write(v, 8)
                return
            payload_bits = 6 * (nbytes - 1)
            w.write(lead | (v >> payload_bits), 8)
            for i in range(nbytes - 2, -1, -1):
                w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("coded number exceeds 36 bits")


def _read_coded_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0  # leading 1-bits of the lead byte = total byte count
    mask = 0x80
    while nbytes < 8 and first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid coded-number lead byte")
    v = first & (0xFF >> (nbytes + 1)) if nbytes < 7 else 0
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid coded-number continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


# -- fixed predictors (RFC 9639 §9.2.5: the four polynomial predictors) ------

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _predict_fixed(order: int, hist: list[int], i: int) -> int:
    c = _FIXED_COEFS[order]
    return sum(c[j] * hist[i - 1 - j] for j in range(order))


# -- Rice residual ----------------------------------------------------------


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if u & 1 == 0 else -((u + 1) >> 1)


def _read_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(nparts):
        count = blocksize >> porder
        if p == 0:
            count -= order
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw == 0:
                out.extend(0 for _ in range(count))
            else:
                out.extend(r.read_signed_block(count, raw))
        else:
            out.extend(r.read_rice(count, param))
    return out


def _write_residual(
    w: _BitWriter,
    resid: list[int],
    blocksize: int,
    order: int,
    porder: int,
    force_escape: bool,
) -> None:
    # degrade to the largest valid order for THIS block (a short final
    # frame rarely divides the configured 2^porder)
    while porder > 0 and (
        blocksize % (1 << porder) or (blocksize >> porder) <= order
    ):
        porder -= 1
    nparts = 1 << porder
    if (blocksize >> porder) < order:
        raise ValueError("block shorter than predictor order")
    w.write(0, 2)  # 4-bit Rice parameters
    w.write(porder, 4)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = resid[idx : idx + count]
        idx += count
        if force_escape:
            raw = max((max(abs(v) for v in part).bit_length() + 1) if part else 1, 1)
            w.write(0xF, 4)
            w.write(raw, 5)
            for v in part:
                w.write_signed(v, raw)
            continue
        param = _best_rice_param(part)
        w.write(param, 4)
        for v in part:
            u = _zigzag(v)
            w.write_unary(u >> param)
            w.write(u & ((1 << param) - 1), param)


def _best_rice_param(part: list[int]) -> int:
    if not part:
        return 0
    best, best_bits = 0, None
    for k in range(15):  # 15 == escape, not a parameter
        bits = sum((_zigzag(v) >> k) + 1 + k for v in part)
        if best_bits is None or bits < best_bits:
            best, best_bits = k, bits
        elif bits > best_bits * 2:
            break  # cost is convex in k — stop once clearly past the min
    return best


# -- subframes --------------------------------------------------------------


def _reconstruct_fixed(order: int, warm: list[int], resid: list[int]) -> list[int]:
    """Invert the order-`order` fixed (polynomial) predictor: the
    residual is the order-th finite difference of the signal, so the
    signal is `order` successive prefix sums, each seeded with the
    first element of the warmup's corresponding difference level —
    numpy cumsums instead of a per-sample Python recurrence."""
    if order == 0:
        return list(resid)
    import numpy as np

    cur = list(warm)
    seeds = []
    for _ in range(order):
        seeds.append(cur[0])
        cur = [b - a for a, b in zip(cur, cur[1:])]
    arr = np.asarray(resid, dtype=np.int64)
    for k in range(order - 1, -1, -1):
        arr = np.cumsum(np.concatenate(([seeds[k]], arr)))
    return arr.tolist()


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = [v] * blocksize
    elif t == 1:  # VERBATIM
        out = r.read_signed_block(blocksize, eff)
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        out = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        out = _reconstruct_fixed(order, out, resid)
    elif t >= 32:  # LPC, order (t & 31) + 1
        order = (t & 31) + 1
        out = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, blocksize, order)
        for i in range(order, blocksize):
            acc = sum(coefs[j] * out[i - 1 - j] for j in range(order))
            out.append((acc >> shift) + resid[i - order])
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _write_subframe(
    w: _BitWriter,
    samples: list[int],
    bps: int,
    kind: str,
    porder: int,
    force_escape: bool,
    lpc_order: int,
    wasted: int,
) -> None:
    if wasted:
        # the caller's value is a MAXIMUM: decorrelated channels may
        # share fewer trailing zeros than the input did (mid = (l+r)>>1
        # drops one whenever l'+r' is odd), so use what THIS channel
        # actually has
        while wasted and any(v & ((1 << wasted) - 1) for v in samples):
            wasted -= 1
    if wasted:
        samples = [v >> wasted for v in samples]
    eff = bps - wasted
    n = len(samples)

    def header(type_code: int) -> None:
        w.write(0, 1)
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if kind == "constant":
        if any(v != samples[0] for v in samples):
            raise ValueError("constant subframe over non-constant samples")
        header(0)
        w.write_signed(samples[0], eff)
        return
    if kind == "verbatim":
        header(1)
        for v in samples:
            w.write_signed(v, eff)
        return
    if kind == "fixed":
        order = _pick_fixed_order(samples)
        header(8 + order)
        for v in samples[:order]:
            w.write_signed(v, eff)
        resid = [
            samples[i] - _predict_fixed(order, samples, i)
            for i in range(order, n)
        ]
        _write_residual(w, resid, n, order, porder, force_escape)
        return
    if kind == "lpc" and n < 2:
        kind = "verbatim"  # no room for even an order-1 warmup
        header(1)
        for v in samples:
            w.write_signed(v, eff)
        return
    if kind == "lpc":
        order = min(lpc_order, max(1, n - 1))
        coefs, shift = _lpc_coefficients(samples, order)
        prec = 12
        header(32 + (order - 1))
        for v in samples[:order]:
            w.write_signed(v, eff)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        resid = []
        for i in range(order, n):
            acc = sum(coefs[j] * samples[i - 1 - j] for j in range(order))
            resid.append(samples[i] - (acc >> shift))
        _write_residual(w, resid, n, order, porder, force_escape)
        return
    raise ValueError(f"unknown subframe kind {kind!r}")


def _pick_fixed_order(samples: list[int]) -> int:
    """Cheapest fixed order by total residual magnitude — the standard
    order-selection heuristic (sum |residual| tracks Rice cost)."""
    n = len(samples)
    best, best_cost = 0, None
    for order in range(0, min(4, n - 1) + 1):
        cost = sum(
            abs(samples[i] - _predict_fixed(order, samples, i))
            for i in range(order, n)
        )
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _lpc_coefficients(samples: list[int], order: int) -> tuple[list[int], int]:
    """Levinson-Durbin on the autocorrelation, quantized to 12-bit
    integer coefficients + shift. Losslessness never depends on the
    coefficient quality — the residual is exact on both sides — so
    plain rounding (no error feedback) is sufficient."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    autoc = [float(np.dot(x[: len(x) - lag], x[lag:])) for lag in range(order + 1)]
    if autoc[0] == 0.0:
        return [0] * order, 0
    err = autoc[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = autoc[i + 1]
        for j in range(i):
            acc -= lpc[j] * autoc[i - j]
        k = acc / err if err != 0 else 0.0
        new = lpc[:]
        new[i] = k
        for j in range(i):
            new[j] = lpc[j] - k * lpc[i - 1 - j]
        lpc = new
        err *= 1 - k * k
        if err <= 0:
            break
    cmax = max(abs(c) for c in lpc) or 1.0
    prec = 12
    # largest shift keeping every coefficient inside the signed 12-bit
    # range; frame-header shift field is 5-bit signed and non-negative
    shift = min(15, max(0, prec - 1 - int(np.floor(np.log2(cmax))) - 1))
    q = [int(round(c * (1 << shift))) for c in lpc]
    lim = (1 << (prec - 1)) - 1
    q = [max(-lim - 1, min(lim, c)) for c in q]
    return q, shift


# -- stream-level encode ----------------------------------------------------


def encode_flac(
    rate: int,
    samples,
    *,
    block_size: int = 4096,
    subframe: str = "auto",
    stereo: str = "auto",
    partition_order: int = 0,
    force_escape: bool = False,
    lpc_order: int = 8,
    wasted_bits: int = 0,
    bits_per_sample: int = 16,
) -> bytes:
    """(n, channels) int16 → FLAC stream (RFC 9639 layout).

    ``subframe`` forces the per-channel model ('constant' | 'verbatim' |
    'fixed' | 'lpc'; 'auto' = constant when flat else fixed) and
    ``stereo`` the decorrelation ('independent' | 'left_side' |
    'right_side' | 'mid_side'; 'auto' = mid_side for 2ch) so tests can
    exercise every decoder path; the remaining knobs expose Rice
    partitioning, the escape-to-raw encoding and the wasted-bits shift
    (a MAXIMUM — each subframe uses the trailing zeros its channel
    actually shares, since decorrelated side/mid channels may keep
    fewer). ``bits_per_sample`` 8 encodes an 8-bit stream (samples must
    fit int8) — exercises the decoder's 1-byte MD5 convention.
    """
    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n_total, channels = a.shape
    if not 1 <= channels <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if bits_per_sample not in (8, 16):
        raise ValueError("bits_per_sample must be 8 or 16")
    bps = bits_per_sample
    if wasted_bits:
        # tests inject a known trailing-zero shift; the encoded stream
        # keeps bps with `wasted_bits` low zero bits per sample
        a = a << wasted_bits
    if a.size and (
        int(a.max()) >= 1 << (bps - 1) or int(a.min()) < -(1 << (bps - 1))
    ):
        raise ValueError(f"samples overflow bps={bps}")

    # MD5 is over the unencoded samples at their STORED width: one byte
    # each for bps<=8, int16 LE for 9-16 (RFC 9639 streaminfo md5)
    md5 = hashlib.md5(
        a.astype("<i2").tobytes() if bps > 8 else a.astype("i1").tobytes()
    ).digest()

    w = _BitWriter()
    # STREAMINFO (34 bytes) wrapped in a last-metadata-block header
    w.write(1, 1)  # last metadata block
    w.write(0, 7)  # type STREAMINFO
    w.write(34, 24)
    w.write(min(block_size, n_total) if n_total else block_size, 16)
    w.write(block_size, 16)
    w.write(0, 24)  # min frame size unknown
    w.write(0, 24)  # max frame size unknown
    w.write(rate, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(n_total, 36)
    w.align()
    header = b"fLaC" + w.bytes() + md5

    frames = bytearray()
    frame_no = 0
    for start in range(0, max(n_total, 1), block_size):
        block = a[start : start + block_size]
        if block.shape[0] == 0:
            break
        frames += _encode_frame(
            block,
            rate,
            bps,
            frame_no,
            subframe,
            stereo,
            partition_order,
            force_escape,
            lpc_order,
            wasted_bits,
        )
        frame_no += 1
    return header + bytes(frames)


def _encode_frame(
    block,
    rate: int,
    bps: int,
    frame_no: int,
    subframe: str,
    stereo: str,
    porder: int,
    force_escape: bool,
    lpc_order: int,
    wasted: int,
) -> bytes:
    n, channels = block.shape
    mode = stereo
    if channels != 2:
        mode = "independent"
    elif mode == "auto":
        mode = "mid_side"

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocking strategy → coded number = frame index
    w.write(0b0110 if n <= 256 else 0b0111, 4)  # size at header end
    w.write(0, 4)  # sample rate: from STREAMINFO
    if mode == "independent":
        w.write(channels - 1, 4)
    else:
        w.write(
            {"left_side": 0b1000, "right_side": 0b1001, "mid_side": 0b1010}[mode],
            4,
        )
    w.write({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}[bps], 3)
    w.write(0, 1)  # reserved
    _write_coded_number(w, frame_no)
    if n <= 256:
        w.write(n - 1, 8)
    else:
        w.write(n - 1, 16)
    w.align()
    hdr = w.bytes()
    hdr += bytes([_crc8(hdr)])

    body = _BitWriter()
    cols = [block[:, c].tolist() for c in range(channels)]
    if mode == "left_side":
        chans = [cols[0], [l - r for l, r in zip(cols[0], cols[1])]]
        depths = [bps, bps + 1]
    elif mode == "right_side":
        chans = [[l - r for l, r in zip(cols[0], cols[1])], cols[1]]
        depths = [bps + 1, bps]
    elif mode == "mid_side":
        chans = [
            [(l + r) >> 1 for l, r in zip(cols[0], cols[1])],
            [l - r for l, r in zip(cols[0], cols[1])],
        ]
        depths = [bps, bps + 1]
    else:
        chans = cols
        depths = [bps] * channels
    for ch, depth in zip(chans, depths):
        kind = subframe
        if kind == "auto":
            kind = "constant" if all(v == ch[0] for v in ch) else "fixed"
        _write_subframe(
            body, ch, depth, kind, porder, force_escape, lpc_order, wasted
        )
    body.align()
    payload = hdr + body.bytes()
    return payload + struct.pack(">H", _crc16(payload))


# -- stream-level decode ----------------------------------------------------

_RATE_CODES = {
    0b0001: 88200,
    0b0010: 176400,
    0b0011: 192000,
    0b0100: 8000,
    0b0101: 16000,
    0b0110: 22050,
    0b0111: 24000,
    0b1000: 32000,
    0b1001: 44100,
    0b1010: 48000,
    0b1011: 96000,
}

_SIZE_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _decode_flac_impl(payload: bytes) -> tuple[int, "np.ndarray"]:
    """FLAC stream → (sample_rate, (n, channels) int16 array), verifying
    CRC-8 per frame header, CRC-16 per frame, and the STREAMINFO MD5 of
    the decoded samples (when present)."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    md5_expect = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            r = _BitReader(body)
            r.read(16)  # min block size
            max_bs = r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            n_total = r.read(36)
            info = (rate, channels, bps, n_total, max_bs)
            md5_expect = body[18:34]
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    rate, channels, bps, n_total, _ = info
    if bps > 16:
        raise NotImplementedError(
            f"container convention is int16 audio; FLAC bps={bps}"
        )

    out_ch: list[list[int]] = [[] for _ in range(channels)]
    accel = _DecodeAccel(payload)  # shared bit/ones index, built once
    while pos < len(payload):
        pos = _decode_frame(payload, pos, info, out_ch, accel)
        if n_total and len(out_ch[0]) >= n_total:
            break
    samples = np.asarray(
        [c[:n_total] if n_total else c for c in out_ch], dtype=np.int64
    ).T
    arr = samples.astype(np.int16)
    if md5_expect and md5_expect != b"\x00" * 16:
        # stored sample width governs the hash: 1 byte for bps<=8,
        # int16 LE for 9-16 (matches the encoder and RFC 9639)
        raw = (
            arr.astype("<i2").tobytes()
            if bps > 8
            else arr.astype("i1").tobytes()
        )
        if hashlib.md5(raw).digest() != md5_expect:
            raise ValueError("FLAC MD5 mismatch: decoded audio corrupt")
    return rate, arr


def _decode_frame(payload: bytes, pos: int, info, out_ch, accel=None) -> int:
    rate_si, channels, bps_si, _, _ = info
    r = _BitReader(payload, pos, accel=accel)
    if r.read(14) != 0b11111111111110:
        raise ValueError(f"lost FLAC frame sync at byte {pos}")
    r.read(1)  # reserved
    r.read(1)  # blocking strategy (coded number parsed either way)
    bs_code = r.read(4)
    sr_code = r.read(4)
    chan_code = r.read(4)
    size_code = r.read(3)
    r.read(1)  # reserved
    _read_coded_number(r)
    if bs_code == 0:
        raise ValueError("reserved block size code 0000")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = r.read(8) + 1
    elif bs_code == 7:
        blocksize = r.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 0:
        pass  # from STREAMINFO
    elif sr_code in _RATE_CODES:
        pass  # informational; STREAMINFO remains authoritative here
    elif sr_code == 0b1100:
        r.read(8)
    elif sr_code in (0b1101, 0b1110):
        r.read(16)
    else:
        raise ValueError("invalid sample rate code 1111")
    if size_code == 0:
        bps = bps_si
    elif size_code in _SIZE_CODES:
        bps = _SIZE_CODES[size_code]
    else:
        raise ValueError(f"reserved sample size code {size_code:#05b}")
    r.align()
    hdr_crc = r.read(8)
    if _crc8(payload[pos : r.tell_bytes() - 1]) != hdr_crc:
        raise ValueError("FLAC frame header CRC-8 mismatch")

    if chan_code <= 7:
        nch, mode = chan_code + 1, "independent"
    elif chan_code == 0b1000:
        nch, mode = 2, "left_side"
    elif chan_code == 0b1001:
        nch, mode = 2, "right_side"
    elif chan_code == 0b1010:
        nch, mode = 2, "mid_side"
    else:
        raise ValueError(f"reserved channel assignment {chan_code:#06b}")
    if nch != channels:
        raise ValueError("frame channel count disagrees with STREAMINFO")

    decoded = []
    for c in range(nch):
        depth = bps
        if (mode == "left_side" and c == 1) or (
            mode == "right_side" and c == 0
        ) or (mode == "mid_side" and c == 1):
            depth += 1
        decoded.append(_read_subframe(r, blocksize, depth))
    r.align()
    frame_crc = r.read(16)
    if _crc16(payload[pos : r.tell_bytes() - 2]) != frame_crc:
        raise ValueError("FLAC frame CRC-16 mismatch")

    if mode == "independent":
        chans = decoded
    elif mode == "left_side":
        left, side = decoded
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif mode == "right_side":
        side, right = decoded
        chans = [[rr + s for rr, s in zip(right, side)], right]
    else:  # mid_side (libFLAC reconstruction: re-widen mid with side's LSB)
        mid, side = decoded
        chans = [
            [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
            [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
        ]
    for c in range(nch):
        out_ch[c].extend(chans[c])
    return r.tell_bytes()


def decode_flac(payload):
    """Guarded entry: see _decode_flac_impl for the format walk; mechanical
    parse crashes from foreign bytes surface as ValueError
    (operators/decode_guard.py)."""
    with foreign_file_guard("FLAC"):
        return _decode_flac_impl(payload)
