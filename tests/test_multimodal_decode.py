"""Pure-numpy media decode (C5): PPM/BMP/WAV plus the compressed
formats (PNG, GIF, baseline JPEG, G.711, IMA ADPCM) round-trip with planted
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


def test_transform_codecs_stay_gated():
    # MP3 (MDCT) remains env-gated; baseline JPEG decodes for real now
    with pytest.raises(NotImplementedError, match="decoder"):
        decode_media(b"ID3\x04\x00....", "audio/mpeg")
    # truncated/invalid payloads error loudly, never misdecode
    with pytest.raises(ValueError, match="IHDR"):
        decode_media(b"\x89PNG\r\n\x1a\n", "image/png")
    with pytest.raises(ValueError, match="SOS"):
        decode_media(b"\xff\xd8\xff\xe0\x00\x04..", "image/jpeg")
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


def test_png_round_trip_all_filters():
    """A COMPRESSED format decoded for real: RGB round-trips through
    zlib-deflated PNG under every spec filter type (None/Sub/Up/
    Average/Paeth)."""
    from pipeline_kinesis_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for ft in range(5):
        body = encode_png(px, filter_type=ft)
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(body) != px.nbytes  # actually compressed/filtered
        got = decode_media(body)
        assert (got == px).all(), f"filter {ft}"


def test_png_color_types_normalize_to_rgb():
    """Gray, gray+alpha and RGBA payloads all come back (h, w, 3)."""
    from pipeline_kinesis_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    got = decode_media(encode_png(gray))
    assert got.shape == (5, 4, 3) and (got[:, :, 0] == gray).all()
    assert (got[:, :, 1] == gray).all() and (got[:, :, 2] == gray).all()

    ga = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
    got = decode_media(encode_png(ga))
    assert got.shape == (5, 4, 3) and (got[:, :, 0] == ga[:, :, 0]).all()

    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    got = decode_media(encode_png(rgba))
    assert got.shape == (5, 4, 3) and (got == rgba[:, :, :3]).all()


def test_png_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_kinesis_spark.operators.multimodal import encode_png

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 13),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def rt(h, w, ft, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_media(encode_png(px, filter_type=ft)) == px).all()

    rt()


def test_png_flows_through_pixel_stats_with_other_containers(spark):
    """PNG joins PPM/BMP in one binary column through the Arrow-batched
    decode path — dispatch is per payload, stats exact."""
    from pipeline_kinesis_spark.operators.multimodal import encode_png

    rows = []
    for i in range(9):
        level = 25 * i
        px = np.full((6, 4, 3), level, dtype=np.uint8)
        payload = [encode_ppm, encode_bmp, encode_png][i % 3](px)
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r.media_id: r for r in decode_pixel_stats(df).collect()}
    assert len(got) == 9
    for i in range(9):
        r = got[i]
        assert (r.width, r.height) == (4, 6)
        assert r.mean_px == float(25 * i)
        assert r.min_px == r.max_px == 25 * i


def test_png_variant_depths_palette_and_interlace():
    """The PNG edge variants (r07): sub-8-bit grayscale (1/2/4),
    16-bit gray/RGB (high-byte reduction), PALETTE color type at every
    legal depth, and Adam7 interlacing — all round-tripped through the
    variant encoder twin, including pass-degenerate dims < 8."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_png_variant,
    )

    rng = np.random.default_rng(5)
    for d in (1, 2, 4):
        vals = rng.integers(0, 1 << d, (11, 9))
        exp = (vals * (255 // ((1 << d) - 1))).astype(np.uint8)
        dec = decode_media(encode_png_variant(vals, depth=d, color=0))
        assert np.array_equal(dec, np.repeat(exp[:, :, None], 3, axis=2))
    g16 = rng.integers(0, 65536, (10, 6))
    dec = decode_media(encode_png_variant(g16, depth=16, color=0))
    assert np.array_equal(
        dec, np.repeat((g16 >> 8).astype(np.uint8)[:, :, None], 3, axis=2)
    )
    rgb16 = rng.integers(0, 65536, (9, 5, 3))
    dec = decode_media(encode_png_variant(rgb16, depth=16, color=2))
    assert np.array_equal(dec, (rgb16 >> 8).astype(np.uint8))
    for d in (1, 2, 4, 8):
        n = 1 << d
        pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        idx = rng.integers(0, n, (12, 10))
        dec = decode_media(
            encode_png_variant(idx, depth=d, color=3, palette=pal)
        )
        assert np.array_equal(dec, pal[idx])
    # Adam7: multi-pass grids incl. dims smaller than a full pass cell
    gray = rng.integers(0, 256, (21, 13))
    dec = decode_media(
        encode_png_variant(gray, depth=8, color=0, interlaced=True)
    )
    assert np.array_equal(
        dec, np.repeat(gray.astype(np.uint8)[:, :, None], 3, axis=2)
    )
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (19, 23))
    dec = decode_media(
        encode_png_variant(
            idx, depth=4, color=3, palette=pal, interlaced=True
        )
    )
    assert np.array_equal(dec, pal[idx])
    tiny = rng.integers(0, 4, (7, 3))
    dec = decode_media(
        encode_png_variant(tiny, depth=2, color=0, interlaced=True)
    )
    assert np.array_equal(
        dec, np.repeat((tiny * 85).astype(np.uint8)[:, :, None], 3, axis=2)
    )


def test_png_unfilter_property_any_bpp():
    """The generalized scanline unfilter inverts a reference forward
    filter at every type and left-neighbor distance (bpp) the spec
    allows — including the 16-bit RGB bpp=6 and sub-byte bpp=1 cases
    the container tests don't cycle."""
    from pipeline_kinesis_spark.operators.multimodal import _png_unfilter

    rng = np.random.default_rng(13)

    def forward(rows, ftype, bpp):
        h, stride = rows.shape
        out = np.zeros((h, stride + 1), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            cur = rows[y].astype(np.int64)
            filt = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                filt[i] = (cur[i] - pred) % 256
            out[y, 0] = ftype
            out[y, 1:] = filt
            prev = cur
        return out

    for bpp, stride in ((1, 7), (2, 8), (3, 9), (4, 12), (6, 18), (8, 24)):
        rows = rng.integers(0, 256, (5, stride)).astype(np.uint8)
        for ftype in range(5):
            raw = forward(rows, ftype, bpp)
            assert np.array_equal(
                _png_unfilter(raw, stride, bpp), rows
            ), (bpp, ftype)


def test_png_invalid_combinations_still_rejected():
    import struct
    import zlib
    from pipeline_kinesis_spark.operators.multimodal import _PNG_MAGIC

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    # RGB at depth 4 is illegal per the spec — must gate, not misdecode
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    bad = _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth=4"):
        decode_media(bad)


def test_g711_code_round_trips():
    """Compress∘expand is the identity on the code space — the
    canonical G.711 invariant (μ-law excludes 0x7F, the spec's second
    zero, which canonicalizes to 0xFF)."""
    from pipeline_kinesis_spark.operators.multimodal import (
        _alaw_compress,
        _alaw_expand,
        _ulaw_compress,
        _ulaw_expand,
    )

    codes = np.arange(256, dtype=np.uint8)
    u_rt = _ulaw_compress(_ulaw_expand(codes))
    assert (u_rt[codes != 0x7F] == codes[codes != 0x7F]).all()
    assert u_rt[0x7F] == 0xFF  # -0 canonicalizes to +0's code
    a_rt = _alaw_compress(_alaw_expand(codes))
    assert (a_rt == codes).all()


def test_g711_wav_decodes_within_quantization_error():
    """Compressed AUDIO decode for real: 8-bit companded WAV (fmt 6/7)
    expands to int16 within G.711's segment quantization error."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_wav_g711,
    )

    rng = np.random.default_rng(11)
    s = rng.integers(-32000, 32000, size=(500, 2)).astype(np.int16)
    for law in ("ulaw", "alaw"):
        payload = encode_wav_g711(8000, s, law=law)
        rate, got = decode_media(payload)
        assert rate == 8000 and got.shape == s.shape
        assert got.dtype == np.int16
        err = np.abs(got.astype(np.int64) - s.astype(np.int64))
        bound = np.abs(s.astype(np.int64)) // 16 + 64
        assert (err <= bound).all(), (law, int(err.max()))
        # half the bytes of PCM16: actually compressed
        assert len(payload) < s.nbytes


def test_gif_lzw_round_trip_including_table_reset():
    """Variable-width LZW for real: random 256-color 64x64 indices grow
    the dictionary through every code width (9..12 bits) and past the
    4096-entry reset; structured data exercises long matches."""
    from pipeline_kinesis_spark.operators.multimodal import encode_gif

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # random indices: ~1 new dict entry per pixel -> hits the 4096 reset
    idx = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    got = decode_media(encode_gif(pal, idx))
    assert (got == pal[idx.astype(np.int32)]).all()
    # highly repetitive indices: long LZW matches, tiny output
    idx2 = np.tile(np.arange(8, dtype=np.uint8), (32, 16))
    body = encode_gif(pal, idx2)
    assert len(body) < idx2.size  # actually compressed
    assert (decode_media(body) == pal[idx2.astype(np.int32)]).all()


def test_gif_interlaced_and_small_palettes():
    from pipeline_kinesis_spark.operators.multimodal import encode_gif

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)  # non-pow2
    idx = rng.integers(0, 5, size=(13, 7), dtype=np.uint8)
    assert (
        decode_media(encode_gif(pal, idx)) == pal[idx.astype(np.int32)]
    ).all()
    assert (
        decode_media(encode_gif(pal, idx, interlaced=True))
        == pal[idx.astype(np.int32)]
    ).all()


def test_gif_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_kinesis_spark.operators.multimodal import encode_gif

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 17),
        ncolors=st.integers(2, 256),
        interlaced=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def rt(h, w, ncolors, interlaced, seed):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
        got = decode_media(encode_gif(pal, idx, interlaced=interlaced))
        assert (got == pal[idx.astype(np.int32)]).all()

    rt()


def test_jpeg_baseline_round_trip_psnr():
    """The transform codec itself, from the spec: DCT + quantization +
    generic-DHT Huffman. Solid gray decodes EXACTLY (DC-only blocks);
    smooth content round-trips above 40 dB PSNR at ~15x compression,
    under both 4:4:4 and 4:2:0 chroma subsampling."""
    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    solid = np.full((16, 16, 3), 128, dtype=np.uint8)
    assert (decode_media(encode_jpeg(solid)) == 128).all()

    y, x = np.mgrid[0:40, 0:56]
    px = np.stack(
        [(x * 4) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        body = encode_jpeg(px, subsampling=sub)
        assert body[:2] == b"\xff\xd8" and body[-2:] == b"\xff\xd9"
        assert len(body) < px.nbytes / 5  # actually compressed
        got = decode_media(body)
        assert got.shape == px.shape
        mse = np.mean((got.astype(float) - px.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / mse) > 38, sub


def test_jpeg_solid_colors_decode_within_rounding():
    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    rng = np.random.default_rng(5)
    for _ in range(6):
        color = rng.integers(0, 256, size=3)
        px = np.zeros((24, 17, 3), dtype=np.uint8)
        px[:, :] = color
        got = decode_media(encode_jpeg(px))
        err = np.abs(got.astype(int) - px.astype(int)).max()
        assert err <= 3, (color, err)  # color-transform rounding only


def test_jpeg_round_trip_property():
    """Random dimensions/content: decoded output stays within the
    quantization-error envelope of the source (uniform q-tables bound
    per-coefficient error; noise is the worst case for DCT coding)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    @settings(max_examples=10, deadline=None)
    @given(
        h=st.integers(8, 33),
        w=st.integers(8, 34),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def rt(h, w, sub, seed):
        rng = np.random.default_rng(seed)
        # smooth random field (noise defeats any transform codec);
        # CLIP rather than wrap — a modular 255→0 cliff is a genuine
        # high-frequency edge that chroma subsampling must smear
        base = rng.integers(0, 256, size=(3,))
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                np.clip(
                    base[c]
                    + yy * int(rng.integers(0, 4))
                    + xx * int(rng.integers(0, 4)),
                    0,
                    255,
                )
                for c in range(3)
            ],
            axis=-1,
        ).astype(np.uint8)
        got = decode_media(encode_jpeg(px, subsampling=sub))
        assert got.shape == px.shape
        mse = np.mean((got.astype(float) - px.astype(float)) ** 2)
        assert mse < 600, (h, w, sub, mse)  # ~20 dB floor

    rt()


def test_progressive_jpeg_decodes_identically_to_baseline():
    """SOF2 support (r07): the ten-scan successive-approximation
    stream — DC first/refine, per-band AC first at Al=2/1, AC refine
    with EOB runs and correction bits — rebuilds EXACTLY the same
    coefficients as the baseline encoding of the same pixels (same
    quantization tables), so the decodes are bit-identical."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    for shape in ((8, 8), (16, 24), (37, 53)):
        px = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        prog = encode_jpeg_progressive(px)
        # it really is progressive: SOF2 marker, many SOS scans
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
        assert prog.count(b"\xff\xda") >= 10
        dp = decode_media(prog, "image/jpeg")
        db = decode_media(encode_jpeg(px), "image/jpeg")
        assert np.array_equal(dp, db)


def test_progressive_jpeg_420_subsampled():
    """4:2:0 progressive (the common web-photo shape): interleaved DC
    scans carry 2x2 luma blocks per MCU while AC scans raster each
    component's own spec grid — which for luma can be one block short
    of the MCU-padded plane at odd dims. Decode must equal the 4:2:0
    baseline decode bit-for-bit."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(21)
    for shape in ((16, 16), (37, 53), (33, 17)):
        px = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        dp = decode_media(encode_jpeg_progressive(px, "4:2:0"))
        db = decode_media(encode_jpeg(px, "4:2:0"))
        assert np.array_equal(dp, db)


def test_progressive_jpeg_with_restart_markers():
    """DRI + RSTn inside progressive scans (real encoders emit them):
    per-interval DC-predictor and EOB-run resets on the encoder side,
    byte-aligned marker resync on the decoder side, across both
    sampling modes — decode stays bit-identical to baseline."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    px = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        db = decode_media(encode_jpeg(px, sub))
        for ri in (1, 3):
            enc = encode_jpeg_progressive(px, sub, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI
            assert any(
                bytes([0xFF, 0xD0 + m]) in enc for m in range(8)
            )
            assert np.array_equal(decode_media(enc), db)


def test_progressive_jpeg_flat_and_structured():
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    flat = np.full((24, 16, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_media(encode_jpeg_progressive(flat)), flat
    )  # solid image: DC-only spectrum reconstructs exactly
    grad = np.stack(
        [np.tile(np.arange(48, dtype=np.uint8) * 5, (32, 1))] * 3,
        axis=2,
    )
    dp = decode_media(encode_jpeg_progressive(grad))
    db = decode_media(encode_jpeg(grad))
    assert np.array_equal(dp, db)


def test_jpeg_16bit_dqt_decodes():
    """A DQT with Pq=1 carries 16-bit big-endian entries (T.81 B.2.4.1)
    — rewrite a baseline JPEG's 8-bit tables to the wide form with the
    same values and the decode must be identical."""
    import struct

    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    enc = encode_jpeg(px)
    out = bytearray()
    pos = 0
    while pos < len(enc):
        if enc[pos : pos + 2] == b"\xff\xdb":
            (seglen,) = struct.unpack_from(">H", enc, pos + 2)
            seg = enc[pos + 4 : pos + 2 + seglen]
            tq = seg[0] & 0x0F
            wide = bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", v) for v in seg[1:65]
            )
            out += b"\xff\xdb" + struct.pack(">H", len(wide) + 2) + wide
            pos += 2 + seglen
        else:
            out.append(enc[pos])
            pos += 1
    assert np.array_equal(
        decode_media(bytes(out)), decode_media(enc)
    )


def test_unsupported_sof_variants_still_gated():
    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    body = bytearray(encode_jpeg(np.full((8, 8, 3), 99, dtype=np.uint8)))
    i = body.index(b"\xff\xc0")
    body[i + 1] = 0xC3  # lossless sequential: still unsupported
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_media(bytes(body))


def test_ima_adpcm_structural_tables():
    from pipeline_kinesis_spark.operators.multimodal import (
        _IMA_ADJ,
        _IMA_STEP,
    )

    assert len(_IMA_STEP) == 89 and len(_IMA_ADJ) == 8
    assert _IMA_STEP[0] == 7 and _IMA_STEP[-1] == 32767
    assert all(b > a for a, b in zip(_IMA_STEP, _IMA_STEP[1:]))
    ratios = [b / a for a, b in zip(_IMA_STEP[8:], _IMA_STEP[9:])]
    assert all(1.05 < r < 1.15 for r in ratios)  # ~1.1x geometric


def test_ima_adpcm_round_trip_snr():
    """ADAPTIVE differential audio decode for real: a 4:1 compressed
    sine round-trips above 25 dB SNR across multiple blocks, and the
    padded final block is trimmed by the fact chunk."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_wav_ima,
    )

    t = np.arange(2500)
    # 440 Hz at 32 kHz: ~73 samples/cycle, the oversampling regime
    # ADPCM is built for (slope per sample within the step ramp)
    s = (12000 * np.sin(2 * np.pi * 440 * t / 32000)).astype(np.int16)
    body = encode_wav_ima(32000, s)
    assert len(body) < s.nbytes / 3  # ~4:1 with headers
    rate, got = decode_media(body)
    assert rate == 32000
    got = got.reshape(-1)
    assert got.shape == s.shape  # fact chunk trimmed the padding
    err = got.astype(np.float64) - s.astype(np.float64)
    snr = 10 * np.log10(
        np.mean(s.astype(np.float64) ** 2) / np.mean(err**2)
    )
    assert snr > 25, snr


def test_ima_adpcm_tracks_step_transients():
    """A hard amplitude jump forces the step index through its full
    ramp — the decoder must track the encoder's state machine exactly
    (same nibble stream → same reconstruction, block after block)."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_wav_ima,
    )

    rng = np.random.default_rng(13)
    quiet = rng.integers(-50, 50, size=600)
    loud = rng.integers(-30000, 30000, size=600)
    s = np.concatenate([quiet, loud, quiet]).astype(np.int16)
    rate, got = decode_media(encode_wav_ima(16000, s, block_align=64))
    got = got.reshape(-1)
    assert got.shape == s.shape
    # quiet tail after the loud burst: the index ramps back down and
    # small deltas are representable again within a few dozen samples
    tail = slice(len(s) - 300, len(s))
    err = np.abs(got[tail].astype(int) - s[tail].astype(int))
    assert err.max() <= 512, int(err.max())


def test_ima_adpcm_stereo_interleave():
    """Stereo fmt 0x11: per-channel headers and alternating 4-byte
    nibble groups — two independent waveforms round-trip through one
    interleaved stream without crosstalk."""
    from pipeline_kinesis_spark.operators.multimodal import (
        encode_wav_ima,
    )

    t = np.arange(1300)
    left = (11000 * np.sin(2 * np.pi * 300 * t / 32000)).astype(np.int16)
    right = (7000 * np.cos(2 * np.pi * 150 * t / 32000)).astype(np.int16)
    s = np.stack([left, right], axis=1)
    rate, got = decode_media(encode_wav_ima(32000, s))
    assert rate == 32000 and got.shape == s.shape
    for c in range(2):
        err = got[:, c].astype(float) - s[:, c].astype(float)
        snr = 10 * np.log10(
            np.mean(s[:, c].astype(float) ** 2) / np.mean(err**2)
        )
        assert snr > 25, (c, snr)
    # no crosstalk: each decoded channel correlates with ITS source,
    # not the other (the signals are orthogonal sin/cos)
    gl = got[:, 0].astype(float)
    assert abs(np.corrcoef(gl, left)[0, 1]) > 0.99
    assert abs(np.corrcoef(gl, right)[0, 1]) < 0.2


def test_dhash_distinct_classes_and_cross_codec_agreement():
    # perceptual dedup invariants the image_dhash_dedup gate leans on:
    # 17 seeded texture classes hash distinctly with wide margins, and
    # the SAME pixels hash identically whatever container carried them
    from itertools import combinations

    from pipeline_kinesis_spark.operators.multimodal import (
        dhash64,
        encode_png,
    )
    from pipeline_kinesis_spark.operators.tiff import encode_tiff

    def pattern(p):
        rng = np.random.default_rng(1000 + p)
        return rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)

    hs = [dhash64(pattern(p)) for p in range(17)]
    assert len(set(hs)) == 17
    min_ham = min(
        bin((a ^ b) & ((1 << 64) - 1)).count("1")
        for a, b in combinations(hs, 2)
    )
    assert min_ham >= 10  # measured 23; wide safety margin
    for p in (0, 9, 16):
        px = pattern(p)
        vals = {
            dhash64(decode_media(enc(px)))
            for enc in (encode_png, encode_bmp, encode_tiff)
        }
        assert len(vals) == 1
    # perceptual robustness: ±2 noise flips at most a few bits
    px = pattern(3).astype(int)
    noisy = np.clip(
        px + np.random.default_rng(0).integers(-2, 3, px.shape), 0, 255
    ).astype(np.uint8)
    flips = bin(
        (dhash64(px.astype(np.uint8)) ^ dhash64(noisy)) & ((1 << 64) - 1)
    ).count("1")
    assert flips <= 8


def test_audio_fingerprint_distinct_classes_and_containers():
    from itertools import combinations

    from pipeline_kinesis_spark.operators.flac import encode_flac
    from pipeline_kinesis_spark.operators.multimodal import (
        audio_fingerprint64,
    )

    def clip(c):
        rng = np.random.default_rng(2000 + c)
        return rng.integers(-20000, 20000, size=(512, 1)).astype(np.int16)

    hs = [audio_fingerprint64(clip(c)) for c in range(13)]
    assert len(set(hs)) == 13
    assert min(
        bin((a ^ b) & ((1 << 64) - 1)).count("1")
        for a, b in combinations(hs, 2)
    ) >= 10  # measured 20 (linear bands, no structurally-constant bits)
    for c in (0, 6, 12):
        x = clip(c)
        vals = {
            audio_fingerprint64(decode_media(encode_wav(8000, x))[1]),
            audio_fingerprint64(
                decode_media(encode_flac(8000, x, subframe="lpc"))[1]
            ),
        }
        assert len(vals) == 1


def test_resize_nearest_kernel():
    from pipeline_kinesis_spark.operators.multimodal import resize_nearest

    # identity, downscale, upscale, degenerate 1x1
    src = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    assert np.array_equal(resize_nearest(src, 6, 4), src)
    down = resize_nearest(src, 3, 2)
    assert down.shape == (3, 2, 3)
    # floor mapping: out[y,x] = in[(y*6)//3, (x*4)//2] = in[2y, 2x]
    assert np.array_equal(down, src[::2, ::2])
    up = resize_nearest(src, 12, 8)
    assert up.shape == (12, 8, 3)
    assert np.array_equal(up[::2, ::2], src)  # every source pixel kept
    one = resize_nearest(src, 1, 1)
    assert np.array_equal(one[0, 0], src[0, 0])


def test_ima_vectorized_decoder_matches_scalar_walker():
    """_ima_decode_blocks_vec steps the same state machine as
    _ima_step_nibble, vectorized across blocks — byte-identical output
    on random nibble bodies and extreme header states (predictor at
    the int16 rails, step index clamped from out-of-range)."""
    import struct

    import numpy as np

    from pipeline_kinesis_spark.operators.multimodal import (
        _ima_decode_block,
        _ima_decode_blocks_vec,
    )

    rng = np.random.default_rng(42)
    for channels in (1, 2):
        block_align = 64 * channels
        spb = (block_align - 4 * channels) * 2 // channels + 1
        blocks = []
        for bi in range(7):
            hdr = b""
            for c in range(channels):
                pred = int(
                    rng.choice([-32768, 32767, 0, 1234, -4321])
                )
                idx = int(rng.integers(0, 100))  # >88 exercises clamp
                hdr += struct.pack("<hBB", pred, idx, 0)
            body = rng.integers(
                0, 256, block_align - 4 * channels
            ).astype(np.uint8)
            blocks.append(hdr + body.tobytes())
        arr = np.frombuffer(b"".join(blocks), dtype=np.uint8).reshape(
            len(blocks), block_align
        )
        vec = _ima_decode_blocks_vec(arr, spb, channels)
        for c in range(channels):
            scalar = []
            for blk in blocks:
                scalar.extend(_ima_decode_block(blk, spb, channels)[c])
            assert vec[c].tolist() == scalar


def test_baseline_jpeg_with_restart_markers():
    """DRI + RSTn in a BASELINE scan (T.81 F.1.2.2.3): the encoder
    1-pads to a byte boundary, emits unstuffed RSTn every interval and
    resets DC predictors; the decoder's segment-based resync
    (_next_restart_segment) must land on each marker and produce the
    exact same pixels as the marker-free encoding of the same image."""
    from pipeline_kinesis_spark.operators.multimodal import encode_jpeg

    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        db = decode_media(encode_jpeg(px, sub))
        for ri in (1, 3, 7):
            enc = encode_jpeg(px, sub, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI
            assert any(
                bytes([0xFF, 0xD0 + m]) in enc for m in range(8)
            )
            assert np.array_equal(decode_media(enc), db)


def test_jpeg_truncated_entropy_stream_raises():
    """Cutting the entropy-coded body mid-stream must surface a
    decode error (zero-padded peeks at the tail may complete a
    partial symbol, but the missing blocks starve the scan), never
    return garbage pixels silently or crash with an internal
    IndexError."""
    from pipeline_kinesis_spark.operators.multimodal import (
        _decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(43)
    px = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    enc = encode_jpeg(px)
    sos = enc.find(b"\xff\xda")
    cut = enc[: sos + (len(enc) - sos) // 3]
    with pytest.raises(ValueError):
        _decode_jpeg(cut)


def test_jpeg_huffman_lut_cache_shared_tables():
    """The combined Huffman LUTs are cached by their DHT bytes:
    decoding two different images that ship identical tables must
    return the same object from _build_huff_decoder (one build per
    corpus, not per image) while still decoding each image
    correctly."""
    from pipeline_kinesis_spark.operators.multimodal import (
        _HUFF_LUT_CACHE,
        _build_huff_decoder,
    )

    bits = [0] * 16
    bits[2] = 4  # four 3-bit codes
    vals = [0, 1, 2, 3]
    a = _build_huff_decoder(list(bits), list(vals), is_dc=True)
    b = _build_huff_decoder(list(bits), list(vals), is_dc=True)
    assert a is b
    c = _build_huff_decoder(list(bits), list(vals), is_dc=False)
    assert c is not a  # DC and AC variants cache separately
    assert (bytes(bits), bytes(vals), True) in _HUFF_LUT_CACHE
