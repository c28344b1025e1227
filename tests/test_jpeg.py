"""Baseline JPEG codec tests (functions/multimodal.py:_decode_jpeg /
encode_jpeg): exact constant-block round-trips (the oracle path), an
independent IDCT cross-check, lossy-bound properties, container-feature
coverage (restart intervals, 4:2:0), and the unsupported-variant raises.
"""

from __future__ import annotations

import numpy as np
import pytest

from depositaja_spark.functions.multimodal import (
    _DCT_A,
    _decode_jpeg,
    _ZIGZAG,
    encode_jpeg,
)

RNG = np.random.default_rng(20260815)


def _const_block_image(vals: np.ndarray, channels: int = 1) -> np.ndarray:
    """12×16 grid of constant 8×8 blocks (one per byte value) → 96×128."""
    img = np.repeat(np.repeat(vals.reshape(12, 16), 8, 0), 8, 1).astype(np.uint8)
    return np.repeat(img[..., None], channels, axis=2)


def test_constant_blocks_gray_exact():
    """DC-only spectra under all-ones quant tables round-trip bit-exactly:
    DC = 8·(v−128) is integral and the float DCT/IDCT error (~1e-13) is
    far inside the 0.5 rounding margin."""
    img = _const_block_image(RNG.integers(0, 256, 192))
    h, w, c, out = _decode_jpeg(encode_jpeg(img, quality=None))
    assert (h, w, c) == (96, 128, 1)
    assert np.array_equal(out, img)


def test_constant_blocks_color_420_exact():
    """R=G=B constant blocks stay exact through the FULL color path:
    YCbCr forward (Y=v, Cb=Cr=128 after rounding), 4:2:0 chroma
    subsample of a constant plane, MCU interleave, nearest upsample,
    and YCbCr→RGB (zero chroma terms)."""
    img = _const_block_image(RNG.integers(0, 256, 192), channels=3)
    h, w, c, out = _decode_jpeg(encode_jpeg(img, quality=None, subsample=True))
    assert (h, w, c) == (96, 128, 3)
    assert np.array_equal(out, img)


def test_restart_intervals_exact():
    """DRI + RSTn markers: predictors reset per segment, bitstream
    re-aligns, and the image is unchanged vs the no-restart encode."""
    img = _const_block_image(RNG.integers(0, 256, 192), channels=3)
    plain = _decode_jpeg(encode_jpeg(img, quality=None, subsample=True))[3]
    withrst = _decode_jpeg(
        encode_jpeg(img, quality=None, subsample=True, restart_interval=7)
    )[3]
    assert np.array_equal(plain, withrst)
    assert np.array_equal(withrst, img)


def test_idct_against_direct_cosine_sum():
    """The decoder's matrix IDCT must agree with the T.81 A.3.3 formula
    computed as a direct cosine double-sum (different op order) — ±1e-9
    on raw float pixels, so rounded pixels can differ only at exact .5
    knife edges, which random integer spectra don't produce."""
    spec = RNG.integers(-200, 200, (8, 8)).astype(np.float64)
    via_matrix = _DCT_A.T @ spec @ _DCT_A
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4 * spec[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = s
    assert np.abs(via_matrix - direct).max() < 1e-9


def test_zigzag_is_a_permutation_matching_decoder():
    """Encoder zz[k] = flat[_ZIGZAG[k]] and decoder flat[_ZIGZAG[k]] =
    coef[k] must be inverses; also the table is the T.81 zig-zag (spot
    anchors)."""
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    assert _ZIGZAG[0] == 0 and _ZIGZAG[1] == 1 and _ZIGZAG[2] == 8
    assert _ZIGZAG[63] == 63


def test_noise_roundtrip_bounded_gray():
    """All-ones quant on arbitrary content: the only loss is coefficient
    rounding, so pixels move at most ±1."""
    img = RNG.integers(0, 256, (32, 40, 1)).astype(np.uint8)
    out = _decode_jpeg(encode_jpeg(img, quality=None))[3]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_noise_roundtrip_bounded_color_444():
    """Color adds YCbCr int-rounding amplified by the inverse transform
    (×1.772 worst case) — still a small bound at quant=1, 4:4:4."""
    img = RNG.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    out = _decode_jpeg(encode_jpeg(img, quality=None))[3]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_quality_ladder_monotone():
    """Lower quality → coarser quant tables → larger (or equal) error and
    smaller (or equal) files, on smooth content."""
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    img = ((xx * 2 + yy) % 256).astype(np.uint8)[..., None]
    errs, sizes = [], []
    for q in (95, 75, 40):
        raw = encode_jpeg(img, quality=q)
        out = _decode_jpeg(raw)[3]
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
        sizes.append(len(raw))
    assert errs[0] <= errs[1] <= errs[2]
    assert sizes[0] >= sizes[1] >= sizes[2]


def test_ac_coefficients_and_zrl_exercised():
    """A sparse spike pattern forces long zero runs (ZRL symbols) and
    high-frequency AC codes; quant=None keeps the round-trip within ±1."""
    img = np.zeros((16, 16, 1), np.uint8)
    img[3, 7] = 255
    img[12, 2] = 200
    out = _decode_jpeg(encode_jpeg(img, quality=None))[3]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_magic_dispatch_and_decode_media(spark):
    """JPEG payloads flow through the SAME Spark pipeline as PPM/PNG:
    decode_media returns identical pixels for a constant-block image
    encoded as PPM and as JPEG (exact path)."""
    from depositaja_spark.functions.multimodal import decode_media

    vals = RNG.integers(0, 256, 192)
    img = _const_block_image(vals, channels=3)
    ppm = b"P6\n128 96\n255\n" + img.tobytes()
    jpg = encode_jpeg(img, quality=None, subsample=True)
    df = spark.createDataFrame(
        [(0, bytearray(ppm)), (1, bytearray(jpg))], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in decode_media(df).collect()}
    assert rows[0].pixels == rows[1].pixels
    assert (rows[1].width, rows[1].height, rows[1].channels) == (128, 96, 3)


def test_decode_media_stats_matches_jvm_fold(spark):
    """r13 fusion guard: decode_media_stats must return EXACTLY the
    integers the old decode_media + codegen array-aggregate fold
    produced, for both weight modes, on mixed formats and noisy (AC
    coefficient) JPEGs — the fused kernel is a transport optimization,
    not a semantic change."""
    from pyspark.sql import functions as F

    from depositaja_spark.functions.multimodal import decode_media, decode_media_stats

    vals = RNG.integers(0, 256, 192)
    img = _const_block_image(vals, channels=3)
    ppm = b"P6\n128 96\n255\n" + img.tobytes()
    jpg = encode_jpeg(img, quality=None, subsample=True, restart_interval=24)
    noisy = encode_jpeg(
        RNG.integers(0, 256, (16, 16, 3)).astype(np.uint8), quality=75
    )  # lossy, AC coefficients + non-8-multiple-free shape
    df = spark.createDataFrame(
        [(0, bytearray(ppm)), (1, bytearray(jpg)), (2, bytearray(noisy))],
        "doc_id long, payload binary",
    )
    dec = decode_media(df)
    for weighting, wexpr in [
        (
            "position",
            "aggregate(zip_with(pixels, sequence(1, size(pixels)),"
            " (x, i) -> CAST(x AS BIGINT) * i), 0L, (acc, y) -> acc + y)",
        ),
        (
            "block8",
            "aggregate(zip_with(pixels, sequence(0, size(pixels) - 1),"
            " (x, p) -> CAST(x AS BIGINT) *"
            " (((p div channels) div (8 * width)) * (width div 8)"
            "  + (((p div channels) % width) div 8) + 1)),"
            " 0L, (acc, y) -> acc + y)",
        ),
    ]:
        want = {
            r.doc_id: (r.n_px, r.px_sum, r.px_wsum)
            for r in dec.select(
                "doc_id",
                F.size("pixels").cast("long").alias("n_px"),
                F.expr(
                    "aggregate(pixels, 0L, (acc, x) -> acc + CAST(x AS BIGINT))"
                ).alias("px_sum"),
                F.expr(wexpr).alias("px_wsum"),
            ).collect()
        }
        got = {
            r.doc_id: (r.n_px, r.px_sum, r.px_wsum)
            for r in decode_media_stats(df, weighting=weighting).collect()
        }
        assert got == want, weighting
    with pytest.raises(ValueError, match="weighting"):
        decode_media_stats(df, weighting="nope")


def test_unsupported_variants_raise():
    img = _const_block_image(RNG.integers(0, 256, 192))
    raw = bytearray(encode_jpeg(img, quality=None))
    # flip SOF0 (0xC0) to SOF2 (progressive): must raise, not mis-decode
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        _decode_jpeg(bytes(raw))
    with pytest.raises(ValueError, match="multiples"):
        encode_jpeg(np.zeros((10, 10, 1), np.uint8))
    with pytest.raises(NotImplementedError):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))


def test_truncated_stream_raises():
    img = _const_block_image(RNG.integers(0, 256, 192))
    raw = encode_jpeg(img, quality=None)
    with pytest.raises(Exception):
        _decode_jpeg(raw[: len(raw) // 2])


# --- hypothesis fuzz: the Huffman/bitstream path -----------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h8=st.integers(1, 4),
        w8=st.integers(1, 4),
        channels=st.sampled_from([1, 3]),
        quality=st.sampled_from([None, 95, 75, 40, 5]),
        seed=st.integers(0, 2**32 - 1),
        rst=st.sampled_from([0, 1, 3]),
    )
    def test_fuzz_roundtrip_never_crashes_and_bounded(
        h8, w8, channels, quality, seed, rst
    ):
        """Any 8-multiple geometry × channel count × quality × restart
        interval × random content must encode to a decodable stream with
        the right shape; at quant=None the error bound is the rounding
        bound (gray ±1; color ±6 through YCbCr)."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (8 * h8, 8 * w8, channels)).astype(np.uint8)
        raw = encode_jpeg(img, quality=quality, restart_interval=rst)
        h, w, c, out = _decode_jpeg(raw)
        assert (h, w, c) == img.shape
        if quality is None:
            bound = 1 if channels == 1 else 6
            assert np.abs(out.astype(int) - img.astype(int)).max() <= bound

    @settings(max_examples=15, deadline=None)
    @given(
        h16=st.integers(1, 3),
        w16=st.integers(1, 3),
        quality=st.sampled_from([None, 85, 30]),
        seed=st.integers(0, 2**32 - 1),
    )
    def test_fuzz_420_roundtrip(h16, w16, quality, seed):
        """4:2:0 MCU interleave at any 16-multiple geometry: decodable,
        right shape, and exact for R=G=B constant-block content."""
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 256, (2 * h16) * (2 * w16))
        img = np.repeat(
            np.repeat(vals.reshape(2 * h16, 2 * w16), 8, 0), 8, 1
        ).astype(np.uint8)
        img = np.repeat(img[..., None], 3, axis=2)
        raw = encode_jpeg(img, quality=quality, subsample=True)
        h, w, c, out = _decode_jpeg(raw)
        assert (h, w, c) == img.shape
        if quality is None:
            assert np.array_equal(out, img)

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
