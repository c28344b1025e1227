"""GIF/LZW codec tests: round-trip exactness across shapes and palette
sizes, the variable-width/dictionary-reset LZW regime, interlaced-frame
deinterlacing, 89a extension-block skipping, and the registered
gif_decode_stats pipeline (its engine↔oracle value equality runs in
tests/test_oracle.py like every other registered query)."""

from __future__ import annotations

import numpy as np
import pytest

from depositaja_spark.functions.multimodal import (
    _decode_gif,
    _decode_image_bytes,
    _lzw_decode,
    _lzw_encode,
    encode_gif,
)

SF = "/root/testdata/sf0.001"


def _rand_img(rng, h, w, ncol):
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    return pal[rng.randint(0, ncol, (h, w))]


@pytest.mark.parametrize(
    "shape,ncol",
    [((8, 8), 64), ((16, 16), 200), ((40, 37), 256), ((1, 1), 1), ((64, 64), 2)],
)
def test_gif_roundtrip_exact(shape, ncol):
    rng = np.random.RandomState(hash((shape, ncol)) % 2**31)
    img = _rand_img(rng, shape[0], shape[1], ncol)
    h, w, c, out = _decode_gif(encode_gif(img))
    assert (h, w, c) == (shape[0], shape[1], 3)
    assert np.array_equal(out, img)


def test_gif_roundtrip_grayscale_and_dispatch():
    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    raw = encode_gif(g)
    assert raw[:6] == b"GIF89a"
    h, w, c, out = _decode_image_bytes(raw)  # magic dispatch path
    assert (h, w, c) == (8, 8, 3)
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_gif_dictionary_reset_regime():
    """A 200×200 image walks LZW through every code width up to 12 bits
    and past the 4096-entry reset — round-trip must stay exact."""
    rng = np.random.RandomState(3)
    img = _rand_img(rng, 200, 200, 250)
    h, w, c, out = _decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_lzw_kwkwk_case():
    """The code-not-yet-in-table (KwKwK) branch: 'aaaa...' emits a code
    one ahead of the decoder's table — decode must reconstruct it."""
    idx = np.zeros(50, np.int64)  # runs of one symbol maximize KwKwK hits
    assert _lzw_decode(_lzw_encode(idx, 2), 2) == [0] * 50
    idx2 = np.array([0, 1] * 40 + [0] * 30, np.int64)
    assert _lzw_decode(_lzw_encode(idx2, 2), 2) == idx2.tolist()


def test_gif_interlaced_frame_deinterlaces():
    """Hand-build an interlaced stream by reordering a plain encode's
    index rows into pass order and setting the interlace flag — decode
    must restore original row order."""
    rng = np.random.RandomState(5)
    img = _rand_img(rng, 16, 8, 30)
    plain = encode_gif(img)
    # parse the plain stream enough to rebuild it interlaced
    pal_bits = (plain[10] & 0x07) + 1
    gct_len = 3 * (1 << pal_bits)
    hdr_end = 13 + gct_len
    # image descriptor is next: 10 bytes, then min_code, then sub-blocks
    assert plain[hdr_end] == 0x2C
    desc = bytearray(plain[hdr_end : hdr_end + 10])
    min_code = plain[hdr_end + 10]
    # decode the index stream from the plain file
    pos = hdr_end + 11
    chunks = []
    while plain[pos] != 0:
        ln = plain[pos]
        chunks.append(plain[pos + 1 : pos + 1 + ln])
        pos += 1 + ln
    idx = np.array(_lzw_decode(b"".join(chunks), min_code), np.int64).reshape(16, 8)
    order = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s, 16, st)]
    inter = idx[order]  # rows in transmission (pass) order
    desc[9] |= 0x40  # set interlace flag
    comp = _lzw_encode(inter.reshape(-1), min_code)
    out = bytearray(plain[:hdr_end]) + desc + bytes([min_code])
    for i in range(0, len(comp), 255):
        ch = comp[i : i + 255]
        out.append(len(ch))
        out += ch
    out += b"\x00\x3b"
    h, w, c, dec = _decode_gif(bytes(out))
    assert np.array_equal(dec, img)


def test_gif_89a_extension_blocks_skipped():
    """A graphic-control extension before the frame must be skipped."""
    rng = np.random.RandomState(9)
    img = _rand_img(rng, 8, 8, 16)
    plain = encode_gif(img)
    pal_bits = (plain[10] & 0x07) + 1
    hdr_end = 13 + 3 * (1 << pal_bits)
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE + terminator
    patched = plain[:hdr_end] + gce + plain[hdr_end:]
    h, w, c, out = _decode_gif(patched)
    assert np.array_equal(out, img)


def test_gif_too_many_colors_raises():
    img = np.array(
        [[(i % 256, (i // 256) % 256, 7) for i in range(r * 30, r * 30 + 30)]
         for r in range(30)],
        dtype=np.uint8,
    )
    with pytest.raises(NotImplementedError, match="256 distinct colors"):
        encode_gif(img)


def test_gif_decode_stats_query_runs(spark):
    from depositaja_spark import registry

    rows = registry.QUERIES["gif_decode_stats"](spark, SF).collect()
    assert rows and all(r.n_px == 192 for r in rows)
    # stats must equal the raw-bytes recomputation for a spot row
    from depositaja_spark.sources import load_table

    doc = load_table(spark, SF, "documents").where("doc_id = 0").collect()[0]
    body = doc.text.encode("utf-8")[:192].ljust(192, b" ")
    want_sum = sum(body)
    want_wsum = sum((i + 1) * v for i, v in enumerate(body))
    got = {r.doc_id: r for r in rows}[0]
    assert (got.px_sum, got.px_wsum) == (want_sum, want_wsum)


def test_lzw_roundtrip_hypothesis():
    """Property: LZW encode∘decode is identity for any index stream and
    any legal min code size — the bitstream fuzz of the GIF path (the
    jpeg-test convention)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(min_value=2, max_value=8).flatmap(
            lambda mcs: st.tuples(
                st.just(mcs),
                st.lists(
                    st.integers(min_value=0, max_value=(1 << mcs) - 1),
                    min_size=0,
                    max_size=600,
                ),
            )
        )
    )
    def check(case):
        mcs, idx = case
        arr = np.array(idx, np.int64)
        assert _lzw_decode(_lzw_encode(arr, mcs), mcs) == idx

    check()


def test_jw_hypothesis_parity_with_duckdb(spark):
    """Property: the Arrow JW scorer equals DuckDB's native
    jaro_winkler_similarity on arbitrary short ASCII strings (the
    oracle recomputes every registered score, so this parity IS the
    correctness surface)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # exercise the plain python kernel directly (the pandas UDF wraps it
    # 1:1); matched/transposed-heavy alphabets stress the window logic
    from depositaja_spark.functions import fuzzy as fz

    con = duckdb.connect()

    # call the scorer through 1-row pandas batches instead of standing
    # up Spark (the pandas UDF wraps the kernel 1:1)
    import pandas as pd

    udf = fz.jaro_winkler_udf()
    kernel = udf.func  # the pandas function under the decorator

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(alphabet="abcz", min_size=0, max_size=12),
        st.text(alphabet="abcz", min_size=0, max_size=12),
    )
    def check(a, b):
        got = float(kernel(pd.Series([a]), pd.Series([b])).iloc[0])
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(got - want) < 1e-12, (a, b, got, want)

    check()


def test_gif_full_codec_hypothesis():
    """Property: encode∘decode is identity for arbitrary small paletted
    images (shape and palette size drawn by hypothesis, pixels seeded
    deterministically per example)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=256),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, ncol, seed):
        rng = np.random.RandomState(seed)
        img = _rand_img(rng, h, w, min(ncol, h * w * 4))
        hh, ww, c, out = _decode_gif(encode_gif(img))
        assert (hh, ww, c) == (h, w, 3)
        assert np.array_equal(out, img)

    check()
