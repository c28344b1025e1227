"""Behavioral tests for the LLM-pipeline extensions — properties the
oracle diff can't express (recall of approximate methods, stub plumbing)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions import dedup as dd
from depositaja_spark.functions import multimodal as mm
from depositaja_spark.functions import similarity as sim
from depositaja_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_lsh_recalls_strong_near_dups(spark, docs):
    """Pairs with very high true Jaccard must appear among LSH candidates
    (with 4 bands × 4 rows, P[candidate] = 1-(1-J^4)^4 ≈ 1 for J ≥ 0.9)."""
    strong = {
        (r.a_id, r.b_id)
        for r in dd.jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert strong, "corpus should contain planted near-duplicates"
    cands = {
        (r.a_id, r.b_id)
        for r in dd.lsh_candidate_pairs(dd.minhash_signatures(docs)).collect()
    }
    assert strong <= cands, f"LSH missed strong pairs: {strong - cands}"


def test_minhash_estimates_jaccard(spark, docs):
    """Signature agreement rate ≈ true Jaccard for the strongest pair."""
    top = (
        dd.jaccard_pairs(docs, threshold=0.5)
        .orderBy(F.desc("jaccard"))
        .limit(1)
        .collect()
    )
    assert top
    a_id, b_id, true_j = top[0].a_id, top[0].b_id, top[0].jaccard
    sigs = {
        r.doc_id: [r[f"mh_{i}"] for i in range(dd.MINHASH_K)]
        for r in dd.minhash_signatures(docs)
        .filter(F.col("doc_id").isin([a_id, b_id]))
        .collect()
    }
    agree = sum(x == y for x, y in zip(sigs[a_id], sigs[b_id])) / dd.MINHASH_K
    assert abs(agree - true_j) < 0.35  # k=16 → coarse but unbiased


def test_prefix_jaccard_equals_brute_force(spark):
    """Prefix filtering is LOSSLESS: on collision-heavy corpora (tiny
    alphabet → many boundary-Jaccard pairs) the prefix-filtered join
    must equal a pure-Python all-pairs computation exactly — including
    pairs sitting right at the threshold, where an off-by-one prefix
    length would silently drop candidates."""
    import random

    for seed, thr in [(1, 0.2), (2, 0.5), (3, 0.34), (4, 0.8)]:
        rng = random.Random(seed)
        words = ["aa", "bb", "cc", "dd", "ee", "ff"]
        corpus = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randint(5, 30))))
            for i in range(12)
        ]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            (r.a_id, r.b_id): r.jaccard
            for r in dd.prefix_jaccard_pairs(docs, n=3, threshold=thr).collect()
        }

        def shingle_set(text):
            t = text.split(" ")
            return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

        want = {}
        for i, (a_id, a_txt) in enumerate(corpus):
            for b_id, b_txt in corpus[i + 1 :]:
                sa, sb = shingle_set(a_txt), shingle_set(b_txt)
                inter = len(sa & sb)
                j = round(inter / (len(sa) + len(sb) - inter), 6)
                if j >= thr:
                    want[(a_id, b_id)] = j
        assert got == want, f"seed={seed} thr={thr}"


def test_prefix_jaccard_matches_uncapped_jaccard_pairs(spark, docs):
    """On the real fixture the prefix-filtered join must equal
    jaccard_pairs with the df cap disabled (same universe, same score)."""
    thr = 0.2
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in dd.prefix_jaccard_pairs(docs, n=3, threshold=thr).collect()
    }
    want = {
        (r.a_id, r.b_id): r.jaccard
        for r in dd.jaccard_pairs(docs, n=3, threshold=thr, max_df=None).collect()
    }
    assert got == want and got


def test_simhash_close_for_near_dups(spark, docs):
    """The strongest Jaccard pair should be close in SimHash space, and a
    random dissimilar pair far."""
    top = dd.jaccard_pairs(docs, threshold=0.9).limit(1).collect()[0]
    sig = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    ham_near = bin(sig[top.a_id] ^ sig[top.b_id]).count("1")
    assert ham_near <= 6
    some_other = next(d for d in sig if d not in (top.a_id, top.b_id))
    ham_far = bin(sig[top.a_id] ^ sig[some_other]).count("1")
    assert ham_far > ham_near


def test_ann_lsh_recall_vs_brute(spark, emb):
    """Bucketed ANN must agree with brute force on a meaningful fraction
    of top-k (it only searches the query's bucket)."""
    queries = emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
    brute = {
        (r.query_id, r.cand_id) for r in sim.cosine_topk(emb, queries).collect()
    }
    approx = {(r.query_id, r.cand_id) for r in sim.ann_topk_lsh(emb).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"
    # approximate results are a subset of each query's bucket — correctness
    # of the bucket join itself is covered by the DuckDB oracle


def test_multimodal_features_plumbing(spark, docs):
    """mapInPandas feature extraction: typed output, normalized histogram,
    deterministic across runs."""
    payloads = mm.attach_payload(docs.limit(20))
    feats = mm.extract_features(payloads)
    rows = {r.doc_id: r.features for r in feats.collect()}
    assert len(rows) == 20
    for v in rows.values():
        assert len(v) == mm.FEATURE_BINS
        assert math.isclose(sum(v), 1.0, abs_tol=1e-3)
    rows2 = {r.doc_id: r.features for r in mm.extract_features(payloads).collect()}
    assert rows == rows2


def test_recover_exact_count_bound(spark):
    """multimodal_features' float recovery n = HALF_UP(value·total) is
    exact only while total < 1e6 (kernel-float error ≤ 5e-7·total must
    stay under the 0.5 margin) — in range it recovers the count, past
    the bound it must raise LOUDLY instead of hashing a wrong n (r12
    ADVICE)."""
    from depositaja_spark.queries_ext import _recover_exact_count

    ok = spark.createDataFrame(
        [(round(32 / 128, 6), 128), (round(7 / 999_999, 6), 999_999)],
        "raw double, total long",
    )
    got = [
        r.n
        for r in ok.select(
            _recover_exact_count(F.col("raw"), F.col("total")).alias("n")
        ).orderBy(F.desc("total")).collect()
    ]
    assert got == [7, 32]
    big = spark.createDataFrame([(0.25, 1_000_000)], "raw double, total long")
    with pytest.raises(Exception, match="float-recovery bound"):
        big.select(
            _recover_exact_count(F.col("raw"), F.col("total")).alias("n")
        ).collect()


def _synthetic_images(spark):
    """One P6 PPM, one P5 PGM, one bottom-up 24-bit BMP — tiny images with
    hand-checkable pixel values."""
    import struct as _st

    # 2×2 RGB PPM: red, green / blue, white (row-major top-down)
    ppm = b"P6\n# comment\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )
    # 3×1 grayscale PGM
    pgm = b"P5\n3 1\n255\n" + bytes([10, 128, 250])
    # 2×2 24-bit BMP, bottom-up, BGR, rows padded to 4 bytes (2*3=6 → 8)
    # stored rows: bottom row first = [blue, white], top row = [red, green]
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    data = row_bottom + row_top
    bmp = (
        b"BM"
        + _st.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
        + _st.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )
    return spark.createDataFrame(
        [(0, bytearray(ppm)), (1, bytearray(pgm)), (2, bytearray(bmp))],
        "doc_id long, payload binary",
    )


def test_decode_media_ppm_pgm_bmp(spark):
    """The vendored decoder recovers exact pixels from all three formats;
    the BMP (bottom-up, BGR, padded rows) matches the PPM top-down RGB."""
    got = {r.doc_id: r for r in mm.decode_media(_synthetic_images(spark)).collect()}
    assert (got[0].height, got[0].width, got[0].channels) == (2, 2, 3)
    assert got[0].pixels == [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    assert (got[1].height, got[1].width, got[1].channels) == (1, 3, 1)
    assert got[1].pixels == [10, 128, 250]
    # BMP decodes to the same RGB top-down raster as the PPM
    assert got[2].pixels == got[0].pixels


def test_png_roundtrip_all_filters():
    """encode_png cycles row filters y % 5, so any image with ≥5 rows
    round-trips through every filter type (None/Sub/Up/Average/Paeth);
    decode must recover exact pixels for RGB and grayscale at several
    shapes, including widths that stress the bpp-lane arithmetic."""
    import numpy as np

    from depositaja_spark.functions.multimodal import (
        _decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for h, w, c in [(8, 8, 3), (5, 1, 3), (7, 13, 1), (6, 3, 3), (5, 2, 1)]:
        arr = rng.randint(0, 256, (h, w, c), dtype=np.uint8)
        hh, ww, cc, out = _decode_png(encode_png(arr))
        assert (hh, ww, cc) == (h, w, c)
        assert np.array_equal(out, arr), f"shape {(h, w, c)}"


def test_png_color_types_and_unsupported():
    """Hand-built PNGs (stdlib zlib, filter-0 rows): palette (type 3)
    expands through PLTE to RGB, RGBA (6) and gray+alpha (4) drop alpha
    — same conventions as the BMP decoder; 16-bit depth raises the
    documented NotImplementedError."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from depositaja_spark.functions.multimodal import _PNG_MAGIC, _decode_png

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    def png(w, h, depth, ctype, rows, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (
            _PNG_MAGIC + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    # palette: 2×1, indexes 1, 0 into [red, green]
    plte = chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    h, w, c, px = _decode_png(png(2, 1, 8, 3, [bytes([1, 0])], plte))
    assert (h, w, c) == (1, 2, 3)
    assert px.tolist() == [[[0, 255, 0], [255, 0, 0]]]

    # RGBA 1×2: alpha dropped
    rows = [bytes([10, 20, 30, 255]), bytes([40, 50, 60, 0])]
    h, w, c, px = _decode_png(png(1, 2, 8, 6, rows))
    assert (h, w, c, px.tolist()) == (2, 1, 3, [[[10, 20, 30]], [[40, 50, 60]]])

    # gray+alpha 2×1
    h, w, c, px = _decode_png(png(2, 1, 8, 4, [bytes([7, 255, 9, 0])]))
    assert (h, w, c, px.tolist()) == (1, 2, 1, [[[7], [9]]])

    with pytest.raises(NotImplementedError, match="depth=16"):
        _decode_png(png(1, 1, 16, 0, [bytes([0, 0])]))


def test_png_flows_through_decode_media_and_ahash(spark):
    """PNG payloads flow through the SAME Spark pipeline as PPM/BMP:
    decode_media recovers exact pixels, and image_ahash over a PNG
    payload equals the hash of the identical pixels shipped as PPM —
    codec-invariance of the perceptual signature."""
    import numpy as np

    from depositaja_spark.functions.multimodal import encode_png

    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    ppm = b"P6\n8 8\n255\n" + arr.tobytes()
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(arr))), (1, bytearray(ppm))],
        "doc_id long, payload binary",
    )
    dec = {r.doc_id: r for r in mm.decode_media(df).collect()}
    assert dec[0].pixels == dec[1].pixels == arr.reshape(-1).tolist()
    hashes = {r.doc_id: r.ahash for r in mm.image_ahash(df).collect()}
    assert hashes[0] == hashes[1]


def test_resize_images_roundtrip(spark):
    """Nearest-neighbor 2×2→4×4 upsample: each source pixel becomes a 2×2
    block; output re-decodes through the same codec (payload→payload)."""
    imgs = _synthetic_images(spark).filter("doc_id = 0")
    out = mm.resize_images(imgs, 4, 4)
    (row,) = out.collect()
    assert row.media_meta.mime_type == "image/x-portable-pixmap"
    assert row.media_meta.byte_len == len(bytes(row.payload))
    (dec,) = mm.decode_media(
        spark.createDataFrame(
            [(0, bytearray(bytes(row.payload)))], "doc_id long, payload binary"
        )
    ).collect()
    assert (dec.height, dec.width) == (4, 4)
    px = [dec.pixels[i : i + 3] for i in range(0, len(dec.pixels), 3)]
    grid = [px[r * 4 : (r + 1) * 4] for r in range(4)]
    # top-left 2×2 block is the source's red pixel
    assert grid[0][0] == grid[0][1] == grid[1][0] == grid[1][1] == [255, 0, 0]
    # bottom-right 2×2 block is the source's white pixel
    assert grid[2][2] == grid[3][3] == [255, 255, 255]


def test_audio_features_wav(spark):
    """Synthetic 16-bit PCM WAV (440 Hz sine, 8 kHz, 0.5 s): the vendored
    RIFF decoder recovers rate/duration, RMS ≈ A/√2, and the zero-crossing
    rate ≈ 2·f/rate."""
    import struct as _st

    import numpy as np

    rate, freq, amp, secs = 8000, 440.0, 0.5, 0.5
    t = np.arange(int(rate * secs)) / rate
    samples = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    data = samples.tobytes()
    wav = (
        b"RIFF"
        + _st.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + _st.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + _st.pack("<I", len(data))
        + data
    )
    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id long, payload binary")
    (row,) = mm.audio_features(df).collect()
    assert row.sample_rate == rate and row.channels == 1
    assert row.duration_s == pytest.approx(secs, abs=1e-6)
    assert row.rms == pytest.approx(amp / math.sqrt(2), rel=0.01)
    assert row.zero_crossing_rate == pytest.approx(2 * freq / rate, rel=0.02)
    assert row.peak == pytest.approx(amp, rel=0.01)


def test_frame_sample_y4m(spark):
    """YUV4MPEG2 demux: a 5-frame 4×2 C420 stream sampled every 2nd frame
    yields frames 0, 2, 4 with exact bytes."""
    w, h = 4, 2
    fb = w * h * 3 // 2  # C420: 12 bytes/frame
    frames = [bytes([i * 10 + j for j in range(fb)]) for i in range(5)]
    y4m = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )
    df = spark.createDataFrame([(3, bytearray(y4m))], "doc_id long, payload binary")
    rows = {r.frame_idx: r for r in mm.frame_sample(df, every_n=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    for i in (0, 2, 4):
        assert (rows[i].width, rows[i].height) == (w, h)
        assert bytes(rows[i].frame) == frames[i]


def test_multimodal_unsupported_formats_raise(spark, docs):
    """Compressed/unknown formats raise a clear NotImplementedError from
    the executor (the PIL/pyav slot-in points)."""
    payloads = mm.attach_payload(docs.limit(1))
    # text payloads are neither a supported image nor a y4m stream
    with pytest.raises(Exception, match="NotImplementedError|only PPM"):
        mm.decode_media(payloads).collect()
    with pytest.raises(Exception, match="NotImplementedError|YUV4MPEG2"):
        mm.frame_sample(payloads).collect()


def test_clean_corpus_pipeline(spark, docs):
    """Pipeline invariants the oracle diff can't see: survivors are a
    subset of the corpus, carry no residual near-dup pair, no residual
    exact duplicate, and every survivor passes the gates."""
    from depositaja_spark.plans.corpus_pipeline import (
        MIN_ALPHA,
        MIN_TOKENS,
        NEAR_DUP_THRESHOLD,
        clean_corpus,
    )

    kept = clean_corpus(docs)
    rows = kept.collect()
    assert rows, "pipeline should keep most of the corpus"
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    kept_ids = {r.doc_id for r in rows}
    assert kept_ids <= all_ids
    assert len(kept_ids) == len(rows), "one row per kept doc"

    for r in rows:
        assert r.n_tokens >= MIN_TOKENS
        assert r.predicted_lang != "und"

    survivors = docs.join(
        kept.select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    # no two survivors share content
    n_distinct = survivors.select(F.md5("text")).distinct().count()
    assert n_distinct == len(rows)
    # no near-dup pair survives intact (the closure keeps only cluster minima)
    residual = dd.jaccard_pairs(survivors, threshold=NEAR_DUP_THRESHOLD).count()
    assert residual == 0, f"{residual} near-dup pairs survived dedup"


def test_simhash_banded_equals_all_pairs(spark, docs):
    """Bit-slice banding with bands > max_hamming must reproduce the
    all-pairs Hamming join exactly (pigeonhole guarantee, not an
    approximation)."""
    want = {
        (r.a_id, r.b_id, r.hamming)
        for r in dd.simhash_near_pairs(docs, max_hamming=6).collect()
    }
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in dd.simhash_near_pairs_banded(docs, max_hamming=6).collect()
    }
    assert want, "corpus should contain simhash near-dups"
    assert got == want


def test_embedding_banded_equals_all_pairs(spark, emb):
    """The banded SRP near-dup join must reproduce the all-pairs
    evaluation of the same (srp_hamming ≤ d, cos ≥ τ) criterion exactly
    — pigeonhole (max_hamming ≤ bands-1) guarantees every qualifying
    pair collides in at least one band."""
    sigs = sim.with_srp_signature(emb).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "sig"
    )
    a = sigs.select(
        F.col("id").alias("a_id"), F.col("vec").alias("avec"), F.col("sig").alias("asig")
    )
    b = sigs.select(
        F.col("id").alias("b_id"), F.col("vec").alias("bvec"), F.col("sig").alias("bsig")
    )
    allpairs = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("asig").bitwiseXOR(F.col("bsig"))).cast("int"),
        )
        .filter(F.col("hamming") <= sim.NEARDUP_MAX_HAMMING)
        .withColumn("cos", F.round(sim.cosine(F.col("avec"), F.col("bvec")), 6))
        .filter(F.col("cos") >= 0.4)
        .select("a_id", "b_id", "hamming", "cos")
    )
    want = {tuple(r) for r in allpairs.collect()}
    got = {
        tuple(r)
        for r in sim.embedding_near_dup_banded(emb, threshold=0.4).collect()
    }
    assert want, "fixture should contain qualifying SRP near-dup pairs"
    assert got == want


def test_ivf_layout_prunes_partitions(spark, emb, tmp_path):
    """The cell-partitioned layout must (a) return exactly the same
    top-k as the in-memory IVF path and (b) scan only the probed cells
    (static PartitionFilters in the parquet scan)."""
    path = str(tmp_path / "ivf_layout")
    sim.ivf_write_layout(emb, path)

    got = sim.ann_topk_ivf_layout(spark, path)
    want = sim.ann_topk_ivf(emb)
    as_set = lambda df: {
        (r.query_id, r.cand_id, r.cos, r.rank) for r in df.collect()
    }
    assert as_set(got) == as_set(want)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell IN" in plan or "cell#" in plan


def test_quantized_topk_recall(spark, emb):
    """Int8 quantization must preserve nearly all top-k structure: recall
    vs the exact float scan ≥ 0.8 over the demo query set."""
    exact = {
        (r.query_id, r.cand_id)
        for r in sim.cosine_topk(
            emb, emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
        ).collect()
    }
    quant = {
        (r.query_id, r.cand_id) for r in sim.ann_topk_quantized(emb).collect()
    }
    assert len(quant & exact) / len(exact) >= 0.8


def test_line_dedup_identity_when_cap_infinite(spark):
    """With an effectively infinite df cap nothing is boilerplate: the
    reassembled clean_text must equal the original text (tokens joined
    by single spaces — which IS the fixture text format)."""
    from depositaja_spark.queries_curate import _LINE
    from pyspark.sql import functions as F
    from depositaja_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(_LINE)).cast("int")
    lines = docs.select(
        "doc_id", "text", toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("pos"),
    ).select(
        "doc_id", "text",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(F.slice(F.col("toks"), F.col("pos") * _LINE + 1, _LINE), " ").alias("line"),
    )
    rebuilt = (
        lines.groupBy("doc_id", "text")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s.line
                ),
                " ",
            ).alias("clean")
        )
    )
    bad = rebuilt.filter(F.col("clean") != F.col("text")).count()
    assert bad == 0


def test_winnow_guarantee_shared_span_shares_fingerprint(spark):
    """Winnowing's core guarantee: two documents sharing a token span of
    length ≥ w+k-1 share at least one fingerprint hash."""
    from depositaja_spark.functions import text as tx
    from depositaja_spark import registry
    from pyspark.sql import functions as F

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = w+k-1
    rows = [
        (9001, f"one two three {span} four five six"),
        (9002, f"seven eight {span} nine ten eleven twelve"),
        (9003, "completely different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # replicate the registered query's operator body over this frame
    import depositaja_spark.queries_curate as qc
    from pyspark.sql import Window as W

    toks = tx.tokens("text")
    kg = df.select(
        "doc_id", toks.alias("toks"),
        (F.size(toks) - qc._WK + 1).alias("n_kg"),
        F.explode(F.sequence(F.lit(1), F.size(toks) - qc._WK + 1)).alias("i"),
    ).select(
        "doc_id",
        (F.col("i") - 1).cast("int").alias("pos"),
        (tx.hash64(F.array_join(F.slice("toks", F.col("i"), qc._WK), " ")) % tx.FP_MOD).alias("h"),
        "n_kg",
    )
    enc = kg.select("doc_id", "pos", "n_kg", (F.col("h") * qc._WM - F.col("pos")).alias("e"))
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.currentRow, qc._WW - 1)
    win = enc.select(
        "doc_id", F.col("pos").alias("win_start"), "n_kg", F.min("e").over(w).alias("me")
    ).filter(F.col("win_start") <= F.col("n_kg") - qc._WW)
    fp = win.select(
        "doc_id", F.expr(f"(me + {qc._WM - 1}) div {qc._WM}").alias("fp_hash")
    ).distinct()
    sets = {r.doc_id: set() for r in df.select("doc_id").collect()}
    for r in fp.collect():
        sets[r.doc_id].add(r.fp_hash)
    assert sets[9001] & sets[9002], "shared span must share a fingerprint"
    assert not (sets[9001] & sets[9003])


def test_decode_bmp_variants(spark):
    """32-bpp (BGRA, alpha dropped) and top-down (negative height) BMPs
    decode to the same RGB raster as the canonical bottom-up 24-bpp."""
    import struct as _st

    def bmp(data, w, h, bpp):
        return (
            b"BM"
            + _st.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
            + _st.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(data), 0, 0, 0, 0)
            + data
        )

    # 2×2 pixels: top row [red, green], bottom row [blue, white]
    want = [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    # 32bpp bottom-up: BGRA rows, no padding needed (8 bytes/row)
    rows32 = (
        bytes([255, 0, 0, 7]) + bytes([255, 255, 255, 7])  # bottom: blue, white
        + bytes([0, 0, 255, 7]) + bytes([0, 255, 0, 7])    # top: red, green
    )
    # 24bpp top-down (negative height): rows in display order, padded to 8
    rows24td = (
        bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
        + bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    )
    df = spark.createDataFrame(
        [(0, bytearray(bmp(rows32, 2, 2, 32))), (1, bytearray(bmp(rows24td, 2, -2, 24)))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in mm.decode_media(df).collect()}
    for i in (0, 1):
        assert (got[i].height, got[i].width, got[i].channels) == (2, 2, 3)
        assert got[i].pixels == want


def test_audio_features_8bit_stereo(spark):
    """8-bit unsigned stereo WAV: channels recovered, mono mix averages
    them (L = +A sine, R = -A sine → mix ≈ silence; L alone has RMS)."""
    import struct as _st

    import numpy as np

    rate = 8000
    t = np.arange(rate // 4) / rate
    wave = np.sin(2 * np.pi * 200.0 * t)
    left = (128 + 100 * wave).astype("u1")
    right = (128 - 100 * wave).astype("u1")
    inter = np.empty(2 * len(left), dtype="u1")
    inter[0::2], inter[1::2] = left, right
    data = inter.tobytes()
    wav = (
        b"RIFF" + _st.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + _st.pack("<IHHIIHH", 16, 1, 2, rate, rate * 2, 2, 8)
        + b"data" + _st.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    (row,) = mm.audio_features(df).collect()
    assert row.channels == 2 and row.sample_rate == rate
    # perfectly anti-phase channels cancel in the mono mix (u8 rounding
    # leaves a sub-1% floor)
    assert row.rms < 0.01
    assert row.duration_s == pytest.approx(0.25, abs=1e-6)


def test_frame_sample_c444_and_mono(spark):
    """Colorspace-dependent frame sizes: C444 = 3·w·h, Cmono = w·h."""
    def y4m(cs, frame_bytes, n=3):
        frames = [bytes([i] * frame_bytes) for i in range(n)]
        return b"YUV4MPEG2 W2 H2 " + cs + b"\n" + b"".join(
            b"FRAME\n" + f for f in frames
        )

    df = spark.createDataFrame(
        [(0, bytearray(y4m(b"C444", 12))), (1, bytearray(y4m(b"Cmono", 4)))],
        "doc_id long, payload binary",
    )
    rows = mm.frame_sample(df, every_n=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 3 and len(by_doc[1]) == 3
    assert all(len(bytes(r.frame)) == 12 for r in by_doc[0])
    assert all(len(bytes(r.frame)) == 4 for r in by_doc[1])
    assert bytes(by_doc[1][2].frame) == bytes([2] * 4)


def test_chunk_count_stays_below_oracle_cap(spark):
    """The training_export oracle enumerates chunk ids from
    range(0, ORACLE_CHUNK_CAP); the Spark side is unbounded.  Assert the
    test corpus sits far below the shared cap so the two engines cannot
    silently diverge on a long document (ADVICE r4: the cap must be a
    shared constant, not a magic 1000 in the SQL)."""
    from depositaja_spark.queries_ext import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        ORACLE_CHUNK_CAP,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = F.size(F.split(F.col("text"), " "))
    max_chunks = (
        docs.select(
            F.greatest(
                F.lit(1),
                F.ceil((n - F.lit(_CHUNK_SIZE)) / F.lit(_CHUNK_STRIDE) + 1),
            ).alias("nc")
        )
        .agg(F.max("nc"))
        .first()[0]
    )
    assert max_chunks < ORACLE_CHUNK_CAP / 10, (
        f"corpus max chunks/doc {max_chunks} is within 10x of the oracle "
        f"cap {ORACLE_CHUNK_CAP} — raise the cap or chunk coarser"
    )


# --- perceptual hashing (aHash) ----------------------------------------------


def _ppm(w, h, pix):
    """Build a P6 payload from an h×w×3 nested list."""
    import numpy as np

    arr = np.array(pix, dtype="uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def test_ahash_matches_pure_python_replay(spark):
    """image_ahash must equal an independent per-image Python fold of the
    documented definition (channel-SUM gray, NN 8×8, exact integer
    64·g > Σg threshold, MSB-first row-major packing) — pure Python
    ints, no numpy, so the two implementations share nothing."""
    import random

    rng = random.Random(11)
    rows = []
    for doc_id in range(6):
        w, h = rng.choice([(8, 8), (16, 12), (33, 7)])
        pix = [[[rng.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)]
        rows.append((doc_id, w, h, pix))
    df = spark.createDataFrame(
        [(d, bytearray(_ppm(w, h, p))) for d, w, h, p in rows],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.ahash for r in mm.image_ahash(df).collect()}

    for doc_id, w, h, pix in rows:
        gray3 = [[sum(c) for c in row] for row in pix]
        ys = [min((i * h) // 8, h - 1) for i in range(8)]
        xs = [min((j * w) // 8, w - 1) for j in range(8)]
        small = [[gray3[y][x] for x in xs] for y in ys]
        total = sum(sum(r) for r in small)
        val = 0
        for r in small:
            for v in r:
                val = (val << 1) | (1 if 64 * v > total else 0)
        if val >= 1 << 63:
            val -= 1 << 64
        assert got[doc_id] == val, doc_id


def test_ahash_stable_under_small_perturbation(spark):
    """A few changed pixels must move the hash at most a few bits; an
    unrelated image must be far."""
    import random

    rng = random.Random(5)
    w = h = 32
    base = [[[rng.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)]
    near = [row[:] for row in base]
    near = [[list(c) for c in row] for row in base]
    for _ in range(5):  # touch 5 pixels out of 1024
        y, x = rng.randrange(h), rng.randrange(w)
        near[y][x] = [rng.randrange(256) for _ in range(3)]
    other = [[[rng.randrange(256) for _ in range(3)] for _ in range(w)] for _ in range(h)]
    df = spark.createDataFrame(
        [(0, bytearray(_ppm(w, h, base))),
         (1, bytearray(_ppm(w, h, near))),
         (2, bytearray(_ppm(w, h, other)))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.ahash for r in mm.image_ahash(df).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(got[0], got[1]) <= 4
    assert ham(got[0], got[2]) > ham(got[0], got[1])


def test_ahash_banded_pairs_equal_all_pairs(spark):
    """The pigeonhole banding must lose nothing: banded result == brute
    force over a hash set engineered with boundary hammings (exactly at,
    just above max_hamming)."""
    import random

    rng = random.Random(3)
    base = rng.getrandbits(64)

    def flip(v, k):
        for b in rng.sample(range(64), k):
            v ^= 1 << b
        return v

    raw = [base, flip(base, 2), flip(base, 3), flip(base, 7),
           rng.getrandbits(64), rng.getrandbits(64)]
    signed = [v - (1 << 64) if v >= 1 << 63 else v for v in raw]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(signed)], "doc_id long, ahash long"
    )
    for max_h in (2, 3):
        got = {(r.a_id, r.b_id, r.hamming)
               for r in mm.ahash_dup_pairs(df, max_hamming=max_h).collect()}
        want = set()
        for i in range(len(raw)):
            for j in range(i + 1, len(raw)):
                d = bin(raw[i] ^ raw[j]).count("1")
                if d <= max_h:
                    want.add((i, j, d))
        assert got == want, max_h


def test_image_ahash_dups_recalls_planted_near_dups(spark):
    """On the rendered fixture corpus, near-dup text pairs surface as
    image-level dup pairs with high recall.  Not asserted as a strict
    subset: a single word edit inside the rendered 192-byte crop SHIFTS
    every following byte (unlike real image noise, which is local), so a
    rare high-Jaccard pair can legitimately exceed the hamming budget —
    a perceptual hash is a recall tool, not an oracle."""
    from depositaja_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    strong = {
        (r.a_id, r.b_id) for r in dd.jaccard_pairs(docs, threshold=0.9).collect()
    }
    loose = {
        (r.a_id, r.b_id) for r in dd.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert strong
    got = {(r.a_id, r.b_id) for r in QUERIES["image_ahash_dups"](spark, sf).collect()}
    assert len(strong & got) / len(strong) >= 0.9
    assert len(loose & got) / len(loose) >= 0.8


def test_quantile_norm_properties(spark):
    """Quantile normalization invariants: within a source the map is
    monotone in the raw score; outputs live inside the global score
    range; the within-source top doc maps to the global maximum."""
    from depositaja_spark.registry import QUERIES

    rows = QUERIES["quality_quantile_norm"](spark, SF).collect()
    qmin = min(r.quality for r in rows)
    qmax = max(r.quality for r in rows)
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
        assert qmin - 1e-12 <= r.norm_quality <= qmax + 1e-12
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.quality, r.doc_id))
        for a, b in zip(rs, rs[1:]):
            if b.quality > a.quality:
                assert b.norm_quality >= a.norm_quality - 1e-12, src
        top = max(rs, key=lambda r: r.cdist)
        assert abs(top.cdist - 1.0) < 1e-9
        assert abs(top.norm_quality - qmax) < 1e-9, src


# --- signup->purchase latency ---------------------------------------------------


def _write_latency_events(spark, tmp_path, rows):
    """rows: (event_id, t_seconds, user_id, event_type)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(eid, t, uid, et, 1.0, None) for eid, t, uid, et in rows],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_signup_latency_planted_cohort(spark, tmp_path):
    """Five same-day signups: three convert at 2h/5h/9h (lower median =
    5), one purchased only BEFORE signup (not a conversion), one never
    purchases.  Conversion = 3/5."""
    from depositaja_spark.registry import QUERIES

    rows = [(i, 1000 + i, 10 + i, "signup") for i in range(5)]
    rows += [
        (100, 1000 + 0 + 2 * 3600, 10, "purchase"),
        (101, 1001 + 1 + 5 * 3600, 11, "purchase"),
        (102, 1002 + 2 + 9 * 3600, 12, "purchase"),
        (103, 500, 13, "purchase"),  # pre-signup only: no conversion
    ]
    d = _write_latency_events(spark, tmp_path, rows)
    (r,) = QUERIES["signup_purchase_latency"](spark, d).collect()
    assert r.cohort_day == 0
    assert r.n_signups == 5 and r.n_converted == 3
    assert r.conversion == 0.6
    assert r.median_hours_to_purchase == 5


def test_signup_latency_python_replay(spark):
    """Engine ≡ naive python on the real fixture (first signup, first
    post-signup purchase, integer-hour floor, lower median)."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .select(F.col("ts").cast("long").alias("t"), "user_id", "event_type")
        .collect()
    )
    s: dict = {}
    for r in ev:
        if r.event_type == "signup":
            s[r.user_id] = min(s.get(r.user_id, r.t), r.t)
    p: dict = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in s and r.t >= s[r.user_id]:
            p[r.user_id] = min(p.get(r.user_id, r.t), r.t)
    coh: dict = {}
    for uid, su in s.items():
        day = su - su % 86400
        lat = (p[uid] - su) // 3600 if uid in p else None
        coh.setdefault(day, []).append((lat, uid))
    got = {
        r.cohort_day: r
        for r in QUERIES["signup_purchase_latency"](spark, sf).collect()
    }
    assert set(got) == set(coh)
    for day, items in coh.items():
        conv = sorted((l, u) for l, u in items if l is not None)
        r = got[day]
        assert r.n_signups == len(items) and r.n_converted == len(conv)
        assert r.conversion == round(len(conv) / len(items), 6)
        if conv:
            assert r.median_hours_to_purchase == conv[(len(conv) + 1) // 2 - 1][0]
        else:
            assert r.median_hours_to_purchase is None


# --- ABC classification ----------------------------------------------------------


def test_abc_boundary_is_inclusive(spark, tmp_path):
    """Revenues 80, 15, 5 (one part each): the first part sits EXACTLY
    at the 80% boundary and must be class A (c·100 ≤ t·80), the second
    exactly at 95% → B, the tail → C."""
    from depositaja_spark.registry import QUERIES

    rows = [
        (1, 1, 80.0, 0.0),
        (2, 2, 15.0, 0.0),
        (3, 3, 5.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r.abc_class: (r.n_parts, r.revenue_share)
        for r in QUERIES["abc_part_classification"](spark, str(tmp_path)).collect()
    }
    assert got == {"A": (1, 0.8), "B": (1, 0.15), "C": (1, 0.05)}


def test_abc_replay_on_real_data(spark):
    """Engine (two-level bucketed cumsum) ≡ flat python replay with the
    same (rev DESC, partkey) order and exact Decimal arithmetic."""
    from decimal import Decimal

    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    li = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .collect()
    )
    revs: dict = {}
    for r in li:
        ep = Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01"))
        di = Decimal(str(r.l_discount)).quantize(Decimal("0.01"))
        revs[r.l_partkey] = revs.get(r.l_partkey, Decimal(0)) + ep * (1 - di)
    total = sum(revs.values())
    cum = Decimal(0)
    by_class: dict = {}
    for pk in sorted(revs, key=lambda k: (-revs[k], k)):
        cum += revs[pk]
        cls = "A" if cum * 100 <= total * 80 else ("B" if cum * 100 <= total * 95 else "C")
        n, s = by_class.get(cls, (0, Decimal(0)))
        by_class[cls] = (n + 1, s + revs[pk])
    got = {
        r.abc_class: (r.n_parts, r.revenue_share)
        for r in QUERIES["abc_part_classification"](spark, sf).collect()
    }
    want = {
        cls: (n, round(float(s) / float(total), 6)) for cls, (n, s) in by_class.items()
    }
    assert got == want


def test_kfold_assignment_is_stable_and_complete(spark):
    """Fold membership is a pure function of (salt, doc_id): repeated
    runs agree row-for-row, every fold is non-empty at fixture scale,
    fractions sum to 1, and the assignment matches a python md5
    replay."""
    import hashlib

    import pyspark.sql.functions as F

    from depositaja_spark.queries_ext import _KFOLD_K, _KFOLD_SALT
    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["kfold_split_balance"](spark, sf).collect()
    assert {r.fold for r in rows} == set(range(_KFOLD_K))
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-5
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs

    # python replay of the fold hash on a sample of doc ids
    docs = load_table(spark, sf, "documents").select("doc_id").limit(50).collect()
    by_fold: dict = {}
    for r in docs:
        h = int(
            hashlib.md5(f"{_KFOLD_SALT}{r.doc_id}".encode()).hexdigest()[:15], 16
        )
        by_fold[r.doc_id] = h % _KFOLD_K
    # rerun → identical (determinism), and spot-agree with the replay by
    # reconstructing assignment from per-fold doc membership
    again = QUERIES["kfold_split_balance"](spark, sf).collect()
    assert sorted(tuple(r) for r in again) == sorted(tuple(r) for r in rows)
    from depositaja_spark.functions.text import hash64

    assign = (
        load_table(spark, sf, "documents")
        .select(
            "doc_id",
            (
                hash64(
                    F.concat(F.lit(_KFOLD_SALT), F.col("doc_id").cast("string"))
                )
                % _KFOLD_K
            ).alias("fold"),
        )
        .filter(F.col("doc_id").isin([r.doc_id for r in docs]))
        .collect()
    )
    for r in assign:
        assert r.fold == by_fold[r.doc_id]


def test_session_affinity_planted_sessions(spark, tmp_path):
    """One user: (a, b) within 10 minutes = one session containing both;
    c arrives 2h later in its own session.  Expect exactly the (a, b)
    pair, perfect lift (every a-session is a b-session), and no pair
    involving c."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows = [
        (0, 1000, 1, "a", 1.0),
        (1, 1300, 1, "b", 1.0),
        (2, 9000, 1, "c", 1.0),
        # second user: a alone, then b alone in separate sessions
        (3, 1000, 2, "a", 1.0),
        (4, 9000, 2, "b", 1.0),
    ]
    df = spark.createDataFrame(
        [(eid, t, uid, et, v, None) for eid, t, uid, et, v in rows],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["session_type_affinity"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    # 4 sessions total ({a,b}, {c}, {a}, {b}); a in 2, b in 2, both in 1
    # → lift = 1·4/(2·2) = 1.0
    assert r.n_both == 1
    assert r.lift == 1.0
    assert r.jaccard == round(1 / 3, 6)


def test_session_affinity_python_replay(spark):
    """Engine ≡ naive python sessionization + pairwise counting on the
    real fixture."""
    from itertools import combinations

    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .select(F.col("ts").cast("double").alias("t"), "event_id", "user_id", "event_type")
        .collect()
    )
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.t, r.event_id)):
        seqs.setdefault(r.user_id, []).append((r.t, r.event_type))
    sessions = []
    for uid, items in seqs.items():
        cur, last = set(), None
        for t, et in items:
            if last is not None and t - last > 1800:
                sessions.append(cur)
                cur = set()
            cur.add(et)
            last = t
        sessions.append(cur)
    n_sessions = len(sessions)
    singles: dict = {}
    pairs: dict = {}
    for st in sessions:
        for et in st:
            singles[et] = singles.get(et, 0) + 1
        for a, b in combinations(sorted(st), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["session_type_affinity"](spark, sf).collect()
    }
    assert set(got) == set(pairs)
    for (a, b), n_both in pairs.items():
        r = got[(a, b)]
        assert r.n_both == n_both
        assert r.lift == round(n_both * n_sessions / (singles[a] * singles[b]), 6)
        assert r.jaccard == round(n_both / (singles[a] + singles[b] - n_both), 6)


def test_ab_power_mde_closed_form(spark):
    """MDE ≡ the closed form around the same arm counts the z-test
    reads; relative MDE = absolute / baseline."""
    import math

    from depositaja_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    (z,) = QUERIES["ab_conversion_ztest"](spark, sf).collect()
    (r,) = QUERIES["ab_power_mde"](spark, sf).collect()
    assert (r.n_control, r.n_treatment) == (z.n_control, z.n_treatment)
    p = (z.conv_control + z.conv_treatment) / (z.n_control + z.n_treatment)
    assert r.baseline_rate == round(p, 6)
    mde = (1.959964 + 0.841621) * math.sqrt(
        p * (1 - p) * (1 / z.n_control + 1 / z.n_treatment)
    )
    assert abs(r.mde_abs - mde) < 1e-6
    assert abs(r.mde_rel - mde / p) < 1e-5


def test_daily_active_growth_planted(spark, tmp_path):
    """Three days: u1 active all days (new on d0), u2 joins d1, u3 joins
    d2 — per-day new/returning splits and cumulative total are exact."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows = [
        (0, 0, 1, "view", 1.0),
        (1, 86400, 1, "view", 1.0), (2, 86400, 2, "view", 1.0),
        (3, 2 * 86400, 1, "view", 1.0), (4, 2 * 86400, 3, "view", 1.0),
    ]
    df = spark.createDataFrame(
        [(eid, t, uid, et, v, None) for eid, t, uid, et, v in rows],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r.day_unix // 86400: (r.dau, r.new_users, r.returning_users, r.cumulative_users)
        for r in QUERIES["daily_active_growth"](spark, str(tmp_path)).collect()
    }
    assert got == {0: (1, 1, 0, 1), 1: (2, 1, 1, 2), 2: (2, 1, 1, 3)}


def test_daily_active_growth_replay(spark):
    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .select(F.col("ts").cast("long").alias("t"), "user_id")
        .collect()
    )
    per_day: dict = {}
    first: dict = {}
    for r in ev:
        d = r.t - r.t % 86400
        per_day.setdefault(d, set()).add(r.user_id)
        first[r.user_id] = min(first.get(r.user_id, d), d)
    got = {
        r.day_unix: r for r in QUERIES["daily_active_growth"](spark, sf).collect()
    }
    assert set(got) == set(per_day)
    cum = 0
    for d in sorted(per_day):
        new = sum(1 for u, fd in first.items() if fd == d)
        cum += new
        r = got[d]
        assert r.dau == len(per_day[d])
        assert r.new_users == new
        assert r.returning_users == len(per_day[d]) - new
        assert r.cumulative_users == cum


def test_whale_share_planted_skew(spark, tmp_path):
    """200 users: one whale holds most value; k = ceil(1% of 200) = 2 so
    the top-2 share is (whale + best regular) / total, exactly."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows = [(uid, 60 * uid, uid, "view", 10.0 + uid * 0.01) for uid in range(199)]
    rows.append((999, 60 * 999, 999, "view", 100000.0))
    df = spark.createDataFrame(
        [(eid, t, uid, et, v, None) for eid, t, uid, et, v in rows],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    (r,) = QUERIES["whale_value_share"](spark, str(tmp_path)).collect()
    assert r.n_users == 200 and r.n_whales == 2
    total = sum(10.0 + u * 0.01 for u in range(199)) + 100000.0
    top2 = 100000.0 + (10.0 + 198 * 0.01)
    assert r.whale_value == round(top2, 2)
    assert r.whale_share == round(top2 / total, 6)


def test_whale_share_replay(spark):
    from decimal import Decimal

    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    per_user: dict = {}
    for r in (
        load_table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "value")
        .collect()
    ):
        per_user[r.user_id] = per_user.get(r.user_id, Decimal(0)) + Decimal(
            str(r.value)
        ).quantize(Decimal("0.01"))
    n = len(per_user)
    k = (n * 1 + 99) // 100
    order = sorted(per_user.items(), key=lambda kv: (-kv[1], kv[0]))
    tv = sum(v for _, v in order[:k])
    t = sum(per_user.values())
    (r,) = QUERIES["whale_value_share"](spark, sf).collect()
    assert (r.n_users, r.n_whales) == (n, k)
    assert r.whale_value == float(tv)
    assert r.whale_share == round(float(tv) / float(t), 6)


# --- source n-gram overlap matrix ------------------------------------------------


def test_source_overlap_hand_computed(spark, tmp_path):
    """Two sources with hand-enumerable distinct 3-gram sets: src1 has
    {a b c, b c d}, src2 has {b c d, c d e} -> intersection 1, union 3."""
    from depositaja_spark import registry

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "src1", 7),
            (2, "b c d e", "en", "src2", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    (got,) = registry.QUERIES["source_ngram_overlap_matrix"](
        spark, str(tmp_path)
    ).collect()
    assert (got.src_a, got.src_b) == ("src1", "src2")
    assert (got.n_common, got.n_grams_a, got.n_grams_b) == (1, 2, 2)
    assert abs(got.jaccard - 1 / 3) < 1e-6  # output is rounded to 6 places


def test_source_overlap_disjoint_sources_absent(spark, tmp_path):
    """Sources sharing no gram produce NO row (sparse matrix contract:
    absence = zero, the join never manufactures zero rows)."""
    from depositaja_spark import registry

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "src1", 5),
            (2, "x y z", "en", "src2", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    assert (
        registry.QUERIES["source_ngram_overlap_matrix"](
            spark, str(tmp_path)
        ).count()
        == 0
    )
