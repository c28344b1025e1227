"""Text-analysis operators for the training-data pipeline.

Everything here is built from JVM-side ``pyspark.sql.functions`` (no
Python UDFs): tokenization, token counting, quality scoring, language
identification, and document fingerprinting all stay inside whole-stage
codegen, so they scale linearly with no serialization cliffs — the
difference between 100 TB being a day job or a week job.

All constants (stopword lists, hash moduli) are module-level so the DuckDB
oracle SQL can be generated from the SAME values (queries_ext.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- tokenization -------------------------------------------------------------

#: BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
#: non-alphanumeric marks — the standard byte-pair pre-split shape.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the corpus is single-spaced lowercase)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def bpe_tokens(text: Column | str) -> Column:
    """Regex pre-tokenization (letters / digits / marks)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# --- quality scoring -----------------------------------------------------------

#: small English stopword list used by both quality scoring and lang-ID
STOPWORDS_EN = ["the", "a", "is", "and", "of", "to", "in"]


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Number of tokens present in ``words`` (multiplicity counted)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token stats, stopword ratio,
    non-alpha ratio — the standard cheap filters a 100 TB corpus is
    pre-screened with before any model-based scoring."""
    toks = tokens(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    stop_hits = stopword_hits(toks, STOPWORDS_EN)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        # mean token length: alpha chars over token count, exact int inputs
        F.round(n_alpha.cast("double") / n_tokens, 6).alias("mean_token_len"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(n_alpha.cast("double") / n_chars, 6).alias("alpha_ratio"),
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, entropy, top_token_ratio): Shannon entropy (nats) of the
    document's token distribution and the largest single-token share —
    the standard degeneracy signals for corpus filtering (low entropy /
    high top-token share = repetitive, boilerplate, or generated-loop
    text).

    Algebraic form ``H = ln n − (Σ c·ln c)/n`` needs only per-token
    counts, so the whole operator is two keyed aggregations with map-side
    partials — no per-token probability column, no second pass."""
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("tok"))
    cnt = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log("c")).alias("clogc"),
        F.max("c").alias("maxc"),
    )
    return per_doc.select(
        "doc_id",
        F.round(F.log("n") - F.col("clogc") / F.col("n"), 6).alias("entropy"),
        F.round(F.col("maxc").cast("double") / F.col("n"), 6).alias("top_token_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: length saturation × stopword signal.

    Computed in INTEGER per-mille space and floored — float rounding at a
    half-way digit differs between engines (HALF_UP vs banker's), so the
    formula avoids ever rounding a float: ``L = min(1000, 20·n_tokens)``,
    ``S = min(1000, ⌊5000·stop_hits/n_tokens⌋)``,
    ``quality = ⌊L·(1000+S)/2⌋ / 1e6``.
    """
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    stop_hits = stopword_hits(toks, STOPWORDS_EN)
    length_sat = F.least(F.lit(1000), n_tokens * 20)
    stop_sig = F.least(F.lit(1000), F.floor(stop_hits * 5000 / n_tokens))
    q = F.floor(length_sat * (1000 + stop_sig) / 2)
    return docs.select(
        "doc_id",
        (q.cast("double") / 1000000.0).alias("quality"),
    )


# --- language identification ----------------------------------------------------

#: tiny per-language function-word lists; argmax of hit counts with fixed
#: precedence order. A real deployment swaps in character-n-gram profiles;
#: the operator shape (token hits → argmax) is identical.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "is", "and", "of", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "fr": ["le", "les", "des", "et", "est", "dans"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]


def lang_scores(toks: Column) -> list[Column]:
    return [
        stopword_hits(toks, LANG_PROFILES[lang]).alias(f"score_{lang}")
        for lang in LANG_ORDER
    ]


def predict_lang(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language function-word hit counts,
    argmax with precedence LANG_ORDER; 'und' when nothing hits."""
    toks = tokens(text_col)
    scored = docs.select("doc_id", "lang", *lang_scores(toks))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    pred = F.lit("und")
    # build the CASE chain in reverse so earlier languages win ties
    for lang in reversed(LANG_ORDER):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select("doc_id", "lang", pred.alias("predicted_lang"))


# --- fingerprinting ---------------------------------------------------------------

#: modulus for the rolling token hash (fits comfortably in BIGINT even
#: after the ×131 step, so DuckDB's checked arithmetic never overflows)
FP_MOD = 1_000_000_007
FP_MUL = 131


def hash64(c: Column) -> Column:
    """Portable 60-bit integer hash: top 15 hex chars of md5.
    Identical in DuckDB: CAST('0x' || substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def py_hash64(s: str) -> int:
    """Pure-Python twin of :func:`hash64` for replay tests and driver-
    side constants — same top-15-hex-of-md5 convention."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def content_fingerprint(text: Column | str) -> Column:
    """Exact-content fingerprint (md5 hex)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def bag_fingerprint(text: Column | str) -> Column:
    """Word-order-insensitive fingerprint: md5 of the sorted token bag."""
    return F.md5(F.array_join(F.array_sort(tokens(text)), " "))


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over token hashes:
    ``acc = (acc*131 + h_tok mod M) mod M`` — order-sensitive, incremental
    (a streaming engine can extend it token by token)."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_MUL + hash64(t) % FP_MOD) % FP_MOD,
    )
