"""LLM-data-pipeline extension queries: text analysis, dedup, similarity
search, multimodal — each oracle-checked against DuckDB.

The oracle SQL is GENERATED from the same module-level constants the Spark
operators use (stopword lists, minhash coefficients, band layout,
thresholds), so both sides always agree by construction.  Portable 60-bit
hash: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from depositaja_spark.functions import dedup as dd
from depositaja_spark.functions import embed as em
from depositaja_spark.functions import multimodal as mm
from depositaja_spark.functions import similarity as sim
from depositaja_spark.functions import spans as sp
from depositaja_spark.functions import text as tx
from depositaja_spark.registry import NO_ORACLE_OK, query
from depositaja_spark.sources import load_table
from depositaja_spark.sources.tables import spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the per-row compute (shingling, hashing, tokenizing) in these
    # queries dwarfs the scan, and the test file is a single row group →
    # one task without an explicit rebalance (sources/tables.py:spread)
    return spread(load_table(spark, sf_dir, "documents"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "embeddings"))


# DuckDB fragments mirroring functions/text.py
_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_TOKS = "string_split(text, ' ')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# --- text analysis -----------------------------------------------------------

_STOP = _sql_list(tx.STOPWORDS_EN)

_QUALITY_METRICS_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len({_TOKS}) AS INT) AS n_tokens,
       round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
             / len({_TOKS}), 6) AS mean_token_len,
       round(CAST(len(list_filter({_TOKS}, t -> list_contains({_STOP}, t))) AS DOUBLE)
             / len({_TOKS}), 6) AS stopword_ratio,
       round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
             / length(text), 6) AS alpha_ratio
FROM documents
"""


@query("doc_quality_metrics", _QUALITY_METRICS_SQL)
def q_doc_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality signals (length / token stats / stopword & alpha
    ratios) — the cheap pre-filters of a corpus pipeline."""
    return tx.quality_metrics(_docs(spark, sf_dir))


@query(
    "doc_quality_scores",
    f"""
WITH m AS (
  SELECT doc_id,
         least(1000, len({_TOKS}) * 20) AS length_sat,
         least(1000, floor(len(list_filter({_TOKS}, t -> list_contains({_STOP}, t))) * 5000
                           / len({_TOKS}))) AS stop_sig
  FROM documents
)
SELECT doc_id,
       CAST(floor(length_sat * (1000 + stop_sig) / 2) AS DOUBLE) / 1000000.0 AS quality
FROM m
""",
)
def q_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar [0,1] quality score (length saturation × stopword signal),
    computed in integer space so no float ever gets rounded (engine
    HALF_UP vs banker's rounding would diverge at half-way digits)."""
    return tx.quality_score(_docs(spark, sf_dir))


def _qnorm_sql() -> str:
    fracs = ", ".join(repr(i / 100.0) for i in range(101))
    return f"""
WITH m AS (
  SELECT doc_id, source,
         least(1000, len({_TOKS}) * 20) AS length_sat,
         least(1000, floor(len(list_filter({_TOKS}, t -> list_contains({_STOP}, t))) * 5000
                           / len({_TOKS}))) AS stop_sig
  FROM documents
),
q AS (
  SELECT doc_id, source,
         CAST(floor(length_sat * (1000 + stop_sig) / 2) AS DOUBLE) / 1000000.0 AS quality
  FROM m
),
p AS (
  SELECT doc_id, source, quality,
         round(cume_dist() OVER (PARTITION BY source ORDER BY quality), 6) AS cdist
  FROM q
),
g AS (SELECT quantile_cont(quality, [{fracs}]) AS gq FROM q)
SELECT p.doc_id, p.source, p.quality, p.cdist,
       CASE WHEN floor(p.cdist * 100.0) >= 100 THEN gq[101]
            ELSE gq[CAST(floor(p.cdist * 100.0) AS INT) + 1]
                 + (p.cdist * 100.0 - floor(p.cdist * 100.0))
                   * (gq[CAST(floor(p.cdist * 100.0) AS INT) + 2]
                      - gq[CAST(floor(p.cdist * 100.0) AS INT) + 1])
       END AS norm_quality
FROM p CROSS JOIN g
"""


@query("quality_quantile_norm", _qnorm_sql())
def q_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of the quality score — the
    curation step that makes one global quality threshold meaningful
    when sources have different score distributions (a p90 news doc and
    a p90 forum doc should survive the same cut): each doc's score maps
    to its WITHIN-SOURCE cumulative rank, then to the GLOBAL score
    distribution's value at that rank (piecewise-linear over a 101-point
    exact percentile grid).

    Scale shape: the within-source cume_dist comes from the
    grouped-bucket decomposition (functions/windows.py — no
    low-cardinality single-task sort over the corpus; the oracle uses
    DuckDB's flat window); the global grid is ONE exact-percentile
    aggregation emitting a 101-value row broadcast by cross join; the
    remap is row-local arithmetic on the rounded-6 cdist, identical on
    both engines.  norm_quality ships RAW (interpolated values can land
    on round ties)."""
    from depositaja_spark.functions.windows import grouped_ntile_cume

    docs = _docs(spark, sf_dir)
    q = tx.quality_score(docs).join(docs.select("doc_id", "source"), "doc_id")
    p = grouped_ntile_cume(
        q, "source", "quality", "doc_id", 4, cume_col="cdist"
    ).select("doc_id", "source", "quality", "cdist")
    g = q.agg(
        F.percentile(F.col("quality"), F.array(*[F.lit(i / 100.0) for i in range(101)])).alias("gq")
    )
    idx = F.floor(F.col("cdist") * F.lit(100.0))
    lo = idx.cast("int") + 1
    frac = F.col("cdist") * F.lit(100.0) - idx
    norm = F.when(idx >= 100, F.element_at("gq", 101)).otherwise(
        F.element_at(F.col("gq"), lo)
        + frac * (F.element_at(F.col("gq"), lo + 1) - F.element_at(F.col("gq"), lo))
    )
    return p.crossJoin(F.broadcast(g)).select(
        "doc_id", "source", "quality", "cdist", norm.alias("norm_quality")
    )


@query(
    "token_entropy",
    f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS clogc, max(c) AS maxc
  FROM cnt GROUP BY doc_id
)
SELECT doc_id,
       round(ln(n) - clogc / n, 6) AS entropy,
       round(CAST(maxc AS DOUBLE) / n, 6) AS top_token_ratio
FROM per_doc
""",
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy + top-token share per document
    — the repetition/degeneracy filters of a corpus pipeline."""
    return tx.token_entropy(_docs(spark, sf_dir))


def _lang_id_sql() -> str:
    score_cols = ",\n       ".join(
        f"CAST(len(list_filter({_TOKS}, t -> list_contains({_sql_list(tx.LANG_PROFILES[lang])}, t))) AS INT) AS score_{lang}"
        for lang in tx.LANG_ORDER
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in tx.LANG_ORDER) + ")"
    case = "CASE "
    for lang in tx.LANG_ORDER:
        case += f"WHEN score_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {score_cols}
  FROM documents
), with_best AS (
  SELECT *, {greatest} AS best FROM scored
)
SELECT doc_id, lang, {case} AS predicted_lang FROM with_best
"""


@query("lang_id", _lang_id_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language identification: per-language function-word hit
    counts, argmax with fixed precedence."""
    return tx.predict_lang(_docs(spark, sf_dir))


@query(
    "lang_id_confusion",
    f"WITH p AS ({_lang_id_sql()}) "
    "SELECT lang, predicted_lang, count(*) AS n FROM p GROUP BY lang, predicted_lang",
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix against the labeled lang column."""
    return (
        tx.predict_lang(_docs(spark, sf_dir))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "doc_fingerprints",
    f"""
SELECT doc_id,
       md5(text) AS content_md5,
       md5(array_to_string(list_sort({_TOKS}), ' ')) AS bag_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform({_TOKS}, t -> {_H64.format(x='t')} % {tx.FP_MOD})),
         (acc, h) -> (acc * {tx.FP_MUL} + h) % {tx.FP_MOD}) AS rolling_fp
FROM documents
""",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact md5, order-insensitive bag md5, and a
    polynomial rolling hash over token hashes."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        tx.content_fingerprint("text").alias("content_md5"),
        tx.bag_fingerprint("text").alias("bag_md5"),
        tx.rolling_fingerprint("text").alias("rolling_fp"),
    )


@query(
    "token_counts",
    f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{tx.BPE_TOKEN_RE}')) AS INT) AS n_bpe_tokens
FROM documents
""",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex pre-tokens."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_ws_tokens"),
        F.size(tx.bpe_tokens("text")).alias("n_bpe_tokens"),
    )


@query(
    "token_frequencies",
    f"""
SELECT tok, count(*) AS n
FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok LIMIT 20
""",
)
def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies, deterministic top-20."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


@query(
    "bigram_frequencies",
    f"""
SELECT bg, count(*) AS n
FROM (
  SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM (SELECT {_TOKS} AS toks FROM documents)
)
GROUP BY bg ORDER BY n DESC, bg LIMIT 20
""",
)
def q_bigram_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequencies, deterministic top-20 (n-gram stats layer)."""
    d = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return (
        d.select(F.explode(grams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bg"))
        .limit(20)
    )


# --- dedup -------------------------------------------------------------------

_SHINGLES_SQL = f"""
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
)
"""

#: stop-shingle df cap mirrored from functions/dedup.py — shingles in
#: more than DEDUP_MAX_DF documents are dropped before the pair join on
#: BOTH engines (sizes count the filtered universe too)
_FSH_SQL = f"""
fsh AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {dd.DEDUP_MAX_DF}
)
"""

_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL},
{_FSH_SQL},
sz AS (SELECT doc_id, count(*) AS sz FROM fsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM fsh a JOIN fsh b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON a_id = sa.doc_id
JOIN sz sb ON b_id = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {{thr}}
"""


@query("exact_dedup", "SELECT min(doc_id) AS doc_id, md5(text) AS content_md5, count(*) AS n_copies FROM documents GROUP BY md5(text)")
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup clusters by content hash (min doc_id representative)."""
    return dd.exact_dedup(_docs(spark, sf_dir))


_CONTAINMENT_SQL = f"""
WITH {_SHINGLES_SQL},
{_FSH_SQL},
sz AS (SELECT doc_id, count(*) AS sz FROM fsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM fsh a JOIN fsh b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(CAST(inter AS DOUBLE) / sa.sz, 6) AS c_ab,
       round(CAST(inter AS DOUBLE) / sb.sz, 6) AS c_ba
FROM inter
JOIN sz sa ON a_id = sa.doc_id
JOIN sz sb ON b_id = sb.doc_id
WHERE greatest(round(CAST(inter AS DOUBLE) / sa.sz, 6),
               round(CAST(inter AS DOUBLE) / sb.sz, 6)) >= {{thr}}
"""


@query("containment_near_dups", _CONTAINMENT_SQL.format(thr=0.5))
def q_containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment pairs (max directional containment
    ≥ 0.5) — catches subset/quotation duplicates Jaccard down-weights."""
    return dd.containment_pairs(_docs(spark, sf_dir), n=3, threshold=0.5)


@query("jaccard_near_dups", _JACCARD_SQL.format(thr=0.1))
def q_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-duplicate pairs (τ=0.1; the corpus has
    planted near-dups up to J≈0.99)."""
    return dd.jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.1)


# Oracle for the prefix-filtered join is the CLEAN all-pairs definition —
# no df cap anywhere, because prefix filtering is lossless: the Spark
# side only ever indexes each document's rarest-first prefix, yet must
# reproduce the full uncapped inverted-index answer exactly.
_PREFIX_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL},
sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON a_id = sa.doc_id
JOIN sz sb ON b_id = sb.doc_id
WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {{thr}}
"""


@query(
    "ngram_novelty",
    f"""
WITH {_SHINGLES_SQL},
firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM shingles GROUP BY 1)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty
FROM shingles s JOIN firsts f USING (shingle)
GROUP BY s.doc_id
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct 3-gram shingles whose GLOBAL first occurrence (min doc_id
    over the corpus) is this document — the marginal-contribution score
    dedup pipelines use to rank which copy of overlapping content to
    keep, and a cheap proxy for "how much new text does this doc add".
    A near-perfect copy of an earlier document scores ≈ 0; fully fresh
    text scores 1.

    Two keyed aggregations over the shingle frame (first-occurrence
    min, then per-doc counts via one equi-join) — the same inverted
    index jaccard_pairs shuffles, no pair join at all."""
    from depositaja_spark.functions.cache import tracked_persist
    from depositaja_spark.functions.text import hash64

    sh = dd.shingles(_docs(spark, sf_dir), n=3)
    hashed = tracked_persist(
        sh.select("doc_id", hash64(F.col("shingle")).alias("h"))
    )
    firsts = hashed.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        hashed.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )


@query("prefix_jaccard_near_dups", _PREFIX_JACCARD_SQL.format(thr=0.2))
def q_prefix_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered EXACT Jaccard join (τ=0.2) — the
    lossless scale path for set-similarity: candidates come only from
    each document's rarest-first shingle prefix, verification is one
    array_intersect per candidate, and the result equals the clean
    uncapped all-pairs definition (the oracle) bit for bit.  Complements
    jaccard_near_dups, whose df cap intentionally redefines the score
    over a filtered universe.  See functions/dedup.py:prefix_jaccard_pairs."""
    return dd.prefix_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


_CLUSTERS_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL.strip().rstrip()},
{_FSH_SQL.strip()},
sz AS (SELECT doc_id, count(*) AS sz FROM fsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM fsh a JOIN fsh b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sz sa ON a_id = sa.doc_id
  JOIN sz sb ON b_id = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.1
),
sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id, a_id FROM pairs),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id AS doc_id,
       min(lbl) AS cluster_id,
       (min(lbl) = id) AS is_keeper
FROM reach GROUP BY id
"""


@query("dedup_clusters", _CLUSTERS_SQL)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the Jaccard near-dup pair graph: every
    document labeled with its cluster representative (min reachable
    doc_id) and keeper flag — the closure step that turns pair detection
    into dedup groups.  Iterative min-label propagation (keyed shuffles
    only, lineage kept flat by persist/unpersist per round); oracle =
    recursive-CTE reachability."""
    from depositaja_spark.functions.graph import dedup_clusters as _dc

    docs = _docs(spark, sf_dir)
    return _dc(docs, dd.jaccard_pairs(docs, n=3, threshold=0.1))


def _minhash_sql() -> str:
    mins = ",\n       ".join(
        f"min(({a} * h + {b}) % {dd.MINHASH_P}) AS mh_{i}"
        for i, (a, b) in enumerate(dd.MINHASH_COEFFS)
    )
    return f"""
WITH {_SHINGLES_SQL},
h AS (SELECT doc_id, {_H64.format(x='shingle')} % {dd.MINHASH_P} AS h FROM shingles)
SELECT doc_id,
       {mins}
FROM h GROUP BY doc_id
"""


@query("minhash_signatures", _minhash_sql())
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=16 permutations over 3-gram shingle hashes)."""
    return dd.minhash_signatures(_docs(spark, sf_dir))


def _lsh_pairs_sql() -> str:
    band_selects = []
    for b in range(dd.LSH_BANDS):
        cols = [f"mh_{b * dd.LSH_ROWS + r}" for r in range(dd.LSH_ROWS)]
        key = "md5(concat_ws(':', " + ", ".join(f"CAST({c} AS VARCHAR)" for c in cols) + "))"
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {key} AS band_key FROM sigs"
        )
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH sigs AS ({_minhash_sql()}),
bands AS (
{bands}
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


@query("lsh_candidate_pairs", _lsh_pairs_sql())
def q_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs (4 bands × 4 rows) — the sub-quadratic
    near-dup candidate generator."""
    return dd.lsh_candidate_pairs(dd.minhash_signatures(_docs(spark, sf_dir)))


@query(
    "minhash_lsh_near_dups",
    f"""
WITH cand AS ({_lsh_pairs_sql()}),
jac AS ({_JACCARD_SQL.format(thr=0.1)})
SELECT jac.a_id, jac.b_id, jac.jaccard
FROM jac JOIN cand ON jac.a_id = cand.a_id AND jac.b_id = cand.b_id
""",
)
def q_minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified by exact Jaccard ≥ 0.1."""
    return dd.minhash_lsh_dedup(_docs(spark, sf_dir), n=3, threshold=0.1)


def _simhash_sql() -> str:
    bit_sums = ",\n       ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS bit_{j}"
        for j in range(dd.SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN bit_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(dd.SIMHASH_BITS)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
h AS (SELECT doc_id, {_H64.format(x='tok')} AS h FROM tok),
bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id)
SELECT doc_id, {sig} AS simhash FROM bits
"""


@query("simhash_signatures", _simhash_sql())
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash (Charikar) signatures over token hashes (full
    width of the portable md5-prefix hash; see dd.SIMHASH_BITS)."""
    return dd.simhash(_docs(spark, sf_dir))


@query(
    "simhash_near_dups",
    f"""
WITH s AS ({_simhash_sql()})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
""",
)
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs at Hamming distance ≤ 6."""
    return dd.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=6)


@query(
    "simhash_near_dups_banded",
    f"""
WITH s AS ({_simhash_sql()})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
""",
)
def q_simhash_near_dups_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Hamming-≤6 pair set as simhash_near_dups, produced by the
    sub-quadratic bit-slice band join (recall 1.0 by pigeonhole — the
    oracle is intentionally the all-pairs SQL)."""
    return dd.simhash_near_pairs_banded(_docs(spark, sf_dir), max_hamming=6)


def _clean_corpus_sql(source: str = "documents", prefix_ctes: str = "") -> str:
    from depositaja_spark.plans.corpus_pipeline import (
        MIN_ALPHA,
        MIN_TOKENS,
        NEAR_DUP_THRESHOLD,
    )

    score_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> list_contains({_sql_list(tx.LANG_PROFILES[lang])}, t))) AS INT) AS score_{lang}"
        for lang in tx.LANG_ORDER
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in tx.LANG_ORDER) + ")"
    case = "CASE "
    for lang in tx.LANG_ORDER:
        case += f"WHEN score_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    prefix = prefix_ctes + ",\n" if prefix_ctes else ""
    return f"""
WITH RECURSIVE
{prefix}scored AS (
  SELECT doc_id, text, len(toks) AS n_tokens,
         round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
               / length(text), 6) AS alpha_ratio,
         {score_cols}
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM {source})
),
lbl AS (
  SELECT *, {case} AS predicted_lang
  FROM (SELECT *, {greatest} AS best FROM scored)
),
base AS (
  SELECT doc_id, text, n_tokens, predicted_lang FROM lbl
  WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
    AND predicted_lang != 'und'
),
exact AS (
  SELECT doc_id, text, predicted_lang, n_tokens FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS rep FROM base
  ) WHERE doc_id = rep
),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id, {_TOKS} AS toks FROM exact)
),
sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sz sa ON a_id = sa.doc_id
  JOIN sz sb ON b_id = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= {NEAR_DUP_THRESHOLD}
),
sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id, a_id FROM pairs),
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM exact
  UNION
  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
),
keepers AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING min(lbl) = id)
SELECT e.doc_id, e.predicted_lang, e.n_tokens
FROM exact e JOIN keepers USING (doc_id)
"""


def _drop_reasons_sql() -> str:
    """Per-document audit trail over the SAME pipeline CTE chain as
    clean_corpus (spliced, not copied — the chain is generated once):
    the first stage that rejected each document, or 'kept'."""
    from depositaja_spark.plans.corpus_pipeline import MIN_ALPHA, MIN_TOKENS

    clean = _clean_corpus_sql().rstrip()
    final = (
        "SELECT e.doc_id, e.predicted_lang, e.n_tokens"
        "\nFROM exact e JOIN keepers USING (doc_id)"
    )
    assert clean.endswith(final), "clean_corpus SQL shape changed"
    prologue = clean[: -len(final)].rstrip()
    return f"""{prologue}
SELECT l.doc_id,
       CASE WHEN l.n_tokens < {MIN_TOKENS} OR l.alpha_ratio < {MIN_ALPHA}
              THEN 'gate_quality'
            WHEN l.predicted_lang = 'und' THEN 'gate_lang'
            WHEN e.doc_id IS NULL THEN 'exact_dup'
            WHEN k.doc_id IS NULL THEN 'near_dup'
            ELSE 'kept' END AS reason
FROM lbl l
LEFT JOIN exact e ON e.doc_id = l.doc_id
LEFT JOIN keepers k ON k.doc_id = l.doc_id
"""


@query("corpus_drop_reasons", _drop_reasons_sql())
def q_corpus_drop_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document drop-reason audit for the cleaning pipeline — the
    lineage table behind every "why was my document removed?" support
    question: the FIRST stage that rejected each document
    (gate_quality → gate_lang → exact_dup → near_dup) or 'kept'.

    Runs the same staged plan as clean_corpus with the filters turned
    into labels: the unfiltered gate scoring
    (plans/corpus_pipeline.py:corpus_gate_scored) provides every
    rejected document's gate columns, the exact-dedup representative
    and near-dup keeper sets attach as two broadcastable id markers,
    and one CASE folds them into the reason — no stage recomputes
    anything the pipeline didn't already compute."""
    from depositaja_spark.functions.graph import duplicate_ids
    from depositaja_spark.plans.corpus_pipeline import (
        MIN_ALPHA,
        MIN_TOKENS,
        NEAR_DUP_THRESHOLD,
        corpus_gate_scored,
    )

    from pyspark.sql import Window as W

    from depositaja_spark.functions.cache import tracked_persist

    docs = _docs(spark, sf_dir)
    scored = corpus_gate_scored(docs)
    base = scored.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("alpha_ratio") >= MIN_ALPHA)
        & (F.col("predicted_lang") != "und")
    )
    w = W.partitionBy(F.md5(F.col("text")))
    exact = tracked_persist(
        base.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep"))
        .select("doc_id", "text")
    )
    dupes = duplicate_ids(
        dd.jaccard_pairs(exact, n=3, threshold=NEAR_DUP_THRESHOLD)
    ).withColumnRenamed("id", "doc_id")
    exact_ids = exact.select("doc_id", F.lit(1).alias("_in_exact"))
    dupe_ids = dupes.select("doc_id", F.lit(1).alias("_is_dupe"))
    return (
        scored.join(exact_ids, "doc_id", "left")
        .join(F.broadcast(dupe_ids), "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("n_tokens") < MIN_TOKENS)
                | (F.col("alpha_ratio") < MIN_ALPHA),
                "gate_quality",
            )
            .when(F.col("predicted_lang") == "und", "gate_lang")
            .when(F.col("_in_exact").isNull(), "exact_dup")
            .when(F.col("_is_dupe").isNotNull(), "near_dup")
            .otherwise("kept")
            .alias("reason"),
        )
    )


@query("clean_corpus", _clean_corpus_sql())
def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus-cleaning pipeline (quality gate → language gate →
    exact dedup → near-dup clustering → keeper selection) — the composed
    LLM-data preprocessing flow (plans/corpus_pipeline.py)."""
    from depositaja_spark.plans.corpus_pipeline import clean_corpus

    return clean_corpus(_docs(spark, sf_dir))


# --- similarity search --------------------------------------------------------

_Q_IDS = ", ".join(str(i) for i in sim.QUERY_IDS)

_COS = """
round(
  list_sum(list_transform(range(1, len({a}) + 1),
           i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(range(1, len({a}) + 1),
           i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, len({b}) + 1),
           i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 6)
"""


@query(
    "ann_topk_brute",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
           WHERE vec_id IN ({_Q_IDS})),
c AS (SELECT vec_id AS cand_id, embedding AS cvec FROM embeddings),
scored AS (
  SELECT query_id, cand_id, {_COS.format(a='qvec', b='cvec')} AS cos
  FROM c CROSS JOIN q WHERE cand_id != query_id
)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {sim.TOP_K}
""",
)
def q_ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for 5 query vectors: broadcast cross join +
    windowed rank (the brute-force ANN baseline)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
    return sim.cosine_topk(emb, queries)


@query(
    "ann_topk_filtered",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec, label FROM embeddings
           WHERE vec_id IN ({_Q_IDS})),
c AS (SELECT vec_id AS cand_id, embedding AS cvec, label FROM embeddings),
scored AS (
  SELECT query_id, cand_id, {_COS.format(a='qvec', b='cvec')} AS cos
  FROM c JOIN q USING (label) WHERE cand_id != query_id
)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {sim.TOP_K}
""",
)
def q_ann_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN: top-k per query among candidates sharing the query's
    label (same-language retrieval / tenant isolation — the standard
    metadata-filtered retrieval shape).  The predicate is the JOIN KEY of
    a broadcast hash join, so non-matching candidates are dropped before
    any vector math instead of being scored and post-filtered."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
    return sim.cosine_topk_filtered(emb, queries, "label")


_COS_DOT = """
round(list_sum(list_transform(range(1, len({a}) + 1),
      i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), 6)
"""


def _anchor_bit_case() -> str:
    whens = " ".join(
        f"WHEN {aid} THEN {1 << i}" for i, aid in enumerate(sim.ANCHOR_IDS)
    )
    return f"CASE a.aid {whens} END"


_ANCHOR_IDS_SQL = ", ".join(str(a) for a in sim.ANCHOR_IDS)


@query(
    "ann_topk_lsh",
    f"""
WITH anch AS (SELECT vec_id AS aid, embedding AS avec FROM embeddings
              WHERE vec_id IN ({_ANCHOR_IDS_SQL})),
buckets AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN {_COS_DOT.format(a='e.embedding', b='a.avec')} > 0
                       THEN {_anchor_bit_case()} ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN anch a
  GROUP BY e.vec_id
),
bucketed AS (
  SELECT e.vec_id, e.embedding, b.bucket
  FROM embeddings e JOIN buckets b USING (vec_id)
),
q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket FROM bucketed
      WHERE vec_id IN ({_Q_IDS})),
c AS (SELECT vec_id AS cand_id, embedding AS cvec, bucket FROM bucketed),
scored AS (
  SELECT query_id, cand_id, {_COS.format(a='qvec', b='cvec')} AS cos
  FROM c JOIN q USING (bucket) WHERE cand_id != query_id
)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {sim.TOP_K}
""",
)
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-random-projection buckets (anchors =
    corpus rows {sim.ANCHOR_IDS}) — the scale path: bucket equi-join
    instead of cross join."""
    return sim.ann_topk_lsh(_emb(spark, sf_dir))


_QUANT = """
quant AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
         list_transform(embedding,
           x -> CAST(floor(127.0 * CAST(x AS DOUBLE)
                / greatest(list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))),
                           1e-30)
                + 0.5) AS INT)) AS qvec
  FROM embeddings
)
"""


@query(
    "quantized_embeddings",
    f"""
WITH {_QUANT}
SELECT vec_id, round(scale, 6) AS scale,
       array_to_string(qvec, ',') AS qvec_csv
FROM quant
""",
)
def q_quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (4× storage/IO
    compression; scale per vector, values bit-exact vs the oracle).
    The int8 vector is emitted CSV-flattened: the driver's value-hash
    compare stringifies cells, and engines disagree on array formatting
    even when elements are identical."""
    return sim.quantize_embeddings(_emb(spark, sf_dir)).select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
    )


@query(
    "ann_topk_quantized",
    f"""
WITH {_QUANT},
q AS (SELECT vec_id AS query_id, qvec AS q_qvec FROM quant
      WHERE vec_id IN ({_Q_IDS})),
c AS (SELECT vec_id AS cand_id, qvec AS c_qvec FROM quant),
scored AS (
  SELECT query_id, cand_id, {_COS.format(a='q_qvec', b='c_qvec')} AS cos
  FROM c CROSS JOIN q WHERE cand_id != query_id
)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {sim.TOP_K}
""",
)
def q_ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine over the int8-quantized corpus (cosine is
    scale-invariant, so the compressed copy is searched directly)."""
    return sim.ann_topk_quantized(_emb(spark, sf_dir))


@query(
    "embedding_near_dups",
    f"""
WITH a AS (SELECT vec_id AS a_id, embedding AS avec FROM embeddings),
b AS (SELECT vec_id AS b_id, embedding AS bvec FROM embeddings)
SELECT a_id, b_id, {_COS.format(a='avec', b='bvec')} AS cos
FROM a CROSS JOIN b
WHERE a_id < b_id AND {_COS.format(a='avec', b='bvec')} >= 0.4
""",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4) — the ALL-PAIRS
    block-matmul baseline, kept as the exact reference for the banded
    scale path (embedding_near_dups_bucketed), mirroring the
    simhash_near_dups / _banded pairing."""
    return sim.embedding_near_dup(_emb(spark, sf_dir), threshold=0.4)


_HARDNEG_K = 5
_HARDNEG_LO = 0.1
_HARDNEG_HI = 0.4


@query(
    "hard_negative_pairs",
    f"""
WITH a AS (SELECT vec_id AS anchor_id, embedding AS avec, label AS albl FROM embeddings),
b AS (SELECT vec_id AS cand_id, embedding AS bvec, label AS blbl FROM embeddings),
banded AS (
  SELECT anchor_id, cand_id, {_COS.format(a='avec', b='bvec')} AS cos
  FROM a CROSS JOIN b
  WHERE anchor_id != cand_id AND albl != blbl
    AND {_COS.format(a='avec', b='bvec')} >= {_HARDNEG_LO}
    AND {_COS.format(a='avec', b='bvec')} < {_HARDNEG_HI}
)
SELECT anchor_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM banded
QUALIFY rank <= {_HARDNEG_K}
""",
)
def q_hard_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per anchor, the top-5
    cross-label neighbours with cosine in [0.1, 0.4) — the training-pair
    generator for embedding fine-tuning (cap below the near-dup grade so
    likely-mislabeled positives are excluded).  Blocked-matmul band scan
    with the mask inside the Arrow kernel, then a keyed per-anchor
    window; see functions/similarity.py:hard_negative_pairs for the
    IVF-composed variant this exact scan baselines."""
    return sim.hard_negative_pairs(
        _emb(spark, sf_dir), k=_HARDNEG_K, band_lo=_HARDNEG_LO, band_hi=_HARDNEG_HI
    )


@query(
    "hard_negative_pairs_ivf",
    f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
              WHERE vec_id >= 10
                AND vec_id < 10 + (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
                                   FROM embeddings)),
cell_scores AS (
  SELECT e.vec_id, c.cid, {_COS.format(a='e.embedding', b='c.cvec')} AS ccos
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, cid AS cell FROM cell_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1
),
probes AS (
  SELECT vec_id AS anchor_id, cid AS cell FROM cell_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= {sim.NPROBE}
),
a AS (SELECT e.vec_id AS anchor_id, e.embedding AS avec, e.label AS albl,
             p.cell
      FROM embeddings e JOIN probes p ON e.vec_id = p.anchor_id),
c2 AS (SELECT e.vec_id AS cand_id, e.embedding AS cvec, e.label AS blbl,
              s.cell
       FROM embeddings e JOIN assigned s ON e.vec_id = s.vec_id),
banded AS (
  SELECT a.anchor_id, c2.cand_id, {_COS.format(a='avec', b='cvec')} AS cos
  FROM c2 JOIN a USING (cell)
  WHERE c2.cand_id != a.anchor_id AND a.albl != c2.blbl
    AND {_COS.format(a='avec', b='cvec')} >= {_HARDNEG_LO}
    AND {_COS.format(a='avec', b='cvec')} < {_HARDNEG_HI}
)
SELECT anchor_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM banded
QUALIFY rank <= {_HARDNEG_K}
""",
)
def q_hard_negative_pairs_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for hard-negative mining (r10 sweep closure: the
    exact scan measured ×14-24 under 10× data — quadratic by
    definition): every anchor probes its {sim.NPROBE} nearest IVF cells
    and only those cells' members are cross-label band-filtered and
    top-k ranked.  The cell count scales as C = ⌈√N⌉ (cells = the first
    C corpus rows at id ≥ 10, deterministic on both engines), so
    candidate pairs are O(N·nprobe·√N) — a cell-keyed equi-join that
    becomes partition pruning once the corpus is written partitioned BY
    cell (functions/similarity.py:hard_negative_pairs_ivf)."""
    return sim.hard_negative_pairs_ivf(
        _emb(spark, sf_dir),
        k=_HARDNEG_K,
        band_lo=_HARDNEG_LO,
        band_hi=_HARDNEG_HI,
    )


def _neardup_bit_case() -> str:
    whens = " ".join(
        f"WHEN {aid} THEN CAST({1 << i} AS BIGINT)"
        for i, aid in enumerate(sim.NEARDUP_ANCHOR_IDS)
    )
    return f"CASE a.aid {whens} END"


_NEARDUP_ANCHOR_IDS_SQL = ", ".join(str(a) for a in sim.NEARDUP_ANCHOR_IDS)


@query(
    "hard_negative_pairs_ivf2",
    f"""
WITH c1n AS (SELECT min(c) AS c1 FROM range(1, 100000) t(c)
             WHERE c*c*c >= (SELECT count(*) FROM embeddings)),
cent1 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
          WHERE vec_id >= 10 AND vec_id < 10 + (SELECT c1 FROM c1n)),
c1_scores AS (
  SELECT e.vec_id, c.cid, {_COS.format(a='e.embedding', b='c.cvec')} AS ccos
  FROM embeddings e CROSS JOIN cent1 c
),
assigned1 AS (
  SELECT vec_id, cid AS cell FROM c1_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1
),
probes1 AS (
  SELECT vec_id AS anchor_id, cid AS cell FROM c1_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= {sim.NPROBE}
),
subcent AS (
  SELECT s.cell, e.vec_id AS sub, e.embedding AS svec
  FROM embeddings e JOIN assigned1 s ON e.vec_id = s.vec_id
  QUALIFY row_number() OVER (PARTITION BY s.cell ORDER BY e.vec_id)
          <= (SELECT c1 FROM c1n)
),
assigned2 AS (
  SELECT e.vec_id AS cand_id, e.embedding AS cvec, e.label AS blbl,
         s.cell, sc.sub
  FROM embeddings e
  JOIN assigned1 s ON e.vec_id = s.vec_id
  JOIN subcent sc ON sc.cell = s.cell
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
      ORDER BY {_COS.format(a='e.embedding', b='sc.svec')} DESC, sc.sub) = 1
),
probes2 AS (
  SELECT e.vec_id AS anchor_id, e.embedding AS avec, e.label AS albl,
         p.cell, sc.sub
  FROM embeddings e
  JOIN probes1 p ON e.vec_id = p.anchor_id
  JOIN subcent sc ON sc.cell = p.cell
  QUALIFY row_number() OVER (PARTITION BY e.vec_id, p.cell
      ORDER BY {_COS.format(a='e.embedding', b='sc.svec')} DESC, sc.sub) <= {sim.NPROBE}
),
banded AS (
  SELECT p.anchor_id, c2.cand_id, {_COS.format(a='p.avec', b='c2.cvec')} AS cos
  FROM assigned2 c2 JOIN probes2 p USING (cell, sub)
  WHERE c2.cand_id != p.anchor_id AND p.albl != c2.blbl
    AND {_COS.format(a='p.avec', b='c2.cvec')} >= {_HARDNEG_LO}
    AND {_COS.format(a='p.avec', b='c2.cvec')} < {_HARDNEG_HI}
)
SELECT anchor_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY anchor_id
                               ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM banded
QUALIFY rank <= {_HARDNEG_K}
""",
)
def q_hard_negative_pairs_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level IVF hard-negative mining — the O(N^(4/3)) successor
    the r11 sf10 decade demanded (the single-level sqrt-N variant is
    O(N^1.5) by design and measured x52 under 10x data at sf10):
    C1 = ceil(N^(1/3)) coarse cells x C1 sub-cells each, every term —
    coarse assignment, broadcast sub-assignment, per-anchor
    nprobe1*nprobe2*N^(1/3) candidates — bounded at N^(4/3).  All
    quantizer choices are deterministic and the oracle replays BOTH
    assignment levels and the nested probing exactly
    (functions/similarity.py:hard_negative_pairs_ivf2)."""
    return sim.hard_negative_pairs_ivf2(
        _emb(spark, sf_dir), k=_HARDNEG_K, band_lo=_HARDNEG_LO, band_hi=_HARDNEG_HI
    )


@query(
    "embedding_near_dups_bucketed",
    f"""
WITH anch AS (SELECT vec_id AS aid, embedding AS avec FROM embeddings
              WHERE vec_id IN ({_NEARDUP_ANCHOR_IDS_SQL})),
sigs AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN {_COS_DOT.format(a='e.embedding', b='a.avec')} > 0
                       THEN {_neardup_bit_case()} ELSE CAST(0 AS BIGINT) END)
              AS BIGINT) AS sig
  FROM embeddings e CROSS JOIN anch a
  GROUP BY e.vec_id
),
se AS (SELECT e.vec_id, e.embedding, s.sig
       FROM embeddings e JOIN sigs s USING (vec_id)),
a AS (SELECT vec_id AS a_id, embedding AS avec, sig AS asig FROM se),
b AS (SELECT vec_id AS b_id, embedding AS bvec, sig AS bsig FROM se)
SELECT a_id, b_id,
       CAST(bit_count(xor(asig, bsig)) AS INT) AS hamming,
       {_COS.format(a='avec', b='bvec')} AS cos
FROM a CROSS JOIN b
WHERE a_id < b_id
  AND bit_count(xor(asig, bsig)) <= {sim.NEARDUP_MAX_HAMMING}
  AND {_COS.format(a='avec', b='bvec')} >= 0.4
""",
)
def q_embedding_near_dups_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded SRP-LSH: candidates from a
    keyed (band, slice) equi-join (pigeonhole-complete for srp_hamming
    <= 5), then exact bit_count(xor) + cosine verify.  The oracle
    evaluates the SAME criterion all-pairs, so oracle equality proves
    the banding loses nothing.  The keyed-equi-join plan SHAPE is the
    scale path, but the fixture's loose tau=0.4 criterion is
    output-bound quadratic (the r11 sf10 lesson — Hamming ball 4.8% of
    the 18-bit space), so the operator carries an in-code 100k-row
    guard naming the real knob: a production threshold (cos >= 0.9)
    makes the same plan sparse
    (functions/similarity.py:embedding_near_dup_banded)."""
    return sim.embedding_near_dup_banded(_emb(spark, sf_dir), threshold=0.4)


# --- multimodal ----------------------------------------------------------------


@query(
    "multimodal_manifest",
    """
SELECT doc_id,
       'text/plain' AS mime_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
""",
)
def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload manifest: typed metadata (mime, byte length, sha256)
    for every opaque payload — the catalog layer of multimodal columns."""
    p = mm.attach_payload(_docs(spark, sf_dir))
    return p.select(
        "doc_id",
        F.col("media_meta.mime_type").alias("mime_type"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.sha256").alias("sha256"),
    )


_MM_FEATURES_SQL = """
WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
tot AS (SELECT doc_id, greatest(1, len(h) // 2) AS total FROM hx),
byt AS (
  SELECT doc_id,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) % 16
           AS bin_idx
  FROM (SELECT doc_id, h, unnest(range(0, len(h) // 2)) AS i FROM hx)
),
counts AS (SELECT doc_id, bin_idx, CAST(count(*) AS BIGINT) AS n
           FROM byt GROUP BY 1, 2),
grid AS (SELECT tot.doc_id, g.bin_idx, tot.total
         FROM tot CROSS JOIN (SELECT unnest(range(0, 16)) AS bin_idx) g)
SELECT grid.doc_id, CAST(grid.bin_idx AS INT) AS bin_idx,
       CAST((2000000 * coalesce(counts.n, 0) + grid.total)
            // (2 * grid.total) AS DOUBLE) / 1000000.0 AS value
FROM grid
LEFT JOIN counts USING (doc_id, bin_idx)
"""


def _recover_exact_count(raw: Column, total: Column) -> Column:
    """HALF_UP(raw·total) — recover the integer count a kernel float of
    ``round(n/total, 6)`` encodes.  Exact only while total < 10⁶ (the
    float's error ≤ 5e-7·total must stay under the 0.5 rounding
    margin); past the bound the expression raise_errors instead of
    silently recovering a wrong n (r13 ADVICE).  Used in the value
    branch so Catalyst cannot prune the check away."""
    return (
        F.when(
            total >= 1_000_000,
            F.raise_error(
                "multimodal_features float-recovery bound: payload "
                ">= 1e6 bytes makes round(value*total) ambiguous; "
                "use payload_byte_histogram's integer surface"
            ),
        )
        .otherwise(F.round(raw * total, 0))
        .cast("long")
    )


@query("multimodal_features", _MM_FEATURES_SQL)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (byte
    histogram stand-in for media decode), exploded to one
    ``(doc_id, bin_idx, value)`` row per bucket (scalar cells — the
    driver's canonicalizer can't hash array cells, round-5 red row).

    Oracle-backed since round 12 (the last NO_ORACLE_OK entry): the
    kernel's own floats (functions/multimodal.py:extract_features,
    Python ``round(n/total, 6)``) round HALF-EVEN, whose tie decisions
    at representable points (e.g. 1/128) no SQL engine reproduces — so
    the registered surface recovers the exact integer count from the
    kernel float (n = HALF_UP(value·total) — exact only while
    total < 10⁶ bytes, where the kernel float's error ≤ 5e-7·total
    stays below the 0.5 recovery margin; an oversized payload would
    silently recover a wrong n, so the plan raise_errors at the bound
    instead of hashing wrong — the same recovery
    ``payload_byte_histogram`` proves end to end) and
    re-rounds with the exact-rational HALF_UP convention
    ``(2·10⁶·n + total) div (2·total) / 10⁶``, pure integer arithmetic
    both engines compute identically.  The query still drives the full
    payload plumbing — attach_payload byte fidelity, Arrow transfer,
    bincount kernel, dense 16-bin grid — because a wrong kernel float
    shifts the recovered n and fails the value hash."""
    payloads = mm.attach_payload(_docs(spark, sf_dir))
    feats = mm.extract_features(payloads)
    meta = payloads.select(
        "doc_id",
        F.greatest(F.lit(1).cast("long"), F.col("media_meta.byte_len")).alias(
            "total"
        ),
    )
    return (
        feats.select("doc_id", F.posexplode("features").alias("bin_idx", "raw"))
        .join(meta, "doc_id")
        .withColumn("n", _recover_exact_count(F.col("raw"), F.col("total")))
        .select(
            "doc_id",
            "bin_idx",
            (
                F.expr("(2000000L * n + total) div (2L * total)")
                / F.lit(1000000.0)
            ).alias("value"),
        )
    )


_PAYLOAD_HIST_SQL = """
WITH hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
byt AS (
  SELECT doc_id,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) % 16
           AS bin_idx
  FROM (SELECT doc_id, h, unnest(range(0, len(h) // 2)) AS i FROM hx)
),
counts AS (SELECT doc_id, bin_idx, CAST(count(*) AS BIGINT) AS n
           FROM byt GROUP BY 1, 2),
grid AS (SELECT d.doc_id, g.bin_idx
         FROM (SELECT DISTINCT doc_id FROM hx) d
         CROSS JOIN (SELECT unnest(range(0, 16)) AS bin_idx) g),
tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total FROM counts GROUP BY 1)
SELECT grid.doc_id, CAST(grid.bin_idx AS INT) AS bin_idx,
       coalesce(counts.n, 0) AS n, tot.total
FROM grid
LEFT JOIN counts USING (doc_id, bin_idx)
JOIN tot ON tot.doc_id = grid.doc_id
"""


@query("payload_byte_histogram", _PAYLOAD_HIST_SQL)
def q_payload_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INTEGER-exact, oracle-backed twin of multimodal_features,
    routed through the SAME Arrow-batched ``extract_features`` kernel:
    the kernel's normalized features are value = round(n/total, 6), so
    the exact integer count recovers as n = HALF_UP(value·total) —
    error ≤ 5e-7·total ≪ 0.5 for any document under a megabyte — and
    DuckDB recomputes every (count, total) cell straight from the
    document bytes.  The driver therefore value-checks the payload
    plumbing end to end (attach_payload byte fidelity, Arrow transfer,
    bincount kernel, dense 16-bin grid); multimodal_features itself
    stays the float feature-vector stand-in (rows-only: its normalized
    round() can sit on representable ties)."""
    payloads = mm.attach_payload(_docs(spark, sf_dir))
    feats = mm.extract_features(payloads)
    meta = payloads.select(
        "doc_id", F.col("media_meta.byte_len").alias("total")
    )
    return (
        feats.select("doc_id", F.posexplode("features").alias("bin_idx", "value"))
        .join(meta, "doc_id")
        .select(
            "doc_id",
            "bin_idx",
            F.round(F.col("value") * F.col("total"), 0).cast("long").alias("n"),
            "total",
        )
    )


_AHASH_MAX_HAMMING = 6

#: full relational twin of the decode→aHash→hamming-join pipeline: the
#: r10 closure of the r9 verdict's NO_ORACLE_OK item.  The aHash bit rule
#: is EXACT integer arithmetic (functions/multimodal.py:_ahash_of —
#: 64·(r+g+b) > Σ(r+g+b), scale-invariant vs the usual float channel
#: mean), so SQL recomputes the identical 64 bits per image from the raw
#: document bytes, packs them signed MSB-first (bit 0 contributes
#: −2^63), and verifies every pair by bit_count(xor) — an all-pairs
#: check on DuckDB's side only (the ENGINE keeps the banded pigeonhole
#: join; the oracle's job is exhaustiveness, not scale).
_AHASH_DUPS_SQL = f"""
WITH hx AS (
  SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
  FROM documents
),
px AS (
  SELECT doc_id, CAST(j AS BIGINT) AS j,
         CAST('0x' || substr(h, CAST(6 * j + 1 AS INT), 2) AS BIGINT)
       + CAST('0x' || substr(h, CAST(6 * j + 3 AS INT), 2) AS BIGINT)
       + CAST('0x' || substr(h, CAST(6 * j + 5 AS INT), 2) AS BIGINT) AS g3
  FROM (SELECT doc_id, h, unnest(range(0, 64)) AS j FROM hx)
),
bits AS (
  SELECT doc_id, j,
         CASE WHEN 64 * g3 > sum(g3) OVER (PARTITION BY doc_id)
              THEN 1 ELSE 0 END AS b
  FROM px
),
hsh AS (
  SELECT doc_id,
         sum(CASE WHEN j = 0 THEN b * (-9223372036854775807 - 1)
                  ELSE b * (CAST(1 AS BIGINT) << CAST(63 - j AS INT)) END) AS ahash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {_AHASH_MAX_HAMMING}
"""


@query("image_ahash_dups", _AHASH_DUPS_SQL)
def q_image_ahash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs via perceptual average-hash: decode →
    8×8 grayscale aHash (functions/multimodal.py:image_ahash) → banded
    hamming self-join (pigeonhole over {h+1} bands, exact
    bit_count(xor) verify) — the image-side analog of SimHash text
    dedup, sharing its join economics.

    The container has no image fixture (and no PIL to make one), so the
    corpus is RENDERED deterministically: each document's first 192
    text bytes become an 8×8 RGB PPM entirely JVM-side (encode + rpad +
    concat — no Python), which preserves the fixture's planted near-dup
    structure at the pixel level; the decode→hash→join pipeline itself
    is byte-for-byte the one a PIL-backed deployment runs.  ORACLE-
    backed since r10: the integer-exact aHash rule is recomputed bit-
    for-bit in SQL from the same bytes and every pair verified against
    DuckDB's all-pairs hamming join — so the decode, the hash packing,
    AND the banding's no-loss pigeonhole property are all driver-
    checked; tests/test_extensions.py additionally asserts hash parity
    against a pure-Python replay and bandedness == all-pairs."""
    docs = _docs(spark, sf_dir)
    # Truncate/pad AFTER encoding: substring/rpad on the UTF-8 BYTES,
    # not on characters — a multi-byte character inside the first 192
    # chars would otherwise make the body longer than the 192 pixel
    # bytes the P6 8x8 header declares, silently shifting every pixel.
    body = F.expr("rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')")
    # NO forced fan-out here (unlike png/jpeg_decode_stats): the 8×8 PPM
    # parse is ~µs/doc, so the banded self-join dominates and an extra
    # repartition shuffle only adds overhead (measured 2.0s -> 7.5s)
    payloads = docs.select(
        "doc_id",
        F.concat(F.encode(F.lit("P6\n8 8\n255\n"), "UTF-8"), body).alias("payload"),
    )
    hashes = mm.image_ahash(payloads)
    return mm.ahash_dup_pairs(hashes, max_hamming=_AHASH_MAX_HAMMING)


_PNG_STATS_SQL = """
WITH hx AS (
  SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
  FROM documents
),
byt AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) AS v
  FROM (SELECT doc_id, h, unnest(range(0, 192)) AS i FROM hx)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(sum((i + 1) * v) AS BIGINT) AS px_wsum
FROM byt GROUP BY doc_id
"""


@query("png_decode_stats", _PNG_STATS_SQL)
def q_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG round-trip with a FULL value oracle — the round-9 closure of
    the compressed-image gap: each document's first 192 text bytes are
    rendered as an 8×8 RGB image, compressed to real PNG (stdlib
    DEFLATE; row filters cycle None/Sub/Up/Average/Paeth so every
    filter type is exercised on every image), then decoded back by the
    vendored pure-numpy PNG decoder
    (``functions/multimodal.py:_decode_png`` — zlib inflate + per-row
    unfilter) and reduced to per-image pixel stats (count / sum /
    position-weighted sum).  The oracle computes the same stats
    straight from the document bytes in SQL (hex-space truncate+pad,
    '0x'-cast per byte) — a hash match proves the PNG encoder, the
    DEFLATE round-trip, and all five unfilter paths are byte-exact on
    real data.  Scale shape: encode+decode are Arrow-batched pandas
    kernels, the stats fold is an array aggregate INSIDE the scan
    projection (zip_with + aggregate, whole-stage codegen) — zero
    shuffles end to end."""
    from depositaja_spark.functions.multimodal import encode_png

    docs = _docs(spark, sf_dir)
    # byte-level truncate/pad (see image_ahash_dups: rpad on UTF-8 BYTES)
    body = F.expr("rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')")

    @F.pandas_udf("binary")
    def to_png(b: pd.Series) -> pd.Series:
        return b.map(
            lambda x: encode_png(
                np.frombuffer(bytes(x), np.uint8).reshape(8, 8, 3)
            )
        )

    # full-width fan-out: the per-row codec kernel dwarfs the scan by
    # ~1000x, so size-scaled spread() under-parallelizes (8 tasks on 32
    # cores at sf0.1 — the r10 sweep's finding); pin to executor width
    payloads = spread(
        docs, parallelism=spark.sparkContext.defaultParallelism
    ).select("doc_id", to_png(body).alias("payload"))
    # fused decode→stats kernel (r13, guide §4/§8): "position" = the old
    # zip_with(pixels, sequence(1, n)) 1-based weight, folded as exact
    # int64 inside the kernel — same integers, no pixel-array transfer
    return mm.decode_media_stats(payloads, weighting="position")


_JPEG_STATS_SQL = """
WITH hx AS (
  SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
  FROM documents
),
byt AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) AS v
  FROM (SELECT doc_id, h, unnest(range(0, 192)) AS i FROM hx)
)
SELECT doc_id,
       CAST(count(*) * 192 AS BIGINT) AS n_px,
       CAST(192 * sum(v) AS BIGINT) AS px_sum,
       CAST(192 * sum((i + 1) * v) AS BIGINT) AS px_wsum
FROM byt GROUP BY doc_id
"""


@query("jpeg_decode_stats", _JPEG_STATS_SQL)
def q_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG round-trip with a FULL value oracle — the round-10 closure of
    the last compressed-image gap (r9 verdict "what's missing" #2): each
    document's first 192 text bytes become one CONSTANT 8×8 block each of
    a 96×128 RGB image (R=G=B), encoded as REAL baseline JPEG — 4:2:0
    chroma subsampling, restart intervals (one RST marker per image),
    standard Annex-K Huffman tables — then decoded back by the vendored
    pure-numpy decoder (``functions/multimodal.py:_decode_jpeg``: marker
    parse, Huffman + DC prediction, dequantize, float64 matrix IDCT,
    chroma upsample, YCbCr→RGB) and reduced to per-image pixel stats.

    Constant blocks under all-ones quant tables make the lossy format
    EXACT here: every block's spectrum is DC-only, DC = 8·(v−128) is an
    integer (float error ~1e-13 ≪ the 0.5 rounding margin), chroma is
    constant 128 (R=G=B), so decode reproduces every pixel bit-exactly —
    and the DuckDB oracle recomputes the stats straight from the document
    bytes, proving the Huffman bitstream, DC prediction chain, restart
    handling, IDCT, upsample, and color convert on every driver run.
    Scale shape: encode+decode are Arrow-batched pandas kernels, the
    stats fold is a codegen'd array aggregate inside the scan projection
    — zero shuffles end to end (the png_decode_stats pattern)."""
    from depositaja_spark.functions.multimodal import encode_jpeg

    docs = _docs(spark, sf_dir)
    # byte-level truncate/pad (see image_ahash_dups: rpad on UTF-8 BYTES)
    body = F.expr("rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')")

    @F.pandas_udf("binary")
    def to_jpeg(b: pd.Series) -> pd.Series:
        def enc(x: bytes) -> bytes:
            v = np.frombuffer(bytes(x), np.uint8)
            img = np.repeat(np.repeat(v.reshape(12, 16), 8, 0), 8, 1)
            return encode_jpeg(
                np.repeat(img[..., None], 3, axis=2),
                quality=None,
                subsample=True,
                restart_interval=24,
            )

        return b.map(enc)

    # full-width fan-out (see png_decode_stats: codec kernel >> scan)
    payloads = spread(
        docs, parallelism=spark.sparkContext.defaultParallelism
    ).select("doc_id", to_jpeg(body).alias("payload"))
    # fused decode→stats kernel (r13, guide §4/§8): the "block8" weight is
    # the 1-based 8×8-tile index — for this 96×128×3 layout exactly the old
    # JVM fold's ((p div 3) div 1024)·16 + (((p div 3) % 128) div 8) + 1;
    # byte i owns block i, so weighting by block+1 mirrors the oracle's
    # (i+1)·v byte weighting exactly (×192 pixels per byte).  Same integer
    # results, but 4 longs per image cross the Arrow boundary instead of
    # 36,864 int32 pixels (plan: 2 Python nodes + zero-copy stats, the
    # aggregate/zip_with/sequence codegen fold gone).
    return mm.decode_media_stats(payloads, weighting="block8")


_WAV_STATS_SQL = """
WITH hx AS (
  SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
  FROM documents
),
byt AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) - 128 AS s
  FROM (SELECT doc_id, h, unnest(range(0, 192)) AS i FROM hx)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(s * s) AS BIGINT) AS sq_sum,
       CAST(sum(CASE WHEN i > 0 AND (s < 0) != (lag_s < 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_crossings,
       CAST(max(abs(s)) AS BIGINT) AS peak_abs
FROM (SELECT doc_id, i, s, lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS lag_s
      FROM byt)
GROUP BY doc_id
"""


@query("wav_decode_stats", _WAV_STATS_SQL)
def q_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM WAV round-trip with a FULL value oracle — the audio twin of
    png/jpeg_decode_stats, making every multimodal DECODE family
    oracle-backed: each document's first 192 text bytes become the
    sample data of a real 8-bit mono RIFF/WAVE payload (the 44-byte
    header is a constant — built JVM-side with lit ++ concat, no
    Python), decoded back by the vendored RIFF/PCM decoder
    (``functions/multimodal.py:_decode_wav``: chunk walk + unsigned-8
    normalization) and reduced to INTEGER-exact stats (count, Σs², sign
    changes, max|s| over centered samples s = b−128) that the DuckDB
    oracle recomputes straight from the document bytes.  8-bit
    normalization divides by 128 — a power of two — so mapping the
    decoded floats back to integers is exact and the whole parse path
    is proven byte-exact per driver run.  Scale shape: decode+stats is
    one Arrow-batched kernel inside the scan projection — zero
    shuffles."""
    from depositaja_spark.functions.multimodal import (
        audio_pcm_stats,
        wav_header_pcm8,
    )

    docs = _docs(spark, sf_dir)
    body = F.expr("rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')")
    payloads = docs.select(
        "doc_id",
        F.concat(F.lit(bytearray(wav_header_pcm8(192))), body).alias("payload"),
    )
    return audio_pcm_stats(payloads)


#: y4m render geometry: 192 doc bytes = 6 mono 8×4 frames of 32 bytes
_Y4M_FRAME_BYTES = 32
_Y4M_EVERY_N = 2

_Y4M_STATS_SQL = f"""
WITH hx AS (
  SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
  FROM documents
),
byt AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) AS v
  FROM (SELECT doc_id, h, unnest(range(0, 192)) AS i FROM hx)
)
SELECT doc_id,
       CAST(i // {_Y4M_FRAME_BYTES} AS INT) AS frame_idx,
       CAST(sum(v) AS BIGINT) AS f_sum,
       CAST(min(v) AS BIGINT) AS f_min,
       CAST(max(v) AS BIGINT) AS f_max
FROM byt
WHERE (i // {_Y4M_FRAME_BYTES}) % {_Y4M_EVERY_N} = 0
GROUP BY doc_id, frame_idx
"""


@query("y4m_frame_stats", _Y4M_STATS_SQL)
def q_y4m_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YUV4MPEG2 frame sampling with a FULL value oracle — the video twin
    of png/jpeg/wav_decode_stats, completing the multimodal decode
    family's oracle coverage: each document's first 192 text bytes
    become 6 mono 8×4 frames of a real y4m stream (ASCII stream header +
    FRAME markers, assembled JVM-side with lit ++ substring ++ concat),
    every 2nd frame is sampled through the vendored demuxer
    (``functions/multimodal.py:_demux_y4m`` — header parse, frame-size
    arithmetic, offset skipping), and each SAMPLED frame reduces to
    integer stats (Σ/min/max of its bytes) via JVM-side hex extraction —
    which the DuckDB oracle recomputes straight from the document bytes,
    proving the demux offsets and sampling stride byte-exact per driver
    run.  Scale shape: demux is an Arrow-batched flatMap (unsampled
    frames skipped by offset arithmetic, bytes never copied), the stats
    fold is codegen'd array arithmetic — zero shuffles."""
    docs = _docs(spark, sf_dir)
    # byte-level truncate/pad (see image_ahash_dups), then slice per frame
    body = "rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')"
    hdr = F.lit(bytearray(b"YUV4MPEG2 W8 H4 F25:1 Ip A1:1 Cmono\n"))
    pieces = [hdr]
    for f in range(6):
        pieces.append(F.lit(bytearray(b"FRAME\n")))
        pieces.append(
            F.expr(
                f"substring({body}, {f * _Y4M_FRAME_BYTES + 1}, {_Y4M_FRAME_BYTES})"
            )
        )
    payloads = docs.select("doc_id", F.concat(*pieces).alias("payload"))
    sampled = mm.frame_sample(payloads, every_n=_Y4M_EVERY_N)
    barr = (
        f"transform(sequence(0, {_Y4M_FRAME_BYTES - 1}),"
        " p -> CAST(conv(substring(hex(frame), 2 * p + 1, 2), 16, 10) AS BIGINT))"
    )
    return sampled.select(
        "doc_id",
        "frame_idx",
        F.expr(f"aggregate({barr}, 0L, (acc, x) -> acc + x)").alias("f_sum"),
        F.expr(f"array_min({barr})").alias("f_min"),
        F.expr(f"array_max({barr})").alias("f_max"),
    )


# --- faithful stateful detector (streaming semantics, batch replay) -----------


def _exact_detector_sql(
    deposits_sql: str | None = None, period_s: int | None = None
) -> str:
    """The detector fold as a DuckDB RECURSIVE CTE: the batch replay is
    order-deterministic given ``seq``, so the add-then-maybe-reset state
    machine unrolls into one recursion step per deposit rank.  Floating-
    point adds happen in the identical per-wallet seq order as the Spark
    replay, so ``received`` matches bit-for-bit, not just to rounding.

    ``deposits_sql`` overrides the events-derived deposit source with any
    SELECT producing (wallet_id, amount, now, seq) — the hypothesis
    property suite (tests/test_detector_properties.py) replays generated
    adversarial sequences through this SAME fold, so the registered
    oracle and the fuzzer share one SQL implementation."""
    from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS

    if period_s is None:
        period_s = ROLLING_PERIOD_SECONDS
    if deposits_sql is None:
        deposits_sql = """
  SELECT CAST(user_id AS VARCHAR) AS wallet_id,
         value AS amount,
         CAST(floor(epoch(ts)) AS BIGINT) AS now,
         event_id AS seq
  FROM events
  WHERE event_type = 'purchase' AND value > 0
"""
    return f"""
WITH RECURSIVE deposits AS ({deposits_sql}),
ordered AS (
  SELECT wallet_id, amount, now, seq,
         row_number() OVER (PARTITION BY wallet_id ORDER BY seq) AS rn
  FROM deposits
),
fold AS (
  SELECT wallet_id, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS seq,
         CAST(0 AS BIGINT) AS start, CAST(0.0 AS DOUBLE) AS received
  FROM (SELECT DISTINCT wallet_id FROM ordered)
  UNION ALL
  SELECT o.wallet_id, o.rn, o.seq,
         CASE WHEN f.start = 0 THEN o.now
              WHEN o.now - f.start > {period_s} THEN 0
              ELSE f.start END AS start,
         CASE WHEN f.start <> 0 AND o.now - f.start > {period_s}
              THEN 0.0
              ELSE f.received + o.amount END AS received
  FROM fold f
  JOIN ordered o ON o.wallet_id = f.wallet_id AND o.rn = f.rn + 1
)
SELECT wallet_id, seq,
       NOT (received >= {MAX_AMOUNT} AND start <> 0) AS flag_removed,
       CASE WHEN received >= {MAX_AMOUNT} AND start <> 0
            THEN start ELSE 0 END AS rolling_period_start_unix,
       received
FROM fold WHERE rn >= 1
"""


@query("exact_detector_replay", _exact_detector_sql())
def q_exact_detector_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's EXACT processing-time detector semantics
    (detector/detector.go:47-75: add, maybe-reset-swallowing-current,
    flag-on-every-event) replayed deterministically with event time as
    the clock.  Sequential per-key state machine; because the fold is
    order-deterministic given ``seq``, it IS oracle-expressible — as a
    DuckDB recursive CTE unrolling the same transition (this is the
    faithful A3 replica, so it carries the strongest available check).
    Batch/stream equivalence is covered in tests/test_streaming.py."""
    from depositaja_spark.operators import valid_deposits
    from depositaja_spark.sources import deposits_from_events
    from depositaja_spark.streaming.detector_state import exact_detector_batch

    deposits = valid_deposits(deposits_from_events(load_table(spark, sf_dir, "events")))
    return exact_detector_batch(deposits)


# --- chunking & packing (training-data prep) ---------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48  # 16-token overlap

#: hard ceiling on chunks per document, shared by the Spark-side guard
#: and the DuckDB oracles (the oracle generates chunk ids from
#: range(0, CAP), so it materializes CAP rows per doc pre-filter — keep
#: it small enough that the oracle stays cheap).  A document would need
#: > (CAP-1) * _CHUNK_STRIDE + _CHUNK_SIZE ≈ 48k tokens to hit it;
#: tests/test_extensions.py asserts the test corpora stay far below, so
#: both engines agree by construction rather than silently diverging on
#: a mega-document.
ORACLE_CHUNK_CAP = 1000


@query(
    "chunk_documents",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_to_string(toks[i * {_CHUNK_STRIDE} + 1 : i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' ') AS chunk,
       CAST(least(len(toks) - i * {_CHUNK_STRIDE}, {_CHUNK_SIZE}) AS INT) AS n_tokens
FROM toks
CROSS JOIN (SELECT unnest(range(0, 1000)) AS i)
WHERE i < greatest(1, CAST(ceil((len(toks) - {_CHUNK_SIZE}) / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1)
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({_CHUNK_SIZE}-token chunks,
    stride {_CHUNK_STRIDE}) — the RAG/pretraining segmentation step.
    Chunk boundaries computed array-side (sequence + slice), exploded once;
    no shuffle at all — chunking is embarrassingly row-local, which is why
    it scales to any corpus."""
    toks = tx.tokens("text")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(_CHUNK_SIZE)) / F.lit(_CHUNK_STRIDE) + 1).cast("int")
    )
    chunk_idx = F.sequence(F.lit(0), n_chunks - 1)
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", toks.alias("toks"), F.explode(chunk_idx).alias("chunk_id"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_SIZE),
                " ",
            ).alias("chunk"),
            F.least(
                F.size("toks") - F.col("chunk_id") * _CHUNK_STRIDE, F.lit(_CHUNK_SIZE)
            ).cast("int").alias("n_tokens"),
        )
    )


_PACK_TARGET = 512


@query(
    "pack_documents",
    f"""
WITH toks AS (
  SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents
),
runs AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor((cum - n_tokens) / {_PACK_TARGET}) AS BIGINT) AS pack_id
FROM runs
""",
)
def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents concatenated per language into
    ~{_PACK_TARGET}-token training bins (bin = cumulative-token prefix /
    target — the streaming-greedy packing used to fill context windows).

    The oracle states the spec as one window per language; the Spark plan
    computes the identical running sum with the two-level bucket-offset
    decomposition (functions/windows.py) — a per-language window would
    put ~half of any web corpus (English) into ONE task's sort at scale,
    while here no task sorts more than a bucket's worth of rows."""
    docs = _docs(spark, sf_dir)
    from depositaja_spark.functions.windows import bucketed_running_sum, pack_ids

    n = F.size(tx.tokens("text"))
    runs = bucketed_running_sum(
        docs.select("doc_id", "lang", n.alias("n_tokens")),
        ["lang"],
        "doc_id",
        "n_tokens",
    )
    return runs.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        pack_ids(F.col("cum"), F.col("n_tokens"), _PACK_TARGET).alias("pack_id"),
    )


# --- corpus curation (split / sample / decontaminate / passage dedup) --------

#: train/val assignment threshold on the first two md5 hex chars —
#: 'e5' keeps 230/256 ≈ 89.8% in train.  Lexicographic compare of the
#: lowercase hex prefix is a uniform draw on BOTH engines (identical md5)
_SPLIT_HEX = "e5"
_SPLIT_SALT = "split-v1:"


@query(
    "train_val_split",
    f"""
SELECT doc_id,
       CASE WHEN substr(md5('{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) <= '{_SPLIT_HEX}'
            THEN 'train' ELSE 'val' END AS split
FROM documents
""",
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val split — the reproducibility
    primitive of every training pipeline: membership depends only on
    (salt, doc_id), so re-runs, backfills, and incremental arrivals land
    in the same split with no stored assignment table and no shuffle
    (row-local projection; the salt versions the split)."""
    d = _docs(spark, sf_dir)
    frac = F.substring(F.md5(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2)
    return d.select(
        "doc_id",
        F.when(frac <= _SPLIT_HEX, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


#: per-language keep-rate for mixture sampling, as 4-hex-char thresholds
#: (keep iff the doc's hash prefix sorts below the threshold): en is kept
#: in full ('zzzz' sorts above every hex string), everything else at 50%
_MIX_SALT = "mix-v1:"
_MIX_THRESH = {"en": "zzzz"}
_MIX_DEFAULT = "8000"


@query(
    "mixture_sample",
    f"""
SELECT doc_id, lang
FROM documents
WHERE substr(md5('{_MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE lang WHEN 'en' THEN '{_MIX_THRESH["en"]}' ELSE '{_MIX_DEFAULT}' END
""",
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture/source-weighted sampling: keep each document with a
    per-language rate (en 100%, others 50%) via the same salted-hash
    uniform as train_val_split — deterministic, shuffle-free, and exact
    on re-runs (unlike ``sampleBy``, whose Bernoulli draw depends on
    partitioning).  This is how pretraining mixtures re-weight sources
    at 100 TB: a row-local filter pushed to the scan, not a sample
    collected and re-written."""
    d = _docs(spark, sf_dir)
    frac = F.substring(F.md5(F.concat(F.lit(_MIX_SALT), F.col("doc_id").cast("string"))), 1, 4)
    thresh = F.when(F.col("lang") == "en", F.lit(_MIX_THRESH["en"])).otherwise(
        F.lit(_MIX_DEFAULT)
    )
    return d.filter(frac < thresh).select("doc_id", "lang")


#: decontamination: shingle-overlap against a benchmark set.  Benchmark =
#: every 97th doc (stand-in for an eval suite); τ = 8 shared 3-gram
#: shingles flags a doc as contaminated
_BENCH_MOD = 97
_CONTAM_TAU = 8


@query(
    "decontaminate",
    f"""
WITH {_SHINGLES_SQL},
bench AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % {_BENCH_MOD} = 0)
SELECT c.doc_id,
       b.doc_id AS bench_id,
       count(*) AS overlap,
       count(*) >= {_CONTAM_TAU} AS contaminated
FROM shingles c JOIN bench b ON c.shingle = b.shingle AND c.doc_id <> b.doc_id
WHERE c.doc_id % {_BENCH_MOD} <> 0
GROUP BY 1, 2
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the eval-leakage gate every training
    corpus runs): per (corpus doc, benchmark doc), the count of shared
    3-token shingles, flagged at τ={_CONTAM_TAU}.

    Scale shape: the benchmark side is tiny by definition (an eval suite,
    not a corpus), so its shingle set is **broadcast** — the 100 TB corpus
    side is scanned once, never shuffled; the only exchange is the final
    per-pair count aggregation on the (tiny) match set."""
    docs = _docs(spark, sf_dir)
    sh = dd.shingles(docs, 3).select("doc_id", "shingle")
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corpus = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .select(
            "doc_id",
            "bench_id",
            "overlap",
            (F.col("overlap") >= _CONTAM_TAU).alias("contaminated"),
        )
    )


# --- semantic decontamination (embedding-cosine complement) -------------------
#
# N-gram overlap misses paraphrased eval leakage; the semantic tier flags
# corpus vectors whose cosine against any benchmark vector clears τ.
# Candidate generation is the SRP bucket join (same deterministic anchor
# planes as ann_topk_lsh — oracle-expressible, recall measured in
# tests/test_extensions.py for the ANN path), so the corpus is never
# cross-joined against the benchmark at scale.

_SEM_TAU = 0.35


def _decontaminate_semantic_sql() -> str:
    return f"""
WITH anch AS (SELECT vec_id AS aid, embedding AS avec FROM embeddings
              WHERE vec_id IN ({_ANCHOR_IDS_SQL})),
buckets AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN {_COS_DOT.format(a='e.embedding', b='a.avec')} > 0
                       THEN {_anchor_bit_case()} ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN anch a
  GROUP BY e.vec_id
),
be AS (
  SELECT e.vec_id, e.embedding, b.bucket FROM embeddings e JOIN buckets b USING (vec_id)
),
bench AS (SELECT vec_id AS bench_id, embedding AS bvec, bucket
          FROM be WHERE vec_id % {_BENCH_MOD} = 0),
c AS (SELECT vec_id, embedding, bucket FROM be WHERE vec_id % {_BENCH_MOD} <> 0)
SELECT vec_id, bench_id, cos FROM (
  SELECT c.vec_id, bench_id,
         {_COS.format(a='c.embedding', b='bench.bvec')} AS cos
  FROM c JOIN bench USING (bucket)
) WHERE cos >= {_SEM_TAU}
"""


@query("decontaminate_semantic", _decontaminate_semantic_sql())
def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: corpus embeddings whose cosine against a
    benchmark vector (vec_id % {_BENCH_MOD} == 0 plays the eval suite)
    reaches τ={_SEM_TAU}, candidates pruned to shared SRP buckets.

    OUTPUT-BOUND QUADRATIC under the fixture's criterion (the r12 sf10
    ledger: output rows grew ×97 under 10× data, 2,194 → 213,036 —
    both join sides scale with the corpus and τ={_SEM_TAU} passes
    ~0.06% of random cross pairs, so |output| ∝ N²/{_BENCH_MOD}; no
    plan fixes quadratic OUTPUT).  The criterion is the knob, not the
    plan: a REAL eval suite is a fixed small table (making candidates
    and output linear in N — the registered shape of
    ``decontaminate_semantic_fixed`` below), and a production τ ≥ 0.9
    makes even the scaled-benchmark variant sparse.  Inputs past 100k
    embedding rows are refused with that pointer, mirroring
    ``embedding_near_dup_banded``'s guard (same r11 finding class)."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    if n > 100_000:
        raise ValueError(
            f"decontaminate_semantic is output-bound quadratic under the "
            f"fixture's scaled-benchmark criterion (output ∝ N²·density(τ="
            f"{_SEM_TAU}); measured ×97 output under 10× data) and is "
            f"capped at 100000 embedding rows; got {n}.  Use "
            f"decontaminate_semantic_fixed (fixed-size benchmark, linear) "
            f"or raise the threshold to a production τ ≥ 0.9."
        )
    bucketed = sim.with_srp_buckets(emb)
    bench = bucketed.filter(F.col("vec_id") % _BENCH_MOD == 0).select(
        F.col("vec_id").alias("bench_id"),
        F.col("embedding").alias("bvec"),
        "bucket",
    )
    corpus = bucketed.filter(F.col("vec_id") % _BENCH_MOD != 0)
    cos = F.round(sim.cosine(F.col("embedding"), F.col("bvec")), 6)
    return (
        corpus.join(bench, "bucket")
        .select("vec_id", "bench_id", cos.alias("cos"))
        .filter(F.col("cos") >= _SEM_TAU)
    )


_FIXED_BENCH_K = 32


def _decontaminate_semantic_fixed_sql() -> str:
    return f"""
WITH bench AS (
  SELECT vec_id AS bench_id, embedding AS bvec FROM embeddings
  WHERE vec_id % {_BENCH_MOD} = 0 ORDER BY vec_id LIMIT {_FIXED_BENCH_K}
),
c AS (SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % {_BENCH_MOD} <> 0)
SELECT vec_id, bench_id, cos FROM (
  SELECT c.vec_id, bench.bench_id,
         {_COS.format(a='c.embedding', b='bench.bvec')} AS cos
  FROM c CROSS JOIN bench
) WHERE cos >= {_SEM_TAU}
"""


@query("decontaminate_semantic_fixed", _decontaminate_semantic_fixed_sql())
def q_decontaminate_semantic_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination against a FIXED-SIZE benchmark — the
    production shape (an eval suite is a constant small table, not a
    corpus-sized carve-out): the first {_FIXED_BENCH_K} benchmark
    vectors by id, broadcast against one corpus scan with the exact
    cosine (no SRP recall loss — pruning is pointless when the inner
    side is a constant).  Cost and output are O(N·K): the scan
    dominates, the candidate set never exceeds N·{_FIXED_BENCH_K}, and
    output is bounded by the corpus row count per benchmark vector.
    This is the linear sibling the quadratic scaled-benchmark variant's
    guard points at (see ``decontaminate_semantic``; r12 sf10 ledger)."""
    emb = _emb(spark, sf_dir)
    bench = (
        emb.filter(F.col("vec_id") % _BENCH_MOD == 0)
        .orderBy("vec_id")
        .limit(_FIXED_BENCH_K)
        .select(F.col("vec_id").alias("bench_id"), F.col("embedding").alias("bvec"))
    )
    corpus = emb.filter(F.col("vec_id") % _BENCH_MOD != 0).select(
        "vec_id", "embedding"
    )
    cos = F.round(sim.cosine(F.col("embedding"), F.col("bvec")), 6)
    return (
        corpus.crossJoin(F.broadcast(bench))
        .select("vec_id", "bench_id", cos.alias("cos"))
        .filter(F.col("cos") >= _SEM_TAU)
    )


_PASSAGE = 16  # tokens per non-overlapping passage


@query(
    "passage_dedup",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(toks[i*{_PASSAGE}+1 : i*{_PASSAGE}+{_PASSAGE}], ' ') AS passage
  FROM toks CROSS JOIN (SELECT unnest(range(0, 1000)) AS i)
  WHERE i*{_PASSAGE} < len(toks)
),
r AS (
  SELECT doc_id, pos, passage,
         row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
  FROM p
)
SELECT doc_id, pos, substr(md5(passage), 1, 16) AS passage_key, rn = 1 AS keep
FROM r
""",
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact passage-level dedup (the RefinedWeb/C4 repeated-span
    cut, exact tier): documents are segmented into non-overlapping
    {_PASSAGE}-token passages and each distinct passage keeps only its
    first occurrence by (doc_id, pos) — later copies are marked drop.

    One hash shuffle on the passage (the window partition key); passage
    text never moves twice because segmentation is row-local.  Hot
    passages (the empty tail, boilerplate) are bounded: the window only
    ranks, it does not pair — state per passage is one counter, unlike
    the quadratic inverted-index joins this complements."""
    from pyspark.sql import Window as W

    toks = tx.tokens("text")
    n_pass = F.ceil(F.size(toks) / F.lit(_PASSAGE)).cast("int")
    docs = _docs(spark, sf_dir)
    p = docs.select(
        "doc_id", toks.alias("toks"), F.explode(F.sequence(F.lit(0), n_pass - 1)).alias("pos")
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(F.slice(F.col("toks"), F.col("pos") * _PASSAGE + 1, _PASSAGE), " ").alias(
            "passage"
        ),
    )
    w = W.partitionBy("passage").orderBy("doc_id", "pos")
    return p.withColumn("rn", F.row_number().over(w)).select(
        "doc_id",
        "pos",
        F.substring(F.md5("passage"), 1, 16).alias("passage_key"),
        (F.col("rn") == 1).alias("keep"),
    )


@query(
    "pack_manifest",
    f"""
WITH toks AS (
  SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents
),
runs AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(floor((cum - n_tokens) / {_PACK_TARGET}) AS BIGINT) AS pack_id
  FROM runs
)
SELECT lang, pack_id,
       CAST(count(*) AS INT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM packed GROUP BY lang, pack_id
""",
)
def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack manifest — the writer-facing output of sequence packing: one
    row per (lang, pack_id) bin with its member documents in
    concatenation order, sizes, and token total.  This is the row a
    shard writer consumes to assemble one context window.

    Scale shape: reuses the bucket-offset packing plan (pack_documents),
    then ONE aggregation keyed by (lang, pack_id).  The collect per bin
    is bounded by construction — a bin holds ~target/avg_doc_tokens
    documents regardless of corpus size — so per-group state never
    scales with the corpus, unlike a per-lang collect."""
    packed = q_pack_documents(spark, sf_dir)
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("doc_id"))), ","
            ).alias("doc_ids"),
        )
    )


# --- substring-span dedup (Lee et al. 2022) ----------------------------------
# Oracle fragments are GENERATED from functions/spans.py's constants so
# both engines agree by construction (same n, same 60-bit hash).

def _span_positions_sql(n: int) -> str:
    """Shared oracle CTE chain: (doc_id, pos) of cross-doc duplicated
    n-gram starts."""
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= {n}),
g AS (SELECT doc_id, unnest(range(0, len(toks) - {n} + 1)) AS pos, toks FROM t),
h AS (SELECT doc_id, pos,
             {_H64.format(x=f"array_to_string(toks[pos + 1 : pos + {n}], ' ')")} AS gh
      FROM g),
d AS (SELECT gh FROM h GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
p AS (SELECT doc_id, pos FROM h WHERE gh IN (SELECT gh FROM d))
"""


@query(
    "duplicate_ngram_spans",
    f"""
WITH {_span_positions_sql(sp.SPAN_NGRAM)},
i AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos - lag(pos) OVER w > {sp.SPAN_NGRAM}
                  THEN 1 ELSE 0 END AS flag
      FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
s AS (SELECT doc_id, pos,
             sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
      FROM i)
SELECT doc_id,
       CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + {sp.SPAN_NGRAM} AS INT) AS span_end
FROM s GROUP BY doc_id, island
""",
)
def q_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal token ranges covered by n-grams that occur in ≥ 2
    documents — substring-level dedup's detection pass (Lee et al.
    2022).  Gram build is array-side in one codegen stage, the dup-gram
    set is one hash-keyed aggregation, and span merge is the
    gaps-and-islands window over doc_id — no interval self-join
    anywhere (functions/spans.py)."""
    return sp.duplicate_spans(_docs(spark, sf_dir))


def _multiscale_spans_sql() -> str:
    n = sp.SPAN_NGRAM
    levels = sp.SPAN_LEVELS
    lv_selects = [f"SELECT doc_id, pos, gh, {n} AS width FROM h0"]
    level_ctes = []
    comb = _H64.format(x="a.gh::VARCHAR || ':' || b.gh::VARCHAR")
    for k in range(1, levels):
        step = n * (2 ** (k - 1))
        lv_selects.append(
            f"SELECT doc_id, pos, gh, {n * (2 ** k)} AS width FROM h{k}"
        )
        level_ctes.append(
            f"h{k} AS (SELECT a.doc_id, a.pos, {comb} AS gh\n"
            f"      FROM h{k - 1} a JOIN h{k - 1} b\n"
            f"        ON b.doc_id = a.doc_id AND b.pos = a.pos + {step})"
        )
    h_ctes = ",\n".join(level_ctes)
    lv = "\nUNION ALL\n".join(lv_selects)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= {n}),
g AS (SELECT doc_id, unnest(range(0, len(toks) - {n} + 1)) AS pos, toks FROM t),
h0 AS (SELECT doc_id, pos,
              {_H64.format(x=f"array_to_string(toks[pos + 1 : pos + {n}], ' ')")} AS gh
       FROM g),
{h_ctes},
lv AS ({lv}),
d AS (SELECT width, gh FROM lv GROUP BY width, gh
      HAVING count(DISTINCT doc_id) >= 2),
p AS (SELECT lv.doc_id, lv.width, lv.pos FROM lv
      JOIN d ON d.width = lv.width AND d.gh = lv.gh),
i AS (SELECT doc_id, width, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos - lag(pos) OVER w > width
                  THEN 1 ELSE 0 END AS flag
      FROM p WINDOW w AS (PARTITION BY doc_id, width ORDER BY pos)),
s AS (SELECT doc_id, width, pos,
             sum(flag) OVER (PARTITION BY doc_id, width ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
      FROM i)
SELECT doc_id, CAST(width AS INT) AS width,
       CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + width AS INT) AS span_end
FROM s GROUP BY doc_id, width, island
"""


@query("multiscale_duplicate_spans", _multiscale_spans_sql())
def q_multiscale_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span detection at DOUBLING widths (8/16/32 tokens)
    from ONE positional-gram index via prefix doubling — level k+1's
    hash at position i is H(g_k[i], g_k[i + n·2^k]), an array-side zip,
    so wider spans cost O(tokens) extra instead of O(tokens·width)
    (functions/spans.py:multiscale_duplicate_spans).  A width-32 span
    is a verbatim 32-token cross-document match — the high-confidence
    tier a span-clipping pipeline removes first.  The oracle replays
    the identical doubling with keyed self-joins per level;
    tests/test_spans.py asserts each width's spans equal a brute-force
    token-window recomputation on adversarial corpora."""
    return sp.multiscale_duplicate_spans(_docs(spark, sf_dir))


@query(
    "span_clipped_corpus",
    f"""
WITH {_span_positions_sql(sp.SPAN_NGRAM)},
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {sp.SPAN_NGRAM})) AS pos
        FROM p),
alltok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tk AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM alltok),
tok AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM tk),
kept AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
         ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos)
SELECT doc_id,
       string_agg(tok, ' ' ORDER BY pos) AS clean_text,
       CAST(count(*) AS INT) AS n_kept
FROM kept GROUP BY doc_id
""",
)
def q_span_clipped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus with duplicated spans' tokens REMOVED (kept text
    reassembled in order); fully-duplicated documents drop out.  The
    covered-position set explodes each duplicated gram start into its n
    positions (array-side, deduped once), and kept tokens are one
    anti-join — no range join (functions/spans.py:clip_duplicate_spans)."""
    return sp.clip_duplicate_spans(_docs(spark, sf_dir))


# --- hashed document embeddings + text→ANN composition ------------------------

_EMB_DIM = em.EMBED_DIM
_EMB_SIGN = 1 << em._SIGN_BIT  # DuckDB has no shiftright: sign bit read via // then % 2

_EMBED_CELLS_SQL = f"""
tokh AS (
  SELECT doc_id, {_H64.format(x='t')} AS h
  FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
),
signed AS (
  SELECT doc_id, h % {_EMB_DIM} AS dim,
         CASE WHEN (h // {_EMB_SIGN}) % 2 = 1 THEN 1 ELSE -1 END AS s
  FROM tokh
),
sums AS (SELECT doc_id, dim, CAST(sum(s) AS DOUBLE) AS v
         FROM signed GROUP BY doc_id, dim),
norms AS (SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM sums GROUP BY doc_id),
cells AS (
  SELECT s.doc_id, CAST(s.dim AS INT) AS dim, round(s.v / n.nrm, 6) AS value
  FROM sums s JOIN norms n USING (doc_id) WHERE n.nrm > 0
)
"""


@query(
    "doc_hashed_embeddings",
    f"WITH {_EMBED_CELLS_SQL} SELECT doc_id, dim, value FROM cells",
)
def q_doc_hashed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed (signed-projection) document embeddings as
    normalized (doc_id, dim, value) cells — the model-free text embedder
    that lets the ANN / semantic stack run end-to-end from raw text.
    One explode + one (doc, bucket)-keyed aggregation
    (functions/embed.py)."""
    return em.hashed_embedding_cells(_docs(spark, sf_dir))


_TEXT_ANN_K = 5


@query(
    "text_ann_topk",
    f"""
WITH {_EMBED_CELLS_SQL},
q AS (SELECT * FROM cells WHERE doc_id IN (0, 1, 2)),
qn (doc_id, nrm) AS (SELECT doc_id, sqrt(sum(value * value)) FROM q GROUP BY doc_id),
cn (doc_id, nrm) AS (SELECT doc_id, sqrt(sum(value * value)) FROM cells GROUP BY doc_id),
dots AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, sum(q.value * c.value) AS dot
  FROM q JOIN cells c USING (dim)
  WHERE c.doc_id <> q.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.cand_id,
         round(d.dot / (qn.nrm * cn.nrm), 6) AS cos
  FROM dots d
  JOIN qn ON qn.doc_id = d.query_id
  JOIN cn ON cn.doc_id = d.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, cand_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= {_TEXT_ANN_K}
""",
)
def q_text_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-to-text nearest neighbours END TO END inside the engine:
    hash-embed the corpus (one shuffle), then exact cosine top-{_TEXT_ANN_K}
    for three query documents via the broadcast-query scan
    (functions/similarity.py:cosine_topk).  The oracle replays the same
    dense cosine over the normalized cells, so missing-bucket zeros and
    the rounded-cell arithmetic agree by construction."""
    from depositaja_spark.functions.cache import tracked_persist

    # persisted: the query side is a filter OVER the corpus side, and
    # without the persist Catalyst plans the whole embed pipeline twice
    dense = tracked_persist(em.hashed_embeddings(_docs(spark, sf_dir)))
    corpus = dense.select(F.col("doc_id").alias("vec_id"), "embedding")
    queries = corpus.filter(F.col("vec_id").isin(0, 1, 2))
    out = sim.cosine_topk(corpus, queries, k=_TEXT_ANN_K)
    return out.select(
        F.col("query_id"), F.col("cand_id"), F.col("cos"), F.col("rank")
    )


# --- hybrid retrieval: lexical + semantic legs fused by RRF -------------------

_RRF_POOL = 20  # per-leg top-N pool
_RRF_TOPK = 10
_RRF_QIDS = "0, 1, 2"


def _rrf_sql() -> str:
    from depositaja_spark.functions.retrieval import RRF_K

    return f"""
WITH {_EMBED_CELLS_SQL},
q AS (SELECT * FROM cells WHERE doc_id IN ({_RRF_QIDS})),
qn (doc_id, nrm) AS (SELECT doc_id, sqrt(sum(value * value)) FROM q GROUP BY doc_id),
cn (doc_id, nrm) AS (SELECT doc_id, sqrt(sum(value * value)) FROM cells GROUP BY doc_id),
dots AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, sum(q.value * c.value) AS dot
  FROM q JOIN cells c USING (dim)
  WHERE c.doc_id <> q.doc_id
  GROUP BY 1, 2
),
sem AS (
  SELECT query_id, cand_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(d.dot / (qn.nrm * cn.nrm), 6) DESC,
                                          cand_id) AS INT) AS sem_rank
  FROM dots d
  JOIN qn ON qn.doc_id = d.query_id
  JOIN cn ON cn.doc_id = d.cand_id
  QUALIFY sem_rank <= {_RRF_POOL}
),
dt AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dt GROUP BY 1),
sh AS (
  SELECT qt.doc_id AS query_id, c.doc_id AS cand_id, CAST(count(*) AS BIGINT) AS sh
  FROM (SELECT * FROM dt WHERE doc_id IN ({_RRF_QIDS})) qt
  JOIN dt c USING (tok)
  WHERE c.doc_id <> qt.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, cand_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY CAST(sh.sh AS DOUBLE)
                                          / (qs.n + cs.n - sh.sh) DESC,
                                          cand_id) AS INT) AS lex_rank
  FROM sh
  JOIN sz qs ON qs.doc_id = sh.query_id
  JOIN sz cs ON cs.doc_id = sh.cand_id
  QUALIFY lex_rank <= {_RRF_POOL}
)
SELECT COALESCE(sem.query_id, lex.query_id) AS query_id,
       COALESCE(sem.cand_id, lex.cand_id) AS cand_id,
       sem.sem_rank, lex.lex_rank,
       COALESCE(1.0 / ({RRF_K} + sem.sem_rank), 0.0)
         + COALESCE(1.0 / ({RRF_K} + lex.lex_rank), 0.0) AS rrf,
       CAST(row_number() OVER (
         PARTITION BY COALESCE(sem.query_id, lex.query_id)
         ORDER BY COALESCE(1.0 / ({RRF_K} + sem.sem_rank), 0.0)
                  + COALESCE(1.0 / ({RRF_K} + lex.lex_rank), 0.0) DESC,
                  COALESCE(sem.cand_id, lex.cand_id)) AS INT) AS rank
FROM sem FULL OUTER JOIN lex
  ON sem.query_id = lex.query_id AND sem.cand_id = lex.cand_id
QUALIFY rank <= {_RRF_TOPK}
"""


@query("hybrid_search_rrf", _rrf_sql())
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for three query documents: the semantic leg
    (hashed-embedding cosine top-{_RRF_POOL}, the text_ann_topk ranking)
    and the lexical leg (token-set Jaccard top-{_RRF_POOL},
    functions/retrieval.py:jaccard_topk) fused by Reciprocal Rank
    Fusion (1/(60+rank) per leg, the SIGIR-2009 score-free fusion) into
    a final top-{_RRF_TOPK} — the standard RAG retrieval stack shape,
    where each leg recalls what the other misses.

    Scale shape: both legs are per-query top-N frames; the fusion is
    one (query, cand) full-outer equi-join plus a per-query window —
    nothing corpus-sized past the legs.  The reciprocal terms are added
    in one fixed expression order (bit-stable); ties break on cand_id."""
    from depositaja_spark.functions.cache import tracked_persist
    from depositaja_spark.functions.retrieval import jaccard_topk, rrf_fuse

    docs = _docs(spark, sf_dir)
    dense = tracked_persist(em.hashed_embeddings(docs))
    corpus = dense.select(F.col("doc_id").alias("vec_id"), "embedding")
    queries = corpus.filter(F.col("vec_id").isin(0, 1, 2))
    sem = sim.cosine_topk(corpus, queries, k=_RRF_POOL)
    lex = jaccard_topk(docs, [0, 1, 2], _RRF_POOL)
    return rrf_fuse(sem, lex.drop("jac"), _RRF_TOPK)


# --- MMR diversified re-ranking ----------------------------------------------

_MMR_POOL = 10
_MMR_K = 5
_MMR_LAM = 0.7
_MMR_ONE_MINUS = 0.3  # literal, NEVER 1−λ (different double)


def _mmr_sql() -> str:
    """Chained-CTE replay of the greedy MMR selection: one CTE pair
    (remaining pool → argmax) per step, the exact-iteration-unrolling
    technique the PPR and detector-replay oracles use."""
    steps = []
    prev_sel = "sel1"
    for s in range(2, _MMR_K + 1):
        selu_prev = "selu1" if s == 2 else f"selu{s - 1}"
        steps.append(f"""
rem{s} AS (SELECT p.* FROM pool p
           WHERE NOT EXISTS (SELECT 1 FROM {selu_prev} u
                             WHERE u.query_id = p.query_id
                               AND u.cand_id = p.cand_id)),
red{s} AS (SELECT r.query_id, r.cand_id, r.rel, max(ps.sim) AS red
           FROM rem{s} r
           JOIN {selu_prev} u ON u.query_id = r.query_id
           JOIN psim ps ON ps.query_id = r.query_id
                       AND ps.a = r.cand_id AND ps.b = u.cand_id
           GROUP BY 1, 2, 3),
sel{s} AS (SELECT query_id, cand_id,
                  {_MMR_LAM} * rel - {_MMR_ONE_MINUS} * red AS score,
                  {s} AS step
           FROM red{s}
           QUALIFY row_number() OVER (
             PARTITION BY query_id
             ORDER BY {_MMR_LAM} * rel - {_MMR_ONE_MINUS} * red DESC,
                      cand_id) = 1),
selu{s} AS (SELECT query_id, cand_id FROM {selu_prev}
            UNION ALL SELECT query_id, cand_id FROM sel{s})""")
        prev_sel = f"sel{s}"
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, cand_id, CAST(step AS INT) AS mmr_rank, score AS mmr_score FROM sel{s}"
        for s in range(1, _MMR_K + 1)
    )
    return f"""
WITH {_EMBED_CELLS_SQL},
q AS (SELECT * FROM cells WHERE doc_id IN ({_RRF_QIDS})),
qn (doc_id, nrm) AS (SELECT doc_id, sqrt(sum(value * value)) FROM q GROUP BY doc_id),
cn (doc_id, nrm) AS (SELECT doc_id, sqrt(sum(value * value)) FROM cells GROUP BY doc_id),
dots AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, sum(q.value * c.value) AS dot
  FROM q JOIN cells c USING (dim)
  WHERE c.doc_id <> q.doc_id
  GROUP BY 1, 2
),
pool AS (
  SELECT query_id, cand_id, round(d.dot / (qn.nrm * cn.nrm), 6) AS rel
  FROM dots d
  JOIN qn ON qn.doc_id = d.query_id
  JOIN cn ON cn.doc_id = d.cand_id
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY rel DESC, cand_id) <= {_MMR_POOL}
),
pairdots AS (
  SELECT x.query_id, x.cand_id AS a, y.cand_id AS b,
         sum(ca.value * cb.value) AS dot
  FROM pool x
  JOIN pool y ON y.query_id = x.query_id AND y.cand_id <> x.cand_id
  JOIN cells ca ON ca.doc_id = x.cand_id
  JOIN cells cb ON cb.doc_id = y.cand_id AND cb.dim = ca.dim
  GROUP BY 1, 2, 3
),
psim AS (
  SELECT pd.query_id, pd.a, pd.b, round(pd.dot / (na.nrm * nb.nrm), 6) AS sim
  FROM pairdots pd
  JOIN cn na ON na.doc_id = pd.a
  JOIN cn nb ON nb.doc_id = pd.b
),
sel1 AS (SELECT query_id, cand_id, {_MMR_LAM} * rel AS score, 1 AS step
         FROM pool
         QUALIFY row_number() OVER (PARTITION BY query_id
                                    ORDER BY {_MMR_LAM} * rel DESC, cand_id) = 1),
selu1 AS (SELECT query_id, cand_id FROM sel1),{",".join(steps)}
{union}
"""


@query("mmr_diverse_topk", _mmr_sql())
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (functions/retrieval.py:mmr_rerank):
    each query's semantic top-{_MMR_POOL} pool greedily re-ranked to
    {_MMR_K} picks by λ·relevance − (1−λ)·max-similarity-to-selected
    (λ={_MMR_LAM}) — the diversification pass between retrieval and a
    RAG context window, killing near-duplicate passages that RRF alone
    keeps.

    Scale shape: the sequential greedy runs per query group in ONE
    applyInPandas over constant-bounded pools (≤{_MMR_POOL} rel rows +
    ≤{_MMR_POOL}² sim rows per group); pools and pairwise sims are
    DataFrame joins over per-query frames.  Both rel and sim enter the
    kernel as rounded-6 values and the score uses literal λ/(1−λ)
    doubles, so the step-unrolled chained-CTE oracle replays the greedy
    argmax exactly (ties on cand_id)."""
    from depositaja_spark.functions.cache import tracked_persist
    from depositaja_spark.functions.retrieval import mmr_rerank

    docs = _docs(spark, sf_dir)
    dense = tracked_persist(em.hashed_embeddings(docs))
    corpus = dense.select(F.col("doc_id").alias("vec_id"), "embedding")
    queries = corpus.filter(F.col("vec_id").isin(0, 1, 2))
    pool = tracked_persist(
        sim.cosine_topk(corpus, queries, k=_MMR_POOL).select(
            "query_id", "cand_id", F.col("cos").alias("rel")
        )
    )
    pv = pool.join(
        corpus.select(F.col("vec_id").alias("cand_id"), "embedding"), "cand_id"
    )
    pairs = (
        pv.alias("x")
        .join(
            pv.alias("y"),
            (F.col("x.query_id") == F.col("y.query_id"))
            & (F.col("x.cand_id") != F.col("y.cand_id")),
        )
        .select(
            F.col("x.query_id").alias("query_id"),
            F.col("x.cand_id").alias("a"),
            F.col("y.cand_id").alias("b"),
            sim.pair_cos_udf()(F.col("x.embedding"), F.col("y.embedding")).alias("sim"),
        )
    )
    return mmr_rerank(pool, pairs, _MMR_K, _MMR_LAM)


# --- retrieval evaluation (NDCG@k / MRR / recall@k) --------------------------
#
# The metric layer every retrieval stack ships with: judge the ranked
# list against a relevance oracle.  Relevance here is the embedding
# `label` column (same-label = relevant), the ranked list is the exact
# cosine top-k with the repo's total-order tie-break.  Float discipline:
# the per-rank DCG discounts 1/log2(rank+1) and the IDCG prefix sums are
# PYTHON-GENERATED LITERALS shared by both engines (no engine log2), and
# DCG accumulates through an ordered running window (identical IEEE op
# order both sides) — never a partition-order float sum.

_EVAL_K = 10

_DCG_DISCOUNTS: list[float] = [
    1.0 / __import__("math").log2(i + 1) for i in range(1, _EVAL_K + 1)
]
_IDCG_PREFIX: list[float] = [
    sum(_DCG_DISCOUNTS[: m + 1]) for m in range(_EVAL_K)
]

_DISC_SQL = "[" + ", ".join(repr(x) for x in _DCG_DISCOUNTS) + "]"
_IDCG_SQL = "[" + ", ".join(repr(x) for x in _IDCG_PREFIX) + "]"


@query(
    "retrieval_eval_at_k",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec, label AS qlab
           FROM embeddings WHERE vec_id IN ({_Q_IDS})),
c AS (SELECT vec_id AS cand_id, embedding AS cvec, label AS clab
      FROM embeddings),
scored AS (
  SELECT query_id, qlab, cand_id, clab,
         {_COS.format(a='qvec', b='cvec')} AS cos
  FROM c CROSS JOIN q WHERE cand_id != query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS rank
  FROM scored QUALIFY rank <= {_EVAL_K}
),
contrib AS (
  SELECT query_id, qlab, rank,
         CASE WHEN clab = qlab THEN 1 ELSE 0 END AS rel,
         CASE WHEN clab = qlab THEN ({_DISC_SQL})[rank] ELSE 0.0 END AS dg
  FROM ranked
),
run AS (
  SELECT query_id, qlab, rank,
         sum(dg) OVER (PARTITION BY query_id ORDER BY rank) AS dcg_run,
         sum(rel) OVER (PARTITION BY query_id) AS hits,
         min(CASE WHEN rel = 1 THEN rank END) OVER (PARTITION BY query_id)
           AS first_rel
  FROM contrib
),
fin AS (SELECT query_id, qlab, dcg_run AS dcg, hits, first_rel
        FROM run WHERE rank = {_EVAL_K}),
lc AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1)
SELECT f.query_id,
       lc.n - 1 AS n_rel,
       CAST(f.hits AS BIGINT) AS hits_at_k,
       CASE WHEN lc.n - 1 > 0
            THEN round(CAST(f.hits AS DOUBLE) / (lc.n - 1), 6) END AS recall_at_k,
       round(CAST(f.hits AS DOUBLE) / {_EVAL_K}, 6) AS precision_at_k,
       round(coalesce(1.0 / f.first_rel, 0.0), 6) AS rr,
       CASE WHEN lc.n - 1 > 0
            THEN round(f.dcg / ({_IDCG_SQL})[CAST(least(lc.n - 1, {_EVAL_K}) AS INT)], 6)
       END AS ndcg_at_k
FROM fin f JOIN lc ON lc.label = f.qlab
""",
)
def q_retrieval_eval_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query retrieval quality at k={_EVAL_K}: recall@k,
    precision@k, reciprocal rank, and binary-gain NDCG@k of the exact
    cosine top-k against same-label relevance — the evaluation harness
    of the ANN/retrieval family (`functions/similarity.py:cosine_topk`
    produces the ranked list; this scores it).  Scale shape: metrics
    run on the already-k-bounded ranked frame (windows over ≤k rows per
    query), the relevance totals come from the ≤|labels|-row count
    frame, and every float enters through shared Python literals or an
    ordered running sum — bit-stable across engines and partitionings."""
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
    ranked = sim.cosine_topk(emb, queries, k=_EVAL_K)
    qlab = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlab")
    )
    clab = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("clab")
    )
    disc = F.array([F.lit(x) for x in _DCG_DISCOUNTS])
    idcg = F.array([F.lit(x) for x in _IDCG_PREFIX])
    contrib = (
        ranked.join(F.broadcast(qlab), "query_id")
        .join(clab, "cand_id")
        .select(
            "query_id",
            "qlab",
            "rank",
            (F.col("clab") == F.col("qlab")).cast("int").alias("rel"),
            F.when(
                F.col("clab") == F.col("qlab"),
                F.element_at(disc, F.col("rank")),
            )
            .otherwise(F.lit(0.0))
            .alias("dg"),
        )
    )
    w_run = (
        W.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("query_id")
    run = contrib.select(
        "query_id",
        "qlab",
        "rank",
        F.sum("dg").over(w_run).alias("dcg_run"),
        F.sum("rel").over(w_all).alias("hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).over(w_all).alias(
            "first_rel"
        ),
    )
    fin = run.filter(F.col("rank") == _EVAL_K)
    lc = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return fin.join(
        F.broadcast(lc), fin["qlab"] == lc["label"]
    ).select(
        "query_id",
        (F.col("n") - 1).alias("n_rel"),
        F.col("hits").cast("long").alias("hits_at_k"),
        # n_rel = 0 (the query's label is unique in the corpus) must yield
        # NULL, not a crash: element_at(_, 0) raises under ANSI and x/0
        # diverges across engines — both divisions are single-use, so the
        # lazy CaseWhen branch is the whole guard (matching oracle CASEs)
        F.when(
            F.col("n") - 1 > 0,
            F.round(F.col("hits").cast("double") / (F.col("n") - 1), 6),
        ).alias("recall_at_k"),
        F.round(F.col("hits").cast("double") / _EVAL_K, 6).alias(
            "precision_at_k"
        ),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
        ).alias("rr"),
        F.when(
            F.col("n") - 1 > 0,
            F.round(
                F.col("dcg_run")
                / F.element_at(
                    idcg, F.least(F.col("n") - 1, F.lit(_EVAL_K)).cast("int")
                ),
                6,
            ),
        ).alias("ndcg_at_k"),
    )


#: intra-doc repeats need a tighter gram than the cross-doc detector:
#: the fixture (and natural text) repeats short phrases within a
#: document far more often than 8-token runs
_SELF_REP_N = 3


@query(
    "self_repetition_spans",
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= {_SELF_REP_N}),
g AS (SELECT doc_id, unnest(range(0, len(toks) - {_SELF_REP_N} + 1)) AS pos, toks
      FROM t),
h AS (SELECT doc_id, pos,
             {{h}} AS gh
      FROM g),
p AS (SELECT doc_id, pos FROM (
        SELECT doc_id, pos, min(pos) OVER (PARTITION BY doc_id, gh) AS first_pos
        FROM h)
      WHERE pos > first_pos),
i AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos - lag(pos) OVER w > {_SELF_REP_N}
                  THEN 1 ELSE 0 END AS flag
      FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
s AS (SELECT doc_id, pos,
             sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
      FROM i)
SELECT doc_id,
       CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + {_SELF_REP_N} AS INT) AS span_end
FROM s GROUP BY doc_id, island
""".format(h=_H64.format(x=f"array_to_string(toks[pos + 1 : pos + {_SELF_REP_N}], ' ')")),
)
def q_self_repetition_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token ranges covered by n-grams repeated WITHIN one document
    (first occurrence kept) — the intra-document counterpart of
    duplicate_ngram_spans: looped generations, pasted paragraphs,
    template stutter (functions/spans.py:self_repetition_spans)."""
    return sp.self_repetition_spans(_docs(spark, sf_dir), n=_SELF_REP_N)


def _clean_corpus_full_sql() -> str:
    """The complete Lee-et-al preprocessing recipe: substring-span clip
    FIRST (remove duplicated passages), then the document-level pipeline
    (gate → exact dedup → near-dup clusters → keepers) over the CLIPPED
    text.  Composed by splicing the span-clip CTEs ahead of the
    clean-corpus chain and pointing its source at ``clipped``."""
    clip_ctes = f"""{_span_positions_sql(sp.SPAN_NGRAM)},
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {sp.SPAN_NGRAM})) AS pos
        FROM p),
alltok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tk AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM alltok),
tok AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM tk),
keptt AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
          ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos),
clipped AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
            FROM keptt GROUP BY doc_id)"""
    return _clean_corpus_sql(source="clipped", prefix_ctes=clip_ctes)


@query("clean_corpus_full", _clean_corpus_full_sql())
def q_clean_corpus_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE preprocessing recipe (Lee et al. 2022 ordering):
    duplicated-span clipping first — so boilerplate passages can't glue
    unrelated documents into one near-dup cluster — then the document
    pipeline (quality/language gate → exact dedup → near-dup clustering
    → keeper selection) over the clipped text.  Every stage is the
    already-tested operator; this query pins their composition under
    one oracle."""
    from depositaja_spark.plans.corpus_pipeline import clean_corpus

    clipped = sp.clip_duplicate_spans(_docs(spark, sf_dir)).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    return clean_corpus(clipped)


_KFOLD_SALT = "kfold-v1:"
_KFOLD_K = 5


@query(
    "kfold_split_balance",
    f"""
WITH assign AS (
  SELECT doc_id, source,
         CAST({_H64.format(x=f"'{_KFOLD_SALT}' || CAST(doc_id AS VARCHAR)")}
              % {_KFOLD_K} AS INT) AS fold
  FROM documents
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM assign
)
SELECT fold,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(count(*) AS DOUBLE) / tot.n, 6) AS frac,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources_present,
       round(CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS src0_share
FROM assign CROSS JOIN tot
GROUP BY fold, tot.n
""",
)
def q_kfold_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment audit: every document lands in
    fold = H(salt‖doc_id) mod {_KFOLD_K} — deterministic, shuffle-free,
    re-run/backfill-stable like train_val_split (the salt versions the
    folding) — and the audit reports each fold's size, fraction, source
    coverage, and a pinned source's share, the balance readout that tells
    you whether per-fold metrics are comparable.  One row-local
    projection + one keyed agg over the {_KFOLD_K}-row fold frame; the
    corpus total is a 1-row broadcast scalar.  The hash is the repo's
    portable 60-bit md5 prefix, so fold membership is engine-identical
    by construction."""
    d = _docs(spark, sf_dir)
    from depositaja_spark.functions.text import hash64

    assign = d.select(
        "doc_id",
        "source",
        (
            hash64(F.concat(F.lit(_KFOLD_SALT), F.col("doc_id").cast("string")))
            % _KFOLD_K
        )
        .cast("int")
        .alias("fold"),
    )
    tot = assign.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("source").cast("long").alias("n_sources"),
    )
    # 1-row broadcast scalar join (CARTESIAN_OK): the corpus total.
    return (
        assign.crossJoin(F.broadcast(tot))
        .groupBy("fold", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.count(F.lit(1)).cast("double") / F.col("n"), 6).alias("frac"),
            F.count_distinct("source").cast("long").alias("n_sources_present"),
            F.round(
                F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("src0_share"),
        )
        .drop("n")
    )


# --- Heaps'-law vocabulary growth --------------------------------------------


@query(
    "vocab_growth_heaps",
    f"""
WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
npd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY 1),
dt AS (SELECT DISTINCT doc_id, tok FROM tk),
ft AS (SELECT tok, min(doc_id) AS fd FROM dt GROUP BY 1),
nv AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS new_terms
       FROM ft GROUP BY 1)
SELECT n.doc_id,
       CAST(sum(n.n_tokens) OVER (ORDER BY n.doc_id) AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(v.new_terms, 0)) OVER (ORDER BY n.doc_id) AS BIGINT)
         AS cum_vocab
FROM npd n LEFT JOIN nv v USING (doc_id)
""",
)
def q_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative corpus tokens vs
    cumulative distinct vocabulary in doc_id order — the dataset-
    composition diagnostic (a flattening curve means new documents stop
    contributing new words; the V ≈ K·nᵝ fit drops out of this frame).
    Per-token first-appearance is one (doc, token)-distinct + one
    token-keyed min — each doc's NEW-term count then comes from a keyed
    count, so vocabulary never materializes per prefix.  Both running
    sums are EXACT integers and go through the two-level bucket-offset
    decomposition (``functions/windows.py:bucketed_running_sum``) —
    the flat ORDER BY doc_id window the oracle runs would be a
    single-task sort over the sf-scaling doc frame."""
    from depositaja_spark.functions.windows import bucketed_running_sum

    docs = _docs(spark, sf_dir)
    tk = docs.select(
        "doc_id", F.explode(tx.tokens("text")).alias("tok")
    )
    npd = tk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    ft = tk.distinct().groupBy("tok").agg(F.min("doc_id").alias("fd"))
    nv = ft.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("new_terms")
    )
    base = npd.join(nv, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("new_terms"), F.lit(0)).alias("new_terms"),
    )
    out = bucketed_running_sum(
        base, [], "doc_id", "n_tokens", out_col="cum_tokens"
    )
    out = bucketed_running_sum(
        out, [], "doc_id", "new_terms", out_col="cum_vocab"
    )
    return out.select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    )


_GIF_STATS_SQL = """
WITH hx AS (
  SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
  FROM documents
),
byt AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) AS v
  FROM (SELECT doc_id, h, unnest(range(0, 192)) AS i FROM hx)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(sum((i + 1) * v) AS BIGINT) AS px_wsum
FROM byt GROUP BY doc_id
"""


@query("gif_decode_stats", _GIF_STATS_SQL)
def q_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF round-trip with a FULL value oracle — closing the LZW slot of
    the compressed-media matrix next to PNG (DEFLATE) and JPEG
    (Huffman+DCT): each document's first 192 text bytes are rendered as
    an 8×8 RGB image, compressed to a real GIF89a stream (exact
    distinct-color palette + variable-width LZW,
    ``functions/multimodal.py:encode_gif``), decoded back by the
    vendored GIF parser (``_decode_gif``: screen/palette/extension
    blocks, LZW with CLEAR/EOI and dictionary reset), and reduced to
    the same per-image pixel stats as png/jpeg_decode_stats.  The
    oracle recomputes the stats straight from the document bytes — a
    hash match proves the palette build, the LZW round-trip, and the
    block deframing byte-exact on real data every driver run.  Same
    zero-shuffle Arrow-kernel shape as the PNG twin."""
    from depositaja_spark.functions.multimodal import encode_gif

    docs = _docs(spark, sf_dir)
    body = F.expr("rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')")

    @F.pandas_udf("binary")
    def to_gif(b: pd.Series) -> pd.Series:
        return b.map(
            lambda x: encode_gif(
                np.frombuffer(bytes(x), np.uint8).reshape(8, 8, 3)
            )
        )

    payloads = spread(
        docs, parallelism=spark.sparkContext.defaultParallelism
    ).select("doc_id", to_gif(body).alias("payload"))
    # fused decode→stats kernel (r13): same integers as the old JVM
    # aggregate/zip_with fold, no pixel-array Arrow transfer
    return mm.decode_media_stats(payloads, weighting="position")


_ADPCM_ST_SQL = "[7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]"
_ADPCM_IT_SQL = "[-1, -1, -1, -1, 2, 4, 6, 8]"

# The oracle replays the ENTIRE IMA ADPCM encode/decode state machine in
# SQL: a per-doc recursive CTE carries (pred, idx) through all 192
# samples, quantizing and reconstructing with the same integer tables
# and clamps as functions/multimodal.py — the encoder's internal
# predictor sequence IS the decoded waveform, so the recursion needs
# only the raw source bytes.  Helper columns chain through LATERALs to
# keep each arithmetic step readable and identical to the kernel.
_ADPCM_STATS_SQL = f"""
WITH RECURSIVE
hx AS (SELECT doc_id, rpad(substr(hex(encode(text)), 1, 384), 384, '20') AS h
       FROM documents),
byt AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         (CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS BIGINT) - 128)
           * 256 AS s
  FROM (SELECT doc_id, h, unnest(range(0, 192)) AS i FROM hx)
),
rec AS (
  SELECT doc_id, CAST(-1 AS BIGINT) AS i, CAST(0 AS BIGINT) AS pred,
         CAST(0 AS BIGINT) AS idx, CAST(0 AS BIGINT) AS rsum,
         CAST(0 AS BIGINT) AS rsq, CAST(0 AS BIGINT) AS rmax
  FROM hx
  UNION ALL
  SELECT doc_id, i, x.new_pred, y.new_idx,
         rsum + x.new_pred, rsq + x.new_pred * x.new_pred,
         greatest(rmax, abs(x.new_pred))
  FROM (
    SELECT r.doc_id, r.i + 1 AS i, r.rsum, r.rsq, r.rmax,
           r.pred AS pred0, r.idx AS idx0,
           {_ADPCM_ST_SQL}[r.idx + 1] AS step,
           b.s - r.pred AS delta,
           abs(b.s - r.pred) AS mag
    FROM rec r JOIN byt b ON b.doc_id = r.doc_id AND b.i = r.i + 1
    WHERE r.i + 1 < 192
  ) t,
  LATERAL (SELECT CASE WHEN mag >= step THEN 1 ELSE 0 END AS b4) q4,
  LATERAL (SELECT mag - q4.b4 * step AS m2) r2,
  LATERAL (SELECT CASE WHEN r2.m2 >= step // 2 THEN 1 ELSE 0 END AS b2) q2,
  LATERAL (SELECT r2.m2 - q2.b2 * (step // 2) AS m1) r1,
  LATERAL (SELECT CASE WHEN r1.m1 >= step // 4 THEN 1 ELSE 0 END AS b1) q1,
  LATERAL (SELECT (step // 8) + q4.b4 * step + q2.b2 * (step // 2)
                  + q1.b1 * (step // 4) AS diff) w,
  LATERAL (SELECT CASE WHEN delta < 0 THEN greatest(pred0 - w.diff, -32768)
                       ELSE least(pred0 + w.diff, 32767) END AS new_pred) x,
  LATERAL (SELECT least(greatest(idx0
                  + {_ADPCM_IT_SQL}[q4.b4 * 4 + q2.b2 * 2 + q1.b1 + 1], 0),
                  88) AS new_idx) y
)
SELECT doc_id, CAST(192 AS BIGINT) AS n_samples, rsum AS recon_sum,
       rsq AS recon_sq_sum, rmax AS recon_max_abs
FROM rec WHERE i = 191
"""


@query("adpcm_decode_stats", _ADPCM_STATS_SQL)
def q_adpcm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA ADPCM round-trip with a FULL value oracle — the
    compressed-AUDIO slot of the media matrix (images carry
    DEFLATE/LZW/Huffman+DCT, WAV covered uncompressed PCM): each
    document's first 192 bytes become int16 samples, compressed 4:1
    through the vendored integer ADPCM encoder
    (``functions/multimodal.py:adpcm_encode``), decoded back
    (``adpcm_decode``), and reduced to stats over the RECONSTRUCTED
    waveform.  ADPCM is lossy, but the predictor state machine is pure
    integer arithmetic — so the oracle replays encode+decode exactly in
    SQL (per-doc recursive CTE over the raw bytes) and the driver
    value-checks the whole codec every run.  Same Arrow-kernel
    executor-width shape as the other codec queries."""
    from depositaja_spark.functions.multimodal import adpcm_encode, adpcm_recon_stats

    docs = _docs(spark, sf_dir)
    body = F.expr("rpad(substring(encode(text, 'UTF-8'), 1, 192), 192, X'20')")

    @F.pandas_udf("binary")
    def to_adpcm(b: pd.Series) -> pd.Series:
        return b.map(
            lambda x: adpcm_encode(
                (np.frombuffer(bytes(x), np.uint8).astype(np.int64) - 128) * 256
            )
        )

    payloads = spread(
        docs, parallelism=spark.sparkContext.defaultParallelism
    ).select("doc_id", to_adpcm(body).alias("payload"))
    # fused decode→stats kernel (r14, decode_media_stats' audio twin):
    # the same int64 reductions the JVM aggregate folds computed, done
    # beside the decoder — 4 longs/doc cross Arrow instead of the 192-
    # element reconstructed sample array
    return adpcm_recon_stats(payloads, n_samples=192)
