"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The four standard layers of corpus dedup at 100 TB scale, each expressed
as declarative DataFrame ops (shuffle-based inverted-index joins — no
driver-side state, no Python in the hot path):

* exact           — one hash-groupBy on the content fingerprint.
* n-gram Jaccard  — exact set similarity on word shingles via an
                    inverted-index self-join; the verifier for candidates.
* MinHash + LSH   — sub-quadratic candidate generation: k-permutation
                    signatures, banded bucket join.
* SimHash         — near-dup by Hamming distance on a bit signature.

Hashing is md5-derived (functions/text.py:hash64) so the DuckDB oracle can
reproduce every stage bit-for-bit; all constants live at module level and
are injected into the generated oracle SQL (queries_ext.py).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist
from depositaja_spark.functions.text import hash64, tokens

# --- constants shared with the oracle SQL -----------------------------------

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
MINHASH_K = 16
_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_P), _rng.randrange(0, MINHASH_P)) for _ in range(MINHASH_K)
]
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS
#: full width of the portable 60-bit md5-prefix hash (text.py:hash64) —
#: widened from the original 32 so the banded join's 7 bit-slices carry
#: 8–9 bits each (fan-in N/2⁸⁻⁹ per bucket, the 100 TB-safe width; at 32
#: bits the 4–5-bit slices were too coarse).  Both the Spark operator and
#: the generated DuckDB oracle derive every shift/band width from this
#: constant.
SIMHASH_BITS = 60
#: default stop-shingle document-frequency cap for the inverted-index
#: joins: a shingle present in more documents than this is boilerplate
#: (navigation chrome, license headers, templated text) and is dropped
#: BEFORE the self-join.  One boilerplate shingle shared by D documents
#: creates a D²/2-pair bucket, so an uncapped index is quadratic in the
#: hottest shingle — the classic web-corpus scale-killer.  The cap keeps
#: the worst bucket at DEDUP_MAX_DF²/2 regardless of corpus size.
DEDUP_MAX_DF = 1000
#: per-document cap on the MinHash verify arm's collected shingle set.
#: Normal documents sit far below it (a 10k-word doc has <10k 3-gram
#: shingles), so verification stays EXACT for them; a pathological giant
#: document keeps only its ``cap`` smallest hashes — a bottom-k sketch
#: (the hash is uniform, so smallest-k is an unbiased sample of the
#: shingle universe).  Above the cap the verified Jaccard becomes a
#: sketch estimate: recall/precision degrade gracefully (identical
#: giants still score 1.0 — identical sets have identical bottom-k) and
#: executor aggregation state stays bounded instead of growing with the
#: largest document in the corpus.
VERIFY_MAX_SHINGLES = 8192


# --- exact dedup -------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5-content groupBy keeping the smallest doc_id as the
    cluster representative.  One shuffle on the fingerprint; at scale this
    is the cheapest pass and always runs first."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "content_md5", "n_copies")
    )


# --- shingling ----------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document → (doc_id, shingle).
    Built array-side (sequence + slice + concat), deduped array-side with
    array_distinct (duplicates can only occur within one document, so no
    row-level .distinct() shuffle is ever needed), then exploded — the
    whole thing stays inside one codegen stage with zero exchanges."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return docs.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))


def shingle_hashes(
    docs: DataFrame, n: int = 3, text_col: str = "text", sh: DataFrame | None = None
) -> DataFrame:
    """(doc_id, h) with h = hash64(shingle) mod P — the integer universe
    MinHash permutes.  ``sh`` lets callers reuse a precomputed (possibly
    persisted) shingle DataFrame."""
    if sh is None:
        sh = shingles(docs, n, text_col)
    return sh.select("doc_id", (hash64(F.col("shingle")) % MINHASH_P).alias("h"))


# --- n-gram Jaccard ------------------------------------------------------------


def _shingle_universe(
    docs: DataFrame,
    n: int,
    text_col: str,
    sh: DataFrame | None,
    max_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Df-capped shingle universe for the inverted-index joins:
    ``(sizes, pairable)`` where ``sizes`` = (doc_id, sz) counts each
    document's shingles with df ≤ max_df, and ``pairable`` = (doc_id, h)
    keeps only rows whose shingle has 2 ≤ df ≤ max_df — the self-join
    input.

    Skew-safe by construction (replaces a ``Window.partitionBy("h")``
    variant that put every row of a hot shingle into ONE task — a
    single-task sort straggler when a boilerplate shingle has df in the
    millions):

    * df comes from a map-side-combined ``groupBy("h").count()`` — a hot
      key reaches the shuffle as one partial row per map task, never as
      its full row set;
    * hot shingles (df > max_df) are FEW by definition (only so many
      distinct values can each appear in >max_df documents), so they are
      removed from the big frame with a **broadcast anti-join** — the
      (doc_id, h) frame is never hash-partitioned while hot keys are
      still in it;
    * after the hot cut every surviving key has ≤ max_df rows, so the
      semi-join building ``pairable`` (and the self-join consuming it)
      have a per-key row bound — no partition can straggle.

    df == 1 rows (the vast majority of any real corpus — most shingles
    are unique to one document) still count toward ``sizes`` but are
    pruned from ``pairable``: they cannot contribute an intersection.

    The hashed frame is persisted BEFORE any filter: sizes and the join
    input replay the cached rows instead of re-running the shingle
    explode (persisting a filtered result forces repeated shingling
    passes — measured 3.5× slower at sf0.1).  The join key is the 60-bit
    shingle hash, not the shingle string: exchanges move 8-byte longs
    instead of ~30-byte strings.  ``max_df=None`` disables the cap (df
    stats still drive the df==1 prune)."""
    if sh is None:
        sh = shingles(docs, n, text_col)
    hashed = tracked_persist(
        sh.select("doc_id", hash64(F.col("shingle")).alias("h"))
    )
    counts = tracked_persist(
        hashed.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    )
    universe = hashed
    if max_df is not None:
        hot = counts.filter(F.col("df") > max_df).select("h")
        # clean corpora often have NO hot shingle — isEmpty materializes
        # the (persisted) count aggregation the joins need anyway, and
        # only one boolean reaches the driver
        if not hot.isEmpty():
            universe = hashed.join(F.broadcast(hot), "h", "left_anti")
    # sizes is consumed TWICE (once per self-join side) and Spark does
    # not dedupe the aggregation subtree across join branches — persist
    # the (tiny, one row per doc) frame so the universe scan+agg runs
    # once (measured −11% on jaccard_pairs at sf0.1)
    sizes = tracked_persist(
        universe.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    )
    mid = counts.filter(F.col("df") >= 2)
    if max_df is not None:
        mid = mid.filter(F.col("df") <= max_df)
    pairable = tracked_persist(
        universe.join(mid.select("h"), "h", "left_semi")
    )
    return sizes, pairable


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    sh: DataFrame | None = None,
    max_df: int | None = DEDUP_MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: inverted-index self-join on
    shingles, intersection counts, then |A∩B| / (|A|+|B|−|A∩B|) ≥ τ.

    Scale notes: the self-join shuffles on the shingle — hot shingles are
    the skew risk, so shingles with document frequency > ``max_df`` are
    dropped first (skew-safe df pass, see ``_shingle_universe``; sizes
    count the filtered universe, so the score is Jaccard over
    non-boilerplate shingles); ``df == 1`` shingles are additionally
    pruned from the join input (they cannot intersect; they still count
    toward sizes).  Output pairs are a_id < b_id so each pair appears
    once."""
    sizes, pairable = _shingle_universe(docs, n, text_col, sh, max_df)
    a = pairable.alias("a")
    b = pairable.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    max_df: int | None = DEDUP_MAX_DF,
) -> DataFrame:
    """Asymmetric n-gram containment: pairs where either document's
    shingle set is mostly inside the other's —
    ``c(A→B) = |A∩B| / |A|`` — with ``max(c(A→B), c(B→A)) ≥ τ``.

    Jaccard misses subset relationships at unequal sizes (a paragraph
    quoted inside a long article has tiny Jaccard but containment ≈ 1);
    corpus dedup runs BOTH.  Same skew-safe df pass, df-capped and
    df==1-pruned inverted-index join as jaccard_pairs; only the
    normalization differs."""
    sizes, pairable = _shingle_universe(docs, n, text_col, None, max_df)
    a = pairable.alias("a")
    b = pairable.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sz_b"))
    c_ab = F.round(F.col("inter").cast("double") / F.col("sz_a"), 6)
    c_ba = F.round(F.col("inter").cast("double") / F.col("sz_b"), 6)
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", c_ab.alias("c_ab"), c_ba.alias("c_ba"))
        .filter(F.greatest(F.col("c_ab"), F.col("c_ba")) >= threshold)
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    sh: DataFrame | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join via PREFIX FILTERING
    (Chaudhuri et al. ICDE'06; PPJoin, Xiao et al. WWW'08; the
    MapReduce formulation is Vernica et al. SIGMOD'10) — the LOSSLESS
    alternative to ``jaccard_pairs``'s df cap: no shingle is ever
    dropped, yet the candidate join only touches each document's
    rarest-first prefix.

    Under any global total order on shingles, two sets with
    J(A,B) ≥ τ must share an element within the first
    ``p = |S| − ⌈τ·|S|⌉ + 1`` elements of each set's sorted order —
    so the candidate self-join runs on exploded PREFIXES only.  With
    the rare-first order (ascending document frequency), prefix
    elements are the globally rarest shingles, so the join keys'
    fan-out is naturally tiny: boilerplate shingles land at the END
    of every sorted set and never enter the index.  Candidates are
    then verified exactly with one ``array_intersect`` over the two
    full (sorted, deduped) hash arrays — no second shuffle over the
    corpus.

    Scale shape: shingle-df counts are one keyed agg; each doc carries
    an array of 8-byte shingle hashes (bounded by document length);
    the candidate index is prefix-sized, a strict subset of the
    inverted index ``jaccard_pairs`` shuffles.  No global rank is
    needed for the total order — sorting by the (df, hash) STRUCT is
    the order, so there is no single-partition window anywhere.

    The prefix length's ceil is biased downward (−1e-9) so float
    wobble can only LENGTHEN a prefix (more candidates, never a
    missed pair).  Returns (a_id, b_id, jaccard) with a_id < b_id,
    jaccard rounded to 6 places, filtered at ≥ ``threshold``.
    """
    if sh is None:
        sh = shingles(docs, n, text_col)
    hashed = tracked_persist(
        sh.select("doc_id", hash64(F.col("shingle")).alias("h"))
    )
    dfc = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # per-doc sets sorted rare-first: the (df, h) struct IS the global
    # total order, no dense rank / single-partition sort required
    sets = tracked_persist(
        hashed.join(dfc, "h")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("h")))
            ).alias("arr")
        )
        .select(
            "doc_id",
            F.transform(F.col("arr"), lambda x: x["h"]).alias("hs"),
            F.size("arr").alias("sz"),
        )
    )
    t = float(threshold)
    plen = (
        F.col("sz") - F.ceil(F.lit(t) * F.col("sz") - F.lit(1e-9)) + 1
    ).cast("int")
    prefixes = sets.select(
        "doc_id", F.explode(F.slice(F.col("hs"), F.lit(1), plen)).alias("h")
    )
    cand = (
        prefixes.alias("a")
        .join(
            prefixes.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("a_id"),
        F.col("hs").alias("hs_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("b_id"),
        F.col("hs").alias("hs_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                inter.cast("double")
                / (F.col("sz_a") + F.col("sz_b") - inter),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


# --- MinHash + LSH ---------------------------------------------------------------


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    sh: DataFrame | None = None,
    hh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): k-permutation MinHash signature.

    One explode + one groupBy with k ``min`` aggregates — map-side partial
    mins make this a single cheap shuffle regardless of corpus size.
    E[J(A,B)] = P(mh_i(A)=mh_i(B)) is the textbook estimator.

    ``hh`` lets callers feed a precomputed (doc_id, h=hash64(shingle))
    frame; (a·(h mod P)+b) mod P ≡ (a·h+b) mod P, so reducing the 60-bit
    hash mod P here yields bit-identical signatures (the pre-reduction is
    required anyway: a·h would overflow int64 for 60-bit h)."""
    if hh is not None:
        h = hh.select("doc_id", (F.col("h") % MINHASH_P).alias("h"))
    else:
        h = shingle_hashes(docs, n, text_col, sh=sh)
    # generated-SQL aggregates: one F.expr per permutation instead of ~5
    # Column ops each — query BUILD time is driver py4j latency, re-paid
    # on every invocation (see the simhash() note)
    aggs = [
        F.expr(f"min(({a} * h + {b}) % {MINHASH_P})").alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return h.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Banded LSH: signature split into LSH_BANDS bands of LSH_ROWS rows;
    documents sharing any band bucket become candidates.  The bucket join
    shuffles on (band, band_key) — sub-quadratic, the scale path that
    replaces the all-pairs join."""
    # one explode, not a LSH_BANDS-way union: each union branch would carry
    # its own copy of the upstream signature aggregation subtree, so the
    # groupBy would execute LSH_BANDS times.  The array-of-structs explode
    # computes signatures once and fans out rows inside the same stage.
    def _key(b: int) -> Column:
        cols = [
            F.col(f"mh_{b * LSH_ROWS + r}").cast("string") for r in range(LSH_ROWS)
        ]
        return F.md5(F.concat_ws(":", *cols))

    entries = F.array(
        *[
            F.struct(F.lit(b).alias("band"), _key(b).alias("band_key"))
            for b in range(LSH_BANDS)
        ]
    )
    # persisted: both sides of the bucket self-join consume the band
    # index, and Spark duplicates the signature-aggregation subtree
    # across join branches otherwise (measured −15% at sf0.1)
    exploded = tracked_persist(
        signatures.select("doc_id", F.explode(entries).alias("e")).select(
            "doc_id", F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
        )
    )
    a = exploded.alias("a")
    b2 = exploded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    verify_max_shingles: int = VERIFY_MAX_SHINGLES,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify ≥ τ.

    The verify arm touches ONLY candidate pairs: each doc's distinct
    shingle set is collected once (bottom-k sorted array, shuffle-sized),
    then the candidate list joins it twice and computes the bottom-k
    Jaccard estimator over the union's k smallest hashes with
    array_intersect — O(candidates), not the all-pairs inverted-index
    join, and exact whenever both docs sit below the cap.  That is the
    property that keeps this sub-quadratic at 100 TB: LSH bounds the
    candidate count, and nothing downstream ever rebuilds the full pair
    space.

    The hashed-shingle DataFrame feeds both the signature arm and the
    verify arm, so it is computed once and persisted (shuffle-sized state,
    evicted by the executor's LRU when the job ends).  Both arms work on
    the 60-bit shingle hash, never the shingle string: signatures reduce
    it mod P (bit-identical, see minhash_signatures), and the verify
    intersects long arrays instead of string arrays — smaller state,
    cheaper compare, same Jaccard short of a ~2⁻⁶⁰ hash collision."""
    shh = tracked_persist(
        shingles(docs, n, text_col).select("doc_id", hash64(F.col("shingle")).alias("h"))
    )
    cand = tracked_persist(lsh_candidate_pairs(minhash_signatures(docs, hh=shh)))
    cand_ids = (
        cand.select(F.explode(F.array("a_id", "b_id")).alias("doc_id")).distinct()
    )
    # per-doc set capped at the k smallest hashes (bottom-k sketch, see
    # VERIFY_MAX_SHINGLES): exact below the cap, bounded state above it.
    # Persisted: both join sides consume it and Spark does not dedupe
    # the aggregation subtree across branches (measured −15% at sf0.1)
    sets = tracked_persist(
        shh.join(F.broadcast(cand_ids), "doc_id")
        .groupBy("doc_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("h")), 1, verify_max_shingles
            ).alias("sset")
        )
    )
    a = sets.select(F.col("doc_id").alias("a_id"), F.col("sset").alias("set_a"))
    b = sets.select(F.col("doc_id").alias("b_id"), F.col("sset").alias("set_b"))
    # Unbiased bottom-k Jaccard: restrict to the k smallest hashes of the
    # UNION, then count how many of those sit in both sets.  Membership in
    # A among the union's bottom-k is decidable from A's own bottom-k
    # sketch (anything in the union's bottom-k that belongs to A is also
    # in A's bottom-k), so the estimator is exact over the sampled slots —
    # unlike |A_k∩B_k| / |A_k∪B_k|, which systematically underestimates
    # near-threshold pairs when one doc exceeds the cap (ADVICE r4).
    # Below the cap uk IS the full union, so the result is exact Jaccard
    # and the DuckDB oracle equality is unchanged.
    uk = F.slice(
        F.array_sort(F.array_union(F.col("set_a"), F.col("set_b"))),
        1,
        verify_max_shingles,
    )
    inter_k = F.size(
        F.array_intersect(uk, F.array_intersect(F.col("set_a"), F.col("set_b")))
    )
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(inter_k.cast("double") / F.size(uk), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------------


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): SIMHASH_BITS-bit Charikar signature over token
    hashes (multiplicity-weighted).  Explode + one groupBy with one
    conditional-sum per bit; the bit loop is compile-time, not data-time."""
    # hash materialized as a column BEFORE the aggregate: each of the
    # SIMHASH_BITS bit-aggregates references h, and inlining the md5
    # expression into every aggregate would evaluate it 60× per token
    tok = docs.select(
        "doc_id", F.explode(tokens(text_col)).alias("tok")
    ).select("doc_id", hash64(F.col("tok")).alias("h"))
    # Packed per-bit ONES counts in a SINGLE aggregation: 3 bit-counters
    # share one 64-bit accumulator in 21-bit slots (capacity 2^21-1
    # tokens per doc — ~40× the corpus chunk cap) → 20 sum states
    # instead of 60.  Deliberately single-level: hash-partitioned
    # map-side partials already collapse each partition to ~1 row per
    # doc before the one shuffle, so a (doc, h) pre-count pass would ADD
    # a full distinct-token shuffle to save per-row arithmetic the
    # partials do anyway (measured −26% vs the two-level form at sf0.1).
    # Sign rule: majority ⇔ 2·ones > n; ties land on bit=0 exactly
    # like the classic Σ(±1) > 0.
    #
    # The 60-bit expression trees are assembled as SQL STRINGS and
    # handed to ONE F.expr each: building them out of ~200 Column
    # operations costs >1 s of py4j round-trips PER QUERY BUILD (driver
    # latency, re-paid every invocation), where parsing one generated
    # string is milliseconds.  Every term is fully parenthesized — SQL
    # `&` binds looser than comparison, and `+` tighter than shifts.
    slot_bits, slots = 21, 3
    n_chunks = (SIMHASH_BITS + slots - 1) // slots
    packed = []
    for c in range(n_chunks):
        terms = []
        for s in range(slots):
            j = c * slots + s
            if j >= SIMHASH_BITS:
                break
            terms.append(f"shiftleft((shiftright(h, {j}) & 1), {slot_bits * s})")
        packed.append(F.expr(f"sum({' + '.join(terms)})").alias(f"p_{c}"))
    agg = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"), *packed)
    slot_mask = (1 << slot_bits) - 1
    sig_terms = []
    for j in range(SIMHASH_BITS):
        c, s = divmod(j, slots)
        ones = f"(shiftright(p_{c}, {slot_bits * s}) & {slot_mask})"
        sig_terms.append(
            f"(CASE WHEN ({ones} * 2) > _n THEN CAST({1 << j} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    sig = F.expr(" + ".join(sig_terms))
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 6, text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ d.

    Demonstration form is the all-pairs join (fine at catalog sizes); the
    scale path is ``simhash_near_pairs_banded`` — identical output,
    sub-quadratic plan."""
    # persisted: both join arms reference the signature frame, and a
    # self-join otherwise duplicates the whole aggregation subtree
    s = tracked_persist(simhash(docs, text_col))
    a = s.alias("a")
    b = s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_pairs_banded(
    docs: DataFrame, max_hamming: int = 6, text_col: str = "text"
) -> DataFrame:
    """Hamming-≤d pairs via bit-slice banding — EXACTLY the all-pairs
    result, without the all-pairs join.

    The signature is sliced into ``max_hamming + 1`` bands; two
    signatures within Hamming distance d differ in at most d bands, so by
    pigeonhole at least one band is IDENTICAL — candidates are pairs
    sharing any (band, slice-value) bucket, found with a keyed equi-join,
    then verified with one xor/bit_count.  Recall is 1.0 by construction
    (not probabilistic like MinHash-LSH), so the banded plan is a drop-in
    replacement: the oracle for this operator is the all-pairs SQL.

    Scale: the equi-join's per-bucket fan-in is N/2^width per band.  At
    the 60-bit signature width each of the 7 bands carries 8–9 bits, so
    buckets stay small (N/2⁸⁻⁹ fan-in) — the 100 TB-safe slicing; all
    widths derive from SIMHASH_BITS, so no other code changes with it."""
    bands = max_hamming + 1
    base, extra = divmod(SIMHASH_BITS, bands)
    widths = [base + (1 if i < extra else 0) for i in range(bands)]
    offsets = [sum(widths[:i]) for i in range(bands)]

    # persisted for the same self-join-subtree reason as simhash_near_pairs
    s = tracked_persist(simhash(docs, text_col))
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1))
                .alias("key"),
            )
            for i in range(bands)
        ]
    )
    sliced = s.select("doc_id", "simhash", F.explode(entries).alias("e")).select(
        "doc_id", "simhash", F.col("e.band").alias("band"), F.col("e.key").alias("key")
    )
    a = sliced.alias("a")
    b = sliced.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can match in several bands
    )


# --- incremental dedup (new increment vs existing corpus) ---------------------


def band_entries(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — the exploded LSH band index of a
    signature frame (one explode, shared stage; see lsh_candidate_pairs
    for why not a per-band union)."""

    def _key(b: int) -> str:
        cols = ", ".join(
            f"CAST(mh_{b * LSH_ROWS + r} AS STRING)" for r in range(LSH_ROWS)
        )
        return f"md5(concat_ws(':', {cols}))"

    entries = F.expr(
        "array("
        + ", ".join(
            f"struct({b} AS band, {_key(b)} AS band_key)" for b in range(LSH_BANDS)
        )
        + ")"
    )
    return signatures.select("doc_id", F.explode(entries).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
    )


def incremental_dedup(
    old: DataFrame,
    new: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Dedup a NEW increment against an EXISTING corpus without touching
    old-vs-old pairs — the daily-ingest shape: at 100 TB the history is
    re-scanned but never re-joined against itself, and everything keyed
    by the (small) increment is broadcast.

    Per new document: ``dup_exact`` (its content fingerprint exists in
    the old corpus), ``near_dup_of`` (smallest old doc_id whose verified
    Jaccard ≥ τ among LSH band-collision candidates, else null), and
    ``keep`` (neither).  In production the old corpus's fingerprints,
    signatures, and band index are precomputed at ingest (ivf_write_layout
    analog); here they are derived inline from the old frame.

    Candidate generation is the banded-LSH cross join (old bands ⋈
    broadcast new bands — never old ⋈ old); the verify arm touches only
    candidates, same as minhash_lsh_dedup."""
    # exact tier: fingerprint semi-join, increment side broadcast
    new_fp = new.select(F.col("doc_id"), F.md5(F.col(text_col)).alias("fp"))
    old_fp = old.select(F.md5(F.col(text_col)).alias("fp"))
    exact_ids = (
        old_fp.join(F.broadcast(new_fp), "fp").select("doc_id").distinct()
    )

    # near tier: cross-frame banded LSH
    shh_old = tracked_persist(
        shingles(old, n, text_col).select("doc_id", hash64(F.col("shingle")).alias("h"))
    )
    shh_new = tracked_persist(
        shingles(new, n, text_col).select("doc_id", hash64(F.col("shingle")).alias("h"))
    )
    bands_old = band_entries(minhash_signatures(old, hh=shh_old))
    bands_new = band_entries(minhash_signatures(new, hh=shh_new)).select(
        F.col("doc_id").alias("new_id"), "band", "band_key"
    )
    cand = (
        bands_old.join(F.broadcast(bands_new), ["band", "band_key"])
        .select("new_id", F.col("doc_id").alias("old_id"))
        .distinct()
    )
    cand = tracked_persist(cand)

    # verify candidates only: Jaccard over 60-bit shingle-hash sets
    old_ids = cand.select(F.col("old_id").alias("doc_id")).distinct()
    sets_old = (
        shh_old.join(F.broadcast(old_ids), "doc_id")
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("set_o"))
        .select(F.col("doc_id").alias("old_id"), "set_o")
    )
    sets_new = (
        shh_new.groupBy("doc_id")
        .agg(F.collect_set("h").alias("set_n"))
        .select(F.col("doc_id").alias("new_id"), "set_n")
    )
    inter = F.size(F.array_intersect(F.col("set_n"), F.col("set_o")))
    union = F.size(F.col("set_n")) + F.size(F.col("set_o")) - inter
    near = (
        cand.join(sets_old, "old_id")
        .join(F.broadcast(sets_new), "new_id")
        .select(
            "new_id",
            "old_id",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("new_id")
        .agg(F.min("old_id").alias("near_dup_of"))
    )

    return (
        new.select("doc_id")
        .join(exact_ids.withColumn("_e", F.lit(True)), "doc_id", "left_outer")
        .join(near.withColumnRenamed("new_id", "doc_id"), "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("_e"), F.lit(False)).alias("dup_exact"),
            "near_dup_of",
            (F.col("_e").isNull() & F.col("near_dup_of").isNull()).alias("keep"),
        )
    )
