"""Global plan audit: every registered query's physical plan is checked
for the two patterns that must never appear in a scale-path operator —
unkeyed cartesian joins and row-at-a-time Python UDFs.  Exceptions are
explicit and documented, not discovered in review."""

from __future__ import annotations

import contextlib
import io

import pytest

from depositaja_spark import registry

SF = "/root/testdata/sf0.001"

#: definitionally all-pairs baselines: the brute-force scan IS the
#: product of corpus × (broadcast, 5-row) query set, and the blocked
#: matmul materializes block pairs by design (see SCALING.md)
CARTESIAN_OK = {
    "ann_topk_brute",
    "ann_topk_quantized",
    "embedding_near_dups",
    # fixed-benchmark decontamination: corpus × (broadcast, 32-vector
    # constant eval suite) — the deliberate O(N·K) production shape the
    # quadratic scaled-benchmark variant's guard points at (r12)
    "decontaminate_semantic_fixed",
    # hard-negative mining: same blocked-matmul block-pair join as
    # embedding_near_dups (the exact baseline the IVF-composed mining
    # path is measured against)
    "hard_negative_pairs",
    # text ANN: the exact brute scan IS corpus × (broadcast, 3-doc IN-list
    # query set) — same baseline shape as ann_topk_brute
    "text_ann_topk",
    # retrieval eval: scores the SAME cosine_topk brute scan over the
    # 5-vector broadcast query set; the metric math itself runs on the
    # k-bounded ranked frame
    "retrieval_eval_at_k",
    # ANN recall: composes the brute baseline (above) with the IVF
    # plan; the metric join touches only the two k-bounded result frames
    "ann_recall_ivf",
    # hybrid RRF / MMR: their semantic leg (candidate pool) is the SAME
    # cosine_topk brute scan over the 3-doc broadcast query set; the
    # fusion / greedy stages themselves touch only per-query top-N frames
    "hybrid_search_rrf",
    "mmr_diverse_topk",
    # the non-banded SimHash pair join is the all-pairs BASELINE kept so
    # the banded scale path can be asserted result-equal to it
    "simhash_near_dups",
    # 1-row broadcast scalar joins (corpus count / thresholds) plan as
    # BroadcastNestedLoopJoin with a single-row build side
    "tfidf_top_terms",
    # association rules: the basket-population normalizer N is a 1-row
    # broadcast cross join onto the rule frame (same scalar shape)
    "assoc_rules_lift",
    # quantile normalization: the 101-value global percentile grid is a
    # 1-row broadcast cross join onto the per-doc frame
    "quality_quantile_norm",
    # HLL overlap: the pair stage is an inequality join over the
    # |types|-row SKETCH frame (bounded aggregate, never the corpus) —
    # mergeable-sketch algebra is exactly the operator's point
    "hll_event_type_overlap",
    # Benford audit: the grand total over the 9-row digit frame is a
    # 1-row broadcast cross join (same scalar shape as tfidf_top_terms)
    "benford_price_audit",
    # cross-correlation: the 5-row literal lag dimension is a bounded
    # broadcast cross join onto the calendar-bounded hourly frame
    "hourly_crosscorr_leadlag",
    # KS test: the per-arm totals are a 1-row broadcast cross join onto
    # the domain-bounded distinct-value frame (same scalar shape as the
    # Benford grand total)
    "ks_test_value_dist",
    # decision stump: the class totals are the same 1-row broadcast
    # scalar join onto the domain-bounded candidate frame
    "gini_split_stump",
    # chi2 independence: the contingency grid is a cross of the two
    # BOUNDED marginal frames (|types| x 24) plus the 1-row total —
    # aggregate algebra, never the corpus
    "chi2_type_hour_independence",
    # ABC classification: the revenue total is a 1-row broadcast cross
    # join onto the per-part cumulative frame
    "abc_part_classification",
    # Mann-Whitney U: single global aggregates over the domain-bounded
    # distinct-value frame; any scalar joins are 1-row broadcasts
    "mannwhitney_value_dist",
    # Markov steady state: the dangling teleport grid is a cross of
    # BOUNDED |types|-row frames plus 1-row count/total scalars
    "markov_steady_state",
    # CUPED: the data-derived period midpoint is a 1-row broadcast
    # cross join onto the corpus scan
    "cuped_variance_reduction",
    # k-fold audit: the corpus total is the same 1-row broadcast scalar
    "kfold_split_balance",
    # session affinity: the total-sessions scalar is a 1-row broadcast
    # cross join onto the bounded |types|^2 pair frame
    "session_type_affinity",
    # whale share: the k/total scalars are 1-row broadcast cross joins
    "whale_value_share",
    # ANOVA: the (N, ΣX, ΣX², k) totals are a 1-row broadcast cross
    # join onto the |types|-row moment frame
    "anova_value_by_type",
    # rolling 7d actives: the corpus-end day is the same 1-row
    # broadcast cross join, bounding phantom tail days
    "rolling_7d_active_users",
    # time-decay value: the corpus-end day is the same 1-row broadcast
    "user_value_time_decay",
    # TPC-H Q11/Q22 shapes: the HAVING-against-a-global-scalar cutoff is
    # a single-row broadcast join by construction
    "important_part_value",
    "global_sales_opportunity",
    # epoch planning: the corpus-total and mixture-normalizer scalars are
    # 1-row broadcast cross joins onto the per-source frame
    "source_epoch_plan",
    # funnel: the three stage counts are single-row frames combined by
    # broadcast cross join
    "funnel_conversion",
    # heavy hitters: the n/(k+1) threshold is a 1-row broadcast scalar
    "heavy_hitter_events",
    # NB classifier: the (T_target, T_other, V) normalizers and the class
    # prior are 1-row broadcast scalars onto vocab/doc frames
    "domain_classifier_weights",
    "domain_classifier_scores",
    # calibration inherits the scorer's 1-row prior broadcast (plus the
    # distributed-ntile bucket-offset scalar)
    "classifier_calibration",
    # AUC inherits the same 1-row prior broadcast (plus the
    # grouped-ntile bucket-offset scalar)
    "classifier_auc",
    # Brier decomposition: the (N, ΣY, Σsq) totals are a 1-row
    # broadcast cross join onto the 10-row bin frame
    "brier_decomposition",
    # PMI: the corpus-size scalar is a 1-row broadcast cross join onto
    # the ≤V²-row pair frame
    "token_pmi_topv",
    # PageRank: N and the per-iteration dangling mass are 1-row broadcast
    # scalars onto the node frame (personalized adds the 1-row seed-count
    # scalar for the teleport vector)
    "supplier_pagerank",
    "nation_seeded_pagerank",
    # DSIR: the (T_target, T_raw) feature totals are a 1-row broadcast
    # scalar onto the ≤B-row bucket frame
    "dsir_importance_weights",
    "dsir_top_docs",
    # BM25: the (N, avgdl) corpus stats are a 1-row broadcast scalar
    # onto the ≤|Q|-row idf frame and the per-doc contribution frame
    "bm25_search",
    # PSI drift: the time-split scalar is a 1-row broadcast and the
    # (types × bins × periods) grid is a broadcast cross join of
    # cap-bounded frames
    "psi_value_drift",
    # drift monitor: the densification cross join is (distinct sources ×
    # broadcast top-V head) — cap-bounded, never vocabulary- or
    # corpus-sized — plus 1-row broadcast scalar joins for the tail
    # mass / support width
    "source_token_divergence",
    # pinned-axes variance: the corpus count n and total-variance tv are
    # 1-row broadcast scalars joined onto the ≤d-row per-dim frame and
    # the 1-row moment frame
    "embedding_pca_variance",
    # Fleiss kappa: the three scalar moments (Σn_ij², N, Σc_j²) are
    # 1-row frames combined by broadcast cross join
    "fleiss_kappa_panel",
    # isotonic calibration: the j<=k interval self-join crosses the
    # <=101-row DISTINCT-score frame with itself (bounded aggregate
    # frames on both sides — the chi2-grid shape, never the corpus)
    "isotonic_calibration",
    # modularity: the (m, I) edge-count scalars are 1-row broadcast
    # cross joins onto the 1-row ΣD² moment frame
    "copurchase_modularity",
    # HITS: the per-side (count, Σscore) normalizers are 1-row broadcast
    # cross joins onto the node frames
    "hits_user_part",
    # kappa: the corpus count n is a 1-row broadcast scalar joined onto
    # the ≤C(L,2)=10-row agreement frame; every corpus-sized shuffle is
    # keyed on doc_id
    "labeler_agreement_kappa",
    # TextRank: the pagerank internals' N / dangling-mass scalars are the
    # same 1-row broadcast cross joins as supplier_pagerank, onto the
    # vocabulary-bounded node frame
    "textrank_keywords",
    # embedding outliers: the folded (μ⃗, σ⃗²) moment frame is a 1-row
    # broadcast cross join onto the corpus scan (scalar-stats shape)
    "embedding_outlier_scores",
    # target encoding: the global (N, ΣY) moment is a 1-row broadcast
    # cross join onto the |cats|×|folds| bounded frame
    "target_encode_priority",
    # conformal: the (n_cal, q̂) calibration scalar is a 1-row broadcast
    # cross join onto the test-fold scan
    "conformal_value_interval",
    # periodogram: the (n, μ, ss) moment scalar and the 3-row period
    # literal are broadcast cross joins onto the calendar-bounded daily
    # frame (the hourly_crosscorr_leadlag shape)
    "daily_value_periodogram",
    # LOO impact: the corpus (N, Σchars) total is a 1-row broadcast
    # cross join onto the |sources|-bounded frame
    "source_loo_impact",
    # stratified ATE: the (N, n_strata) total is a 1-row broadcast
    # cross join onto the ≤4-row strata frame
    "stratified_ate_conversion",
}

#: iterative/driver-coordinated queries whose plan is built per run
#: (k-means, BPE, PQ training) — they run Arrow-batched pandas_udfs,
#: never row-at-a-time, which the check below still enforces
_SLOW_TO_PLAN = {"bpe_merges", "bpe_subword_counts", "ann_topk_pq", "ann_topk_ivfpq"}


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - _SLOW_TO_PLAN)
)
def test_no_cartesian_no_rowwise_python(spark, name):
    df = registry.QUERIES[name](spark, SF)
    p = _plan_of(df)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in p, f"{name}: unkeyed cartesian join"
        assert "BroadcastNestedLoop" not in p, f"{name}: nested-loop join"
    # BatchEvalPython = row-at-a-time Python UDF; ArrowEvalPython (pandas
    # UDFs) is the only Python allowed in any plan
    assert "BatchEvalPython" not in p, f"{name}: row-at-a-time Python UDF"


# --- 100×-design regression net ----------------------------------------------
#
# Two bug classes that are invisible at sf0.1 but fatal at cluster scale,
# caught statically from the ANALYZED logical plan (no execution needed):
#
#   (a) a forced broadcast hint whose subtree scans a table that grows
#       with the scale factor, with nothing (Aggregate / Limit /
#       Deduplicate / equality filter on a key) bounding its cardinality
#       — at 100× the hint overrides AQE's size check and OOMs;
#   (b) a running window partitioned ONLY by a low-cardinality column
#       (lang / predicted_lang / score) directly over a corpus-sized
#       frame — the dominant partition (English ≈ half of any web
#       corpus) lands on ONE task's sort.

#: signature column that appears in a relation's schema iff it is that
#: sf-scaling table (fixed-size nation/region are deliberately absent)
_SCALING_TABLE_SIGS = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "lineitem": "l_linenumber",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "documents": "n_chars",
    "embeddings": "embedding",
}

#: nodes that bound a subtree's cardinality regardless of input size.
#: Aggregate is deliberately NOT here: an aggregate only bounds its
#: output when its grouping keys span a fixed domain — grouped by an
#: sf-scaling key (l_orderkey, doc_id, a shingle hash) it emits one row
#: per key and scales right along with the input (the round-5
#: large_volume_orders hole).  Aggregates are handled by
#: _aggregate_is_bounded below.
_BOUNDING_NODES = ("GlobalLimit", "LocalLimit", "Deduplicate")

#: grouping columns whose domain does not grow with the scale factor:
#: dimension keys/names (25 nations, 5 regions), enum-like attribute
#: columns, language/source tags, and the engine's own bounded bucket
#: indices (_vb value buckets, band ids, quantile bucket ids)
_FIXED_DOMAIN_GROUP_COLS = {
    "n_name", "n_nationkey", "r_name", "r_regionkey",
    "supp_nation", "cust_nation", "nation",
    "lang", "predicted_lang", "source", "score",
    # embeddings.label: 10-class fixed domain (the synthetic corpus's
    # cluster tag — a class vocabulary, not an sf-scaling key)
    "label",
    "c_mktsegment", "p_brand", "p_type", "p_container", "p_size",
    "event_type", "o_orderstatus", "o_orderpriority", "l_returnflag",
    "l_linestatus", "l_shipmode", "flagged", "above_threshold",
    "_vb", "band", "bucket", "cell", "bin_idx", "grp", "year",
    # epoch-day mod 7: a 7-value domain by construction (seasonal
    # decomposition's per-weekday means)
    "weekday",
    # spark_partition_id(): bounded by the partition count (a cluster
    # config), never by the scale factor (skyline's ≤P-row summary)
    "_pid",
    # lit(1) constant group key: the single-group trick that reuses
    # grouped_ntile_cume for a GLOBAL rank (classifier_auc, whale share)
    # — a 1-value domain by construction
    "_g",
}


def _bracket_groups(node: str) -> list[str]:
    groups, depth, start = [], 0, None
    for k, ch in enumerate(node):
        if ch == "[":
            if depth == 0:
                start = k
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(node[start + 1 : k])
    return groups


def _aggregate_is_bounded(node: str) -> bool:
    """True iff an Aggregate node's OUTPUT cardinality is sf-invariant:
    no grouping keys (global scalar, 1 row) or every grouping key drawn
    from a fixed domain."""
    import re

    groups = _bracket_groups(node)
    if not groups:
        return False
    if len(groups) == 1:
        # `Aggregate [aggExprs]` — empty grouping prints ONE bracket
        # group (global scalar, 1 row); grouped prints two
        return True
    grouping = {m.group(1) for m in re.finditer(r"(\w+)#\d+", groups[0])}
    return grouping <= _FIXED_DOMAIN_GROUP_COLS  # vacuously true when empty

_LOW_CARD_COLS = {
    "lang",
    "predicted_lang",
    "score",
    # round-5 additions: fixed-domain columns over sf-scaling tables
    "c_mktsegment",
    "p_brand",
    "event_type",
    "source",
}


def _tree(plan_str: str) -> list[tuple[int, str]]:
    """Parse a Spark tree string into (depth, node_text) rows."""
    out = []
    for line in plan_str.splitlines():
        if not line.strip():
            continue
        i = 0
        while i < len(line) and line[i] in ":+- ":
            i += 1
        out.append((i // 3, line[i:] if i < len(line) else line))
    return out


def _subtree(rows: list[tuple[int, str]], i: int) -> list[str]:
    d = rows[i][0]
    out = []
    for j in range(i + 1, len(rows)):
        if rows[j][0] <= d:
            break
        out.append(rows[j][1])
    return out


def _window_partition_cols(node: str) -> set[str]:
    """Column names of a Window node's partition spec (2nd top-level
    bracket group in `Window [exprs], [partition], [order]`)."""
    groups, depth, start = [], 0, None
    for k, ch in enumerate(node):
        if ch == "[":
            if depth == 0:
                start = k
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(node[start + 1 : k])
    if len(groups) < 3:
        return set()
    import re

    return {m.group(1) for m in re.finditer(r"(\w+)#\d+", groups[-2])}


def _analyzed(df) -> list[tuple[int, str]]:
    return _tree(df._jdf.queryExecution().analyzed().toString())


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - _SLOW_TO_PLAN)
)
def test_no_unbounded_forced_broadcast(spark, name):
    """Every broadcast HINT must cover a provably bounded frame: either
    it scans no sf-scaling table at all (nation/region/inline values), or
    something in its subtree (Aggregate, Limit, Deduplicate, a key-
    equality Filter) bounds the cardinality before the hint."""
    rows = _analyzed(registry.QUERIES[name](spark, SF))
    for i, (_, node) in enumerate(rows):
        if not node.startswith("ResolvedHint") or "broadcast" not in node.lower():
            continue
        sub = _subtree(rows, i)
        scans_scaling = any(
            sig in n
            for n in sub
            if n.startswith("Relation")
            for sig in _SCALING_TABLE_SIGS.values()
        )
        if not scans_scaling:
            continue
        bounded = (
            any(n.startswith(_BOUNDING_NODES) for n in sub)
            or any(
                n.startswith("Aggregate") and _aggregate_is_bounded(n)
                for n in sub
            )
            or any(
                # point / fixed-probe-set filter on a key column (check_one's
                # probe slice, the ANN query-vector IN-list)
                n.startswith("Filter") and ("=" in n or " IN (" in n)
                for n in sub
            )
        )
        assert bounded, (
            f"{name}: forced broadcast over an unbounded sf-scaling scan:\n"
            + "\n".join(sub[:6])
        )


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - _SLOW_TO_PLAN)
)
def test_no_low_cardinality_window_over_corpus(spark, name):
    """No window may partition ONLY by low-cardinality columns directly
    over a corpus-sized frame — running sums over (lang, ...) must go
    through the two-level bucket-offset pattern (functions/windows.py).

    Checked on the PHYSICAL plan so legitimate reductions below the
    window are visible: an Aggregate (the frame is already reduced) or a
    partial WindowGroupLimit (Spark's own two-phase top-k — rank filters
    prune each stratum to k rows BEFORE the per-key shuffle, so the
    dominant value never ships its whole partition to one task)."""
    rows = _tree(
        registry.QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    for i, (_, node) in enumerate(rows):
        if not node.startswith("Window"):
            continue
        part = _window_partition_cols(node)
        if not part or not part <= _LOW_CARD_COLS:
            continue
        sub = _subtree(rows, i)
        if any("Aggregate" in n or n.startswith("WindowGroupLimit") for n in sub):
            continue
        scans_corpus = any(
            "Scan parquet" in n
            and (
                "n_chars" in n          # documents
                or "embedding" in n     # embeddings
                or "c_acctbal" in n     # customer
                or "p_retailprice" in n # part
                or "user_id" in n       # events
            )
            for n in sub
        )
        assert not scans_corpus, (
            f"{name}: window partitioned only by {sorted(part)} over a "
            "corpus-sized frame — single-task sort for the dominant value"
        )


# --- hot-basket net ----------------------------------------------------------
#
# The Σ basket² bug class (round-7 mining, round-8 graph family): a
# within-basket pair self-join `a.join(b, "ok")` keyed on an sf-scaling
# basket key generates per-key fan-out quadratic in basket size, so ONE
# crawler-shaped 10^5-line "order" yields ~10^10 pairs from a single key.
# The fix is always the same — cap_baskets (functions/mining.py) drops
# oversized baskets with a LeftSemi join BEFORE the pair join — and this
# net makes the fix structurally unforgettable: every Inner equi-join on
# a basket-key column whose BOTH inputs scan an sf-scaling table must
# carry that LeftSemi cap (or a bounded Aggregate) in each input subtree.

#: join-key column names that identify a within-basket self-join: the
#: raw order key and the repo-wide `ok` alias every basket frame uses
_BASKET_KEY_COLS = {"ok", "l_orderkey"}

import re as _re


def _join_condition_cols(node: str) -> set[str]:
    """Column names equated in a Join node's condition — pairs like
    `(ok#12 = ok#45)` contribute 'ok'."""
    return {
        m.group(1)
        for m in _re.finditer(r"\((\w+)#\d+L? = (\w+)#\d+L?\)", node)
        if m.group(1) == m.group(2)
    }


def _direct_children(rows: list[tuple[int, str]], i: int) -> list[list[str]]:
    """The subtree row-texts of each DIRECT child of node i."""
    d = rows[i][0]
    children, cur = [], None
    for j in range(i + 1, len(rows)):
        dj, nj = rows[j]
        if dj <= d:
            break
        if dj == d + 1:
            cur = [nj]
            children.append(cur)
        elif cur is not None:
            cur.append(nj)
    return children


def _uncapped_basket_joins(rows: list[tuple[int, str]]) -> list[str]:
    """Inner equi-joins on a basket key whose both inputs scan an
    sf-scaling table with no LeftSemi cap (and no bounded Aggregate)
    between scan and join."""
    bad = []
    for i, (_, node) in enumerate(rows):
        if not node.startswith("Join Inner"):
            continue
        if not (_join_condition_cols(node) & _BASKET_KEY_COLS):
            continue
        kids = _direct_children(rows, i)
        if len(kids) != 2:
            continue
        def scans_scaling(sub: list[str]) -> bool:
            return any(
                sig in n
                for n in sub
                if n.startswith("Relation")
                for sig in _SCALING_TABLE_SIGS.values()
            )
        def capped(sub: list[str]) -> bool:
            return any(
                n.startswith("Join LeftSemi") for n in sub
            ) or any(
                n.startswith("Aggregate") and _aggregate_is_bounded(n)
                for n in sub
            )
        if all(scans_scaling(k) for k in kids) and not all(capped(k) for k in kids):
            bad.append(node)
    return bad


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - _SLOW_TO_PLAN)
)
def test_no_uncapped_basket_self_join(spark, name):
    """No registered query may pair-join a basket frame on its basket
    key without the cap_baskets LeftSemi guard upstream on both sides —
    the net that would have caught the round-8 graph-family paste."""
    rows = _analyzed(registry.QUERIES[name](spark, SF))
    bad = _uncapped_basket_joins(rows)
    assert not bad, (
        f"{name}: uncapped within-basket self-join (Σ basket² fan-out; "
        f"apply cap_baskets before the pair join):\n" + "\n".join(bad)
    )


def test_audit_catches_uncapped_basket_join(spark):
    """Self-test: the EXACT pre-round-9 graph-family edge build (raw
    order-keyed lineitem self-join, support filter after pairing) must
    be flagged — proves the net detects the bug class it exists for."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    bad_edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count_distinct("ok").alias("support"))
        .filter(F.col("support") >= 2)
        .select("u", "v")
    )
    assert _uncapped_basket_joins(_analyzed(bad_edges)), (
        "checker failed to flag the uncapped basket self-join"
    )

    from depositaja_spark.functions.graph import copurchase_edges

    good = copurchase_edges(li)
    assert not _uncapped_basket_joins(_analyzed(good)), (
        "checker flags the capped builder — cap join not recognized"
    )


def test_audit_catches_scaling_key_agg_broadcast(spark):
    """Self-test of the tightened broadcast net: the PRE-round-6
    large_volume_orders shape (forced broadcast of a HAVING-pruned
    aggregate grouped by the sf-scaling l_orderkey) must be flagged —
    a fixed qty threshold passes a fixed FRACTION of an sf-growing
    order count, so nothing bounds the frame at 100×."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(
        F.col("q") > 250
    )
    bad = F.broadcast(big).join(orders, big.l_orderkey == orders.o_orderkey)
    rows = _analyzed(bad)
    flagged = False
    for i, (_, node) in enumerate(rows):
        if not node.startswith("ResolvedHint") or "broadcast" not in node.lower():
            continue
        sub = _subtree(rows, i)
        scans_scaling = any(
            sig in n
            for n in sub
            if n.startswith("Relation")
            for sig in _SCALING_TABLE_SIGS.values()
        )
        bounded = (
            any(n.startswith(_BOUNDING_NODES) for n in sub)
            or any(
                n.startswith("Aggregate") and _aggregate_is_bounded(n)
                for n in sub
            )
            or any(
                n.startswith("Filter") and ("=" in n or " IN (" in n)
                for n in sub
            )
        )
        if scans_scaling and not bounded:
            flagged = True
    assert flagged, "checker failed to flag the scaling-key aggregate broadcast"


def test_audit_catches_naive_low_card_window(spark):
    """Self-test of the net: the PRE-round-5 pack_documents shape (flat
    running sum partitioned by lang over the raw corpus) must be flagged
    — proves the checker actually detects the bug class it exists for."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    bad = docs.withColumn("cum", F.sum("n_chars").over(w))
    rows = _tree(bad._jdf.queryExecution().sparkPlan().toString())
    flagged = False
    for i, (_, node) in enumerate(rows):
        if not node.startswith("Window"):
            continue
        part = _window_partition_cols(node)
        if part and part <= _LOW_CARD_COLS:
            sub = _subtree(rows, i)
            if not any(
                "Aggregate" in n or n.startswith("WindowGroupLimit") for n in sub
            ) and any("Scan parquet" in n and "n_chars" in n for n in sub):
                flagged = True
    assert flagged, "checker failed to flag the naive per-lang window"


def test_audit_catches_forced_broadcast_of_scaling_table(spark):
    """Self-test: a forced broadcast of raw `customer` (the pre-round-5
    TPC-H shape) must be flagged."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    bad = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    rows = _tree(bad._jdf.queryExecution().analyzed().toString())
    flagged = False
    for i, (_, node) in enumerate(rows):
        if node.startswith("ResolvedHint") and "broadcast" in node.lower():
            sub = _subtree(rows, i)
            scans = any(
                sig in n
                for n in sub
                if n.startswith("Relation")
                for sig in _SCALING_TABLE_SIGS.values()
            )
            bounded = any(n.startswith(_BOUNDING_NODES) for n in sub) or any(
                n.startswith("Filter") and ("=" in n or " IN (" in n) for n in sub
            )
            if scans and not bounded:
                flagged = True
    assert flagged, "checker failed to flag the forced customer broadcast"
