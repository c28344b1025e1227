"""Behavioral tests for the governance tier (queries_gov): planted
fixtures for the readability formula and the interval bucket-explode,
plus structural invariants of the privacy audits, TextRank, and the
embedding outlier scan on the real sf0.001 tables.  (Engine↔oracle
value equality is covered query-by-query in tests/test_oracle.py.)"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from depositaja_spark import registry
from depositaja_spark.queries_gov import (
    _K_MIN,
    _OUT_THR,
    interval_month_counts,
    readability_doc_metrics,
)
from depositaja_spark.functions.text import STOPWORDS_EN

SF = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


# --- readability: planted formula checks --------------------------------------


def test_flesch_exact_on_planted_doc(spark):
    # "ba ba ba": 3 words, 1 sentence chunk, 3 vowel groups
    df = spark.createDataFrame([("ba ba ba",)], ["text"])
    row = readability_doc_metrics(df).collect()[0]
    assert row.flesch == pytest.approx(206.835 - 1.015 * 3.0 - 84.6 * 1.0, abs=1e-9)
    assert row.fk == pytest.approx(0.39 * 3.0 + 11.8 * 1.0 - 15.59, abs=1e-9)


def test_flesch_monotone_in_syllable_density(spark):
    # same word count, more vowel groups per word => harder (lower flesch)
    df = spark.createDataFrame(
        [("easy", "bb bb bb bb"), ("hard", "aeiou-aeiou aeiou aeiou aeiou")],
        ["tag", "text"],
    )
    rows = {r.tag: r.flesch for r in readability_doc_metrics(df).collect()}
    assert rows["hard"] < rows["easy"]


def test_sentence_chunking_floor(spark):
    # 17 words => 2 sixteen-token chunks; 16 => 1; empty-ish => >= 1
    df = spark.createDataFrame(
        [(" ".join(["b"] * 17),), (" ".join(["b"] * 16),)], ["text"]
    )
    out = readability_doc_metrics(df).select("flesch").collect()
    w17 = 206.835 - 1.015 * (17 / 2.0) - 84.6 * 0.0
    w16 = 206.835 - 1.015 * 16.0 - 84.6 * 0.0
    got = sorted(r.flesch for r in out)
    assert got == pytest.approx(sorted([w17, w16]), abs=1e-9)


# --- interval bucket-explode: planted expansion --------------------------------


def test_interval_expansion_covers_every_spanned_month(spark):
    iv = spark.createDataFrame(
        [
            (dt.datetime(1995, 1, 15), dt.datetime(1995, 3, 2)),
            (dt.datetime(1995, 2, 1), dt.datetime(1995, 2, 20)),
        ],
        ["s", "e"],
    )
    got = {r.month: r.n_open for r in interval_month_counts(iv).collect()}
    assert got == {"1995-01": 1, "1995-02": 2, "1995-03": 1}


def test_interval_single_month_point(spark):
    iv = spark.createDataFrame(
        [(dt.datetime(2000, 6, 30), dt.datetime(2000, 6, 30))], ["s", "e"]
    )
    got = interval_month_counts(iv).collect()
    assert [(r.month, r.n_open) for r in got] == [("2000-06", 1)]


def test_orders_open_totals_tie_out(spark):
    """Σ n_open == Σ per-order month spans (the fanout is exactly the
    covered-months multiset, nothing dropped or double-counted)."""
    df = registry.QUERIES["orders_open_by_month"](spark, SF)
    total = df.agg(F.sum("n_open")).collect()[0][0]
    from depositaja_spark.sources import load_table

    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    spans = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("mx"))
        .select(
            (
                F.months_between(
                    F.date_trunc("month", F.greatest("mx", F.col("o_orderdate"))),
                    F.date_trunc("month", F.col("o_orderdate")),
                ).cast("long")
                + F.lit(1)
            ).alias("n_months")
        )
        .agg(F.sum("n_months"))
        .collect()[0][0]
    )
    assert total == spans > 0


# --- privacy audits: structural invariants -------------------------------------


def _joined_record_count(spark):
    from depositaja_spark.sources import load_table

    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    return orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).count()


def test_k_anonymity_partitions_all_records(spark):
    df = registry.QUERIES["k_anonymity_audit"](spark, SF)
    rows = df.collect()
    assert sum(r.n_records for r in rows) == _joined_record_count(spark)
    for r in rows:
        assert r.n_records == r.class_size * r.n_classes
        assert r.class_size >= 1


def test_l_diversity_partitions_all_records(spark):
    df = registry.QUERIES["l_diversity_audit"](spark, SF)
    rows = df.collect()
    assert sum(r.n_records for r in rows) == _joined_record_count(spark)
    # sensitive domain is the 5 order priorities
    assert all(1 <= r.l_distinct <= 5 for r in rows)


def test_reident_risk_bounds(spark):
    rows = registry.QUERIES["reident_risk_by_nation"](spark, SF).collect()
    assert rows, "risk drilldown must not be empty"
    for r in rows:
        assert 0 <= r.n_risky <= r.n_records
        assert 0.0 <= r.risk_pct <= 100.0
    # cross-check one nation against a direct recount
    assert sum(r.n_records for r in rows) == _joined_record_count(spark)


def test_k_min_is_the_audits_shared_constant():
    """reident_risk_by_nation's oracle SQL embeds the same K_MIN the
    engine uses (a drifted literal would silently change semantics on
    one side only)."""
    assert f"k < {_K_MIN}" in registry.ORACLES["reident_risk_by_nation"]


# --- TextRank ------------------------------------------------------------------


def test_textrank_scaled_ranks_mean_one(spark):
    df = registry.QUERIES["textrank_keywords"](spark, SF)
    rows = df.collect()
    assert len(rows) > 5
    mean = sum(r.pr_scaled for r in rows) / len(rows)
    assert mean == pytest.approx(1.0, abs=1e-3)
    words = {r.word for r in rows}
    assert not (words & set(STOPWORDS_EN)), "stopwords must be filtered out"
    # ranks differentiate: not all equal (the co-occurrence graph is not regular)
    assert len({r.pr_scaled for r in rows}) > 1


# --- embedding outliers ---------------------------------------------------------


def test_outlier_scores_nonnegative_and_flag_consistent(spark):
    rows = registry.QUERIES["embedding_outlier_scores"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.m2_score >= 0.0
        assert r.is_outlier == (r.m2_score > _OUT_THR)
    # diagonal-standardized squared distance has mean ~ d under the
    # corpus's own moments (exact if moments were unrounded; round-6
    # perturbs it only marginally)
    mean = sum(r.m2_score for r in rows) / len(rows)
    assert mean == pytest.approx(64.0, rel=0.05)


# --- weighted SSSP (registered alongside the graph family) ----------------------


def test_weighted_sssp_prefers_cheap_multi_hop_path(spark):
    from depositaja_spark.functions.graph import weighted_sssp

    # 1 -10- 4 direct, but 1 -1- 2 -1- 3 -1- 4 is cheaper (3 < 10)
    edges = spark.createDataFrame(
        [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)], ["u", "v", "w"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.dist for r in weighted_sssp(edges, seeds, rounds=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_weighted_sssp_bounded_rounds_partial(spark):
    from depositaja_spark.functions.graph import weighted_sssp

    # chain 1-2-3-4: with 2 rounds node 4 is reached (hop 3 needs 3 rounds)
    edges = spark.createDataFrame([(1, 2, 5), (2, 3, 5), (3, 4, 5)], ["u", "v", "w"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.dist for r in weighted_sssp(edges, seeds, rounds=2).collect()}
    assert got == {1: 0, 2: 5, 3: 10}


def test_snapshot_diff_partitions_orders(spark):
    from depositaja_spark.sources import load_table

    rows = registry.QUERIES["snapshot_diff_orders"](spark, SF).collect()
    by_type: dict = {}
    for r in rows:
        by_type[r.change_type] = by_type.get(r.change_type, 0) + r.n_rows
        if r.change_type in ("added", "removed", "unchanged"):
            assert r.changed_cols == ""
        else:
            assert r.changed_cols in (
                "o_orderstatus", "o_totalprice", "o_orderstatus,o_totalprice"
            )
    n_orders = load_table(spark, SF, "orders").count()
    # every A-key is removed/changed/unchanged; added rows are the inserts
    assert (
        by_type.get("removed", 0) + by_type.get("changed", 0)
        + by_type.get("unchanged", 0) == n_orders
    )
    assert by_type.get("added", 0) > 0 and by_type.get("changed", 0) > 0


def test_generalization_levels_cover_all_records(spark):
    rows = registry.QUERIES["qi_generalization_levels"](spark, SF).collect()
    assert sum(r.n_records for r in rows) == _joined_record_count(spark)
    assert all(0 <= r.gen_level <= 4 for r in rows)
    # coarser-is-bigger monotonicity implies levels actually spread at
    # the small fixture (month classes are tiny, all-time classes big)
    assert len(rows) >= 2


# --- Jaro-Winkler linkage --------------------------------------------------------


def test_jw_udf_matches_duckdb_on_vectors_and_corpus(spark):
    """The Arrow scorer must be value-identical to DuckDB's native
    jaro_winkler_similarity (the oracle recomputes every score) — checked
    on the published Winkler vectors, edge cases, and real fixture names."""
    import duckdb

    from depositaja_spark.functions.fuzzy import jaro_winkler_udf
    from depositaja_spark.sources import load_table

    names = [
        r[0]
        for r in load_table(spark, SF, "part").select("p_name").distinct().collect()
    ]
    pairs = [(a, b) for a in names[:15] for b in names[:15]]
    pairs += [
        ("martha", "marhta"), ("DWAYNE", "DUANE"), ("DIXON", "DICKSONX"),
        ("", ""), ("a", ""), ("ab", "ba"), ("same", "same"),
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    jw = jaro_winkler_udf()
    got = {(r.a, r.b): r.s for r in df.select("a", "b", jw("a", "b").alias("s")).collect()}
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert got[(a, b)] == pytest.approx(want, abs=1e-12), (a, b)


def test_jw_matches_every_dirty_name_finds_its_source(spark):
    """Each transposition-dirtied name must link back to its clean source
    at >= threshold (the ER recall floor on the planted corruption)."""
    from depositaja_spark.queries_gov import _JW_DIRTY_EXPR, _JW_DIRTY_P
    from depositaja_spark.sources import load_table

    rows = registry.QUERIES["jw_name_matches"](spark, SF).collect()
    assert rows
    matched_queries = {r.query_name for r in rows}
    part = load_table(spark, SF, "part")
    dirty = (
        part.select(F.col("p_name").alias("s"))
        .where(F.length("p_name") >= 4)
        .distinct()
        .withColumn("p", F.expr(_JW_DIRTY_P))
        .selectExpr(f"{_JW_DIRTY_EXPR} AS q")
        .distinct()
    )
    all_dirty = {r.q for r in dirty.collect()}
    assert all_dirty <= matched_queries, "a dirty name failed to link back"
    for r in rows:
        assert 0.9 <= r.jw <= 1.0


# --- session-3 ML ops: target encoding + conformal intervals ---------------------


def test_target_encoding_python_replay(spark):
    """Exact third-implementation replay: recompute every (cat, fold)
    encoding from the raw rows in pure Python and compare bit-for-bit
    (both engines and this replay run the same integer arithmetic)."""
    from depositaja_spark.sources import load_table

    rows = (
        load_table(spark, SF, "orders")
        .select("o_orderpriority", "o_orderkey", "o_orderstatus")
        .collect()
    )
    recs = [
        (r.o_orderpriority, r.o_orderkey % 5, 1 if r.o_orderstatus == "F" else 0)
        for r in rows
    ]
    n_all = len(recs)
    s_all = sum(y for _, _, y in recs)
    from collections import defaultdict

    nf, sf_, nc, sc_, ncf, scf = (
        defaultdict(int), defaultdict(int), defaultdict(int),
        defaultdict(int), defaultdict(int), defaultdict(int),
    )
    for cat, fold, y in recs:
        nf[fold] += 1; sf_[fold] += y
        nc[cat] += 1; sc_[cat] += y
        ncf[(cat, fold)] += 1; scf[(cat, fold)] += y
    got = {
        (r.cat, r.fold): (r.n_rows, r.enc)
        for r in registry.QUERIES["target_encode_priority"](spark, SF).collect()
    }
    assert set(got) == set(ncf)
    for (cat, fold), (n_rows, enc) in got.items():
        prior = (s_all - sf_[fold]) / (n_all - nf[fold])
        want = (sc_[cat] - scf[(cat, fold)] + 20.0 * prior) / (
            nc[cat] - ncf[(cat, fold)] + 20.0
        )
        assert n_rows == ncf[(cat, fold)]
        assert enc == pytest.approx(round(want, 6), abs=1e-9)
        assert 0.0 <= enc <= 1.0


def test_conformal_coverage_near_nominal(spark):
    rows = registry.QUERIES["conformal_value_interval"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_cal > 0 and r.n_test > 0
    assert r.qhat >= 0.0
    assert r.n_covered <= r.n_test
    # split-conformal guarantee: coverage concentrates near the nominal
    # 0.9 (finite-sample slack at the sf0.001 fold sizes)
    assert 0.75 <= r.coverage <= 1.0


def test_msprt_always_valid_p_is_monotone(spark):
    """p_n = 1/max Λ is non-increasing by construction, in (0, 1], and
    the day axis covers every distinct arrival day."""
    rows = registry.QUERIES["msprt_ab_sequential"](spark, SF).collect()
    rows.sort(key=lambda r: r.day)
    assert rows
    ps = [r.always_valid_p for r in rows]
    assert all(0.0 < p <= 1.0 for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:])), "p must never increase"
    # cumulative arms are non-decreasing
    for col in ("n_control", "n_treatment"):
        seq = [r[col] for r in rows]
        assert all(a <= b for a, b in zip(seq, seq[1:]))


def test_entropy_ldiversity_consistent_with_count_audit(spark):
    """Same class partition as l_diversity_audit (n_classes per l must
    match), entropy bounded by ln(l), and l=1 classes have H=0."""
    import math as _m

    count_rows = {
        r.l_distinct: r.n_classes
        for r in registry.QUERIES["l_diversity_audit"](spark, SF).collect()
    }
    ent_rows = registry.QUERIES["entropy_l_diversity"](spark, SF).collect()
    assert {r.l_distinct: r.n_classes for r in ent_rows} == count_rows
    for r in ent_rows:
        assert -1e-9 <= r.avg_entropy <= _m.log(r.l_distinct) + 1e-9
        if r.l_distinct == 1:
            assert r.avg_entropy == 0.0


def test_source_loo_impacts_sum_consistent(spark):
    """Σ over sources of (loo mean shift × weight) relates back to the
    overall mean: spot-check each source's delta against a direct
    recompute from collected sums."""
    from depositaja_spark.sources import load_table

    rows = registry.QUERIES["source_loo_impact"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").select("source", "n_chars").collect()
    from collections import defaultdict

    n, c = defaultdict(int), defaultdict(int)
    for d in docs:
        n[d.source] += 1
        c[d.source] += d.n_chars
    n_all, c_all = sum(n.values()), sum(c.values())
    assert {r.source for r in rows} == set(n)
    for r in rows:
        want = (c_all - c[r.source]) / (n_all - n[r.source]) - c_all / n_all
        assert r.loo_delta_chars == pytest.approx(round(want, 6), abs=1e-9)


def test_periodogram_bounds_and_planted_seasonality(spark):
    rows = registry.QUERIES["daily_value_periodogram"](spark, SF).collect()
    assert {r.period for r in rows} == {7, 14, 30}
    for r in rows:
        # a single (cos, sin) pair captures at most all the variance
        # (2/n·|proj|²/var ≤ 1 up to discrete-grid leakage slack)
        assert -1e-6 <= r.variance_frac <= 1.5


def test_snapshot_diff_python_replay(spark):
    """Third-implementation replay: classify every key in pure Python
    from the raw orders rows and compare the full (change_type, mask)
    histogram."""
    from collections import Counter

    from depositaja_spark.queries_gov import _DIFF_INS_SHIFT
    from depositaja_spark.sources import load_table

    rows = (
        load_table(spark, SF, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .collect()
    )
    a = {r.o_orderkey: (r.o_totalprice, r.o_orderstatus) for r in rows}
    b = {}
    for k, (p, s) in a.items():
        if k % 97 == 0:
            continue
        b[k] = (p + 10.0 if k % 31 == 0 else p, "X" if k % 41 == 0 else s)
    for k, (p, s) in a.items():
        if k % 113 == 0:
            b[k + _DIFF_INS_SHIFT] = (p, s)
    want: Counter = Counter()
    for k in set(a) | set(b):
        if k not in a:
            want[("added", "")] += 1
        elif k not in b:
            want[("removed", "")] += 1
        else:
            mask = ",".join(
                name
                for name, ne in (
                    ("o_orderstatus", a[k][1] != b[k][1]),
                    ("o_totalprice", a[k][0] != b[k][0]),
                )
                if ne
            )
            want[("changed" if mask else "unchanged", mask)] += 1
    got = {
        (r.change_type, r.changed_cols): r.n_rows
        for r in registry.QUERIES["snapshot_diff_orders"](spark, SF).collect()
    }
    assert got == dict(want)


def test_generalization_ladder_python_replay(spark):
    """Recompute every record's least-sufficient level in pure Python
    and compare the histogram (monotone class sizes up the ladder make
    the least level well-defined)."""
    from collections import Counter, defaultdict

    from depositaja_spark.sources import load_table

    orders = load_table(spark, SF, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    cust = {
        r.c_custkey: (r.c_nationkey, r.c_mktsegment)
        for r in load_table(spark, SF, "customer").collect()
    }
    recs = []
    for o in orders:
        if o.o_custkey not in cust:
            continue
        n, g = cust[o.o_custkey]
        d = o.o_orderdate
        m = f"{d.year:04d}-{d.month:02d}"
        q = f"{d.year}-Q{(d.month - 1) // 3 + 1}"
        recs.append((n, g, m, q, str(d.year)))
    c0, c1, c2, c3 = (defaultdict(int) for _ in range(4))
    for n, g, m, q, y in recs:
        c0[(n, g, m)] += 1
        c1[(n, g, q)] += 1
        c2[(n, g, y)] += 1
        c3[(n, g)] += 1
    want: Counter = Counter()
    for n, g, m, q, y in recs:
        if c0[(n, g, m)] >= 5:
            lv = 0
        elif c1[(n, g, q)] >= 5:
            lv = 1
        elif c2[(n, g, y)] >= 5:
            lv = 2
        elif c3[(n, g)] >= 5:
            lv = 3
        else:
            lv = 4
        want[lv] += 1
    got = {
        r.gen_level: r.n_records
        for r in registry.QUERIES["qi_generalization_levels"](spark, SF).collect()
    }
    assert got == dict(want)


def test_jw_entity_clusters_pairs_collapse(spark):
    """Every dirty name links to its source, so no vertex stays a
    2-sided singleton pair-wise: cluster sizes are >= 2 for all matched
    names, singletons only for unmatched clean names; total vertices
    tie out."""
    rows = registry.QUERIES["jw_entity_clusters"](spark, SF).collect()
    assert rows
    total_vertices = sum(r.cluster_size * r.n_clusters for r in rows)
    from depositaja_spark.queries_gov import _JW_DIRTY_EXPR, _JW_DIRTY_P
    from depositaja_spark.sources import load_table

    part = load_table(spark, SF, "part")
    clean = part.select(F.col("p_name").alias("c")).where(
        F.length("p_name") >= 4
    ).distinct()
    dirty = (
        clean.select(F.col("c").alias("s"))
        .withColumn("p", F.expr(_JW_DIRTY_P))
        .selectExpr(f"{_JW_DIRTY_EXPR} AS q")
        .distinct()
    )
    n_verts = (
        dirty.select(F.col("q").alias("n"))
        .unionByName(clean.select(F.col("c").alias("n")))
        .distinct()
        .count()
    )
    assert total_vertices == n_verts
    # at least one multi-entity cluster exists (each dirty name matched)
    assert any(r.cluster_size >= 2 for r in rows)


def test_stratified_ate_python_replay(spark):
    """Exact replay of the post-stratification estimator from the raw
    user rows — weights, ATE, and the analytic SE."""
    import math as _m

    from depositaja_spark.functions.text import hash64
    from depositaja_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    users = (
        ev.groupBy(
            "user_id", (hash64(F.col("user_id").cast("string")) % 2).alias("arm")
        )
        .agg(
            F.count(F.lit(1)).alias("ne"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 150), 1
                ).otherwise(0)
            ).alias("conv"),
        )
        .collect()
    )
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n0 c0 n1 c1
    for u in users:
        t = "t1" if u.ne <= 5 else "t2" if u.ne <= 10 else "t3" if u.ne <= 20 else "t4"
        if u.arm == 0:
            agg[t][0] += 1
            agg[t][1] += u.conv
        else:
            agg[t][2] += 1
            agg[t][3] += u.conv
    kept = {t: v for t, v in agg.items() if v[0] > 0 and v[2] > 0}
    nn = sum(v[0] + v[2] for v in kept.values())
    ate = sum(
        ((v[0] + v[2]) / nn) * (v[3] / v[2] - v[1] / v[0]) for v in kept.values()
    )
    se = _m.sqrt(
        sum(
            ((v[0] + v[2]) / nn) ** 2
            * (
                (v[1] / v[0]) * (1 - v[1] / v[0]) / v[0]
                + (v[3] / v[2]) * (1 - v[3] / v[2]) / v[2]
            )
            for v in kept.values()
        )
    )
    row = registry.QUERIES["stratified_ate_conversion"](spark, SF).collect()[0]
    assert row.n_strata == len(kept) and row.n_users == nn
    assert row.ate == pytest.approx(round(ate, 6), abs=1e-9)
    assert row.se == pytest.approx(round(se, 6), abs=1e-9)
