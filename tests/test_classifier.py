"""NB log-odds domain classifier: behavioral evidence beyond the oracle.

The oracle (tests/test_oracle.py) pins the arithmetic against DuckDB;
these tests pin the SEMANTICS — that the closed-form weights actually
separate a separable corpus, that unseen tokens are neutral, and that
multiplicity counts (multinomial, not Bernoulli)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions import classifier as clf


def _corpus(spark):
    # perfectly separable: target docs speak only "alpha beta", others
    # only "gamma delta"; "common" appears in both equally
    rows = [
        (1, "alpha beta alpha common", True),
        (2, "beta alpha beta common", True),
        (3, "gamma delta gamma common", False),
        (4, "delta gamma delta common", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_weights_separate_classes(spark):
    docs = _corpus(spark)
    w = {
        r["token"]: r["weight"]
        for r in clf.token_log_odds(docs, F.col("is_t")).collect()
    }
    assert w["alpha"] > 0 and w["beta"] > 0
    assert w["gamma"] < 0 and w["delta"] < 0
    # symmetric corpus → the shared token is exactly neutral
    assert abs(w["common"]) < 1e-12


def test_weights_closed_form(spark):
    """Hand-computed add-1 smoothing on the fixture."""
    docs = _corpus(spark)
    w = {
        r["token"]: (r["n_target"], r["n_other"], r["weight"])
        for r in clf.token_log_odds(docs, F.col("is_t")).collect()
    }
    # totals: 8 target tokens, 8 other tokens, V=5
    nt, no, wt = w["alpha"]
    assert (nt, no) == (3, 0)
    assert wt == pytest.approx(math.log(4 / 13) - math.log(1 / 13), abs=1e-12)


def test_scores_predict_and_unseen_is_neutral(spark):
    docs = _corpus(spark)
    w = clf.token_log_odds(docs, F.col("is_t"))
    # score held-out docs: one per class, plus one of ONLY unseen tokens
    held = spark.createDataFrame(
        [
            (10, "alpha beta"),
            (11, "gamma delta"),
            (12, "zzz qqq"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["score"], r["is_target_pred"])
        for r in clf.score_documents(held, w).collect()
    }
    assert got[10][1] is True and got[10][0] > 0
    assert got[11][1] is False and got[11][0] < 0
    assert got[12][0] == 0.0  # unseen tokens contribute exactly 0


def test_multiplicity_counts(spark):
    docs = _corpus(spark)
    w = clf.token_log_odds(docs, F.col("is_t"))
    held = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha alpha")], "doc_id long, text string"
    )
    s = {r["doc_id"]: r["score"] for r in clf.score_documents(held, w).collect()}
    assert abs(s[2] - 2 * s[1]) < 1e-9


def test_zero_token_doc_scores_prior(spark):
    """r6 advice: a document that tokenizes to zero tokens (NULL text —
    explode emits no rows) must still get a row with score = prior, not
    vanish from the scored output."""
    docs = _corpus(spark)
    w = clf.token_log_odds(docs, F.col("is_t"))
    held = spark.createDataFrame(
        [(1, "alpha"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["score"] for r in
           clf.score_documents(held, w, prior=2.5).collect()}
    assert set(got) == {1, 2}, "no input document may be dropped"
    assert got[2] == 2.5


def test_prior_frame_shifts_scores(spark):
    docs = _corpus(spark)
    w = clf.token_log_odds(docs, F.col("is_t"))
    held = spark.createDataFrame([(12, "zzz")], "doc_id long, text string")
    prior = spark.createDataFrame([(3.5,)], "p double")
    got = clf.score_documents(held, w, prior=prior).collect()[0]
    assert got["score"] == 3.5 and got["is_target_pred"] is True


def test_calibration_deciles_are_separable(spark):
    """The calibration table must show the classifier actually ranks:
    the top decile's true-target fraction exceeds the bottom decile's,
    mean scores strictly decrease with decile, and sizes are balanced."""
    from depositaja_spark.registry import QUERIES

    rows = sorted(
        QUERIES["classifier_calibration"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.decile,
    )
    assert len(rows) == 10
    assert abs(max(r.n for r in rows) - min(r.n for r in rows)) <= 1
    scores = [r.mean_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert rows[0].frac_target > rows[-1].frac_target


def test_kappa_matches_python_replay(spark):
    """labeler_agreement_kappa vs a direct pure-Python Cohen's kappa over
    the same vote table — po, pe, and kappa per LF pair."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.queries_curate import _KAPPA_LFS, q_weak_label_votes
    from depositaja_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    votes = {
        r.doc_id: {lf: r[lf] for lf in _KAPPA_LFS}
        for r in q_weak_label_votes(spark, sf).collect()
    }
    got = {
        (r.lf_a, r.lf_b): (r.po, r.pe, r.kappa)
        for r in QUERIES["labeler_agreement_kappa"](spark, sf).collect()
    }
    release_caches()
    n = len(votes)
    lfs = sorted(_KAPPA_LFS)
    want = {}
    for i, a in enumerate(lfs):
        for b in lfs[i + 1 :]:
            agr = sum(1 for v in votes.values() if v[a] == v[b])
            po = agr / n
            pe = sum(
                (sum(1 for v in votes.values() if v[a] == k) / n)
                * (sum(1 for v in votes.values() if v[b] == k) / n)
                for k in (-1, 0, 1)
            )
            kappa = None if pe >= 1 else round((po - pe) / (1 - pe), 6)
            want[(a, b)] = (round(po, 6), round(pe, 6), kappa)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) <= 1e-6, k
        if want[k][2] is None:
            assert got[k][2] is None, k
        else:
            assert abs(got[k][2] - want[k][2]) <= 2e-6, k


# --- decision stump -------------------------------------------------------------


def _write_stump_events(spark, tmp_path, rows):
    """rows: (event_type, value)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, i * 60, 1, et, v, None) for i, (et, v) in enumerate(rows)],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_gini_stump_perfect_split(spark, tmp_path):
    """Purchases strictly below every non-purchase: the stump lands on
    the largest purchase value, each side is pure, and the gain equals
    the parent impurity exactly."""
    from depositaja_spark.registry import QUERIES

    rows = [("purchase", float(v)) for v in range(1, 21)]       # 1..20
    rows += [("click", float(v)) for v in range(50, 90)]        # 50..89
    d = _write_stump_events(spark, tmp_path, rows)
    (r,) = QUERIES["gini_split_stump"](spark, d).collect()
    assert r.threshold == 20.0
    assert r.n_left == 20 and r.n_purchase_left == 20
    assert r.n_right == 40 and r.n_purchase_right == 0
    tp, tn = 20.0, 60.0
    parent = 1.0 - (tp / tn) ** 2 - ((tn - tp) / tn) ** 2
    assert r.gini_gain == round(parent, 6)


def test_gini_stump_matches_bruteforce_replay(spark):
    """Engine argmax ≡ a python replay that walks every candidate with
    the same fixed-order float score (bit-identical ops, so the float
    argmax and tie-break agree exactly)."""
    from decimal import Decimal

    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    hist: dict = {}
    for r in ev:
        v = Decimal(str(r.value)).quantize(Decimal("0.01"))
        np_, nc = hist.get(v, (0, 0))
        hist[v] = (np_ + (r.event_type == "purchase"), nc + 1)
    tp = sum(a for a, _ in hist.values())
    tn = sum(b for _, b in hist.values())
    best = None
    npl = nl = 0
    for v in sorted(hist):
        np_, nc = hist[v]
        npl, nl = npl + np_, nl + nc
        if nl >= tn:
            continue
        npl_d, nl_d = float(npl), float(nl)
        npr_d, nr_d = float(tp - npl), float(tn - nl)
        s = (npl_d * npl_d + (nl_d - npl_d) * (nl_d - npl_d)) / nl_d + (
            npr_d * npr_d + (nr_d - npr_d) * (nr_d - npr_d)
        ) / nr_d
        if best is None or s > best[0]:
            best = (s, v, npl, nl)
    s, v, npl, nl = best
    tp_d, tn_d = float(tp), float(tn)
    gain = s / tn_d - (tp_d * tp_d + (tn_d - tp_d) * (tn_d - tp_d)) / (tn_d * tn_d)
    (r,) = QUERIES["gini_split_stump"](spark, sf).collect()
    assert r.threshold == float(v)
    assert (r.n_left, r.n_purchase_left) == (nl, npl)
    assert (r.n_right, r.n_purchase_right) == (tn - nl, tp - npl)
    assert r.gini_gain == round(gain, 6)


def test_classifier_auc_matches_pairwise_definition(spark):
    """classifier_auc's midrank formula ≡ the direct definition
    P(score_target > score_rest) + ½P(=), computed pairwise in python
    over the same per-doc scores (which calibration already
    oracle-verifies)."""
    import pyspark.sql.functions as F

    from depositaja_spark.functions import classifier as clf
    from depositaja_spark.queries_ml import _docs, _is_target
    from depositaja_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = _docs(spark, sf)
    t = _is_target()
    w = clf.token_log_odds(docs, t)
    prior = docs.agg(
        F.log(
            F.sum(F.when(t, 1).otherwise(0)).cast("double")
            / F.sum(F.when(t, 0).otherwise(1))
        ).alias("p")
    )
    scored = clf.score_documents(docs, w, prior=prior).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    labels = docs.select("doc_id", F.when(t, 1).otherwise(0).alias("y"))
    rows = scored.join(labels, "doc_id").collect()
    pos = [r.score for r in rows if r.y == 1]
    neg = [r.score for r in rows if r.y == 0]
    wins = sum(1 for a in pos for b in neg if a > b)
    ties = sum(1 for a in pos for b in neg if a == b)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))

    (r,) = QUERIES["classifier_auc"](spark, sf).collect()
    assert r.n_target == len(pos) and r.n_rest == len(neg)
    # engine ships round(auc, 6)
    assert abs(r.auc - auc) < 1e-6
    assert abs(r.somers_d - (2 * auc - 1)) < 2e-6
    assert 0.5 < r.auc <= 1.0  # the classifier does separate its label
