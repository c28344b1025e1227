"""Equivalence proof for the r13 sub-assignment folds in
functions/similarity.py: _best_sub / _top_subs must realize EXACTLY the
row_number() window semantics they replaced — (scos desc, sub asc)
ordering, equal-score ties keeping the smaller sub, and Spark's
NaN-greatest comparison order (NaN first) — because both
hard_negative_pairs_ivf2 and semdedup_cells2 derive their bucket
memberships from the winner.

The fixtures engineer the adversarial cases directly: an exact rounded-
cosine tie between two sub-centroids, and a full descending sweep over
negative cosines.  (A zero-norm vector is NOT a case: under Spark 4's
ANSI mode cosine's 0/0 raises DIVIDE_BY_ZERO in the replaced window
plan and the fold alike, so NaN never reaches either ordering.)  The
reference is the literal window plan the folds replaced, built in-test
over the same rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from depositaja_spark.functions.similarity import (
    _best_sub,
    _scored_subs,
    _subcent_arrays,
    _top_subs,
    cosine,
)


@pytest.fixture(scope="module")
def frames(spark):
    # members: (id, vec, cell).  vec 101 ties two sub-centroids exactly
    # (both colinear with it); cell 2 sweeps cosines from -1 through 1
    # so the descending order is exercised across sign.
    members = spark.createDataFrame(
        [
            (101, [1.0, 0.0, 0.0], 1),
            (102, [0.5, 0.5, 0.0], 1),
            (103, [0.0, 1.0, 0.0], 2),
            (104, [0.3, 0.7, 0.1], 2),
        ],
        "id long, vec array<double>, cell int",
    )
    subcent = spark.createDataFrame(
        [
            # cell 1: subs 11 and 12 BOTH have cosine exactly 1.0 with
            # vec 101 (colinear) — the tie must resolve to sub 11
            (1, 11, [2.0, 0.0, 0.0]),
            (1, 12, [3.0, 0.0, 0.0]),
            (1, 13, [0.0, 0.0, 1.0]),
            # cell 2: anti-colinear (cos -1 for vec 103), colinear
            # (cos 1), orthogonal (cos 0) — full descending sweep
            (2, 21, [0.0, -4.0, 0.0]),
            (2, 22, [0.0, 4.0, 0.0]),
            (2, 23, [1.0, 0.0, 0.0]),
        ],
        "cell int, sub long, svec array<double>",
    )
    return members, subcent


def _window_reference(members, subcent, n):
    """The literal plan the folds replaced: broadcast join + scored rows
    + row_number over (scos desc, sub asc), filter rn <= n."""
    scos = F.round(cosine(F.col("vec"), F.col("svec")), 6)
    w = W.partitionBy("id").orderBy(F.desc("scos"), F.asc("sub"))
    return (
        members.join(F.broadcast(subcent), "cell")
        .withColumn("scos", scos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("id", "cell", "sub", "scos", "rn")
    )


def _fold_topn(members, subcent, n):
    subs = _subcent_arrays(subcent)
    return (
        members.join(F.broadcast(subs), "cell")
        .select(
            "id",
            "cell",
            F.explode(_top_subs(_scored_subs(F.col("vec")), n)).alias("ps"),
        )
        .select("id", "cell", F.col("ps.sub").alias("sub"), F.col("ps.scos").alias("scos"))
    )


def test_best_sub_matches_window_rank1(frames):
    members, subcent = frames
    want = {
        (r.id, r.sub, r.scos)
        for r in _window_reference(members, subcent, 1).collect()
    }
    subs = _subcent_arrays(subcent)
    got_df = (
        members.join(F.broadcast(subs), "cell")
        .withColumn("best", _best_sub(_scored_subs(F.col("vec"))))
        .select("id", F.col("best.sub").alias("sub"), F.col("best.scos").alias("scos"))
    )
    got = {(r.id, r.sub, r.scos) for r in got_df.collect()}
    assert got == want
    # the engineered cases actually bit: vec 101's tie resolved to the
    # SMALLER sub (11, not 12), and vec 103 picked its colinear sub (22)
    by_id = {r.id: r.sub for r in got_df.collect()}
    assert by_id[101] == 11
    assert by_id[103] == 22


@pytest.mark.parametrize("n", [1, 2, 3])
def test_top_subs_matches_window_rank_n(frames, n):
    members, subcent = frames
    want = {
        (r.id, r.sub, r.scos)
        for r in _window_reference(members, subcent, n).collect()
    }
    got = {
        (r.id, r.sub, r.scos)
        for r in _fold_topn(members, subcent, n).collect()
    }
    assert got == want


def test_top_subs_order_is_rank_order(frames):
    """_top_subs' array order must equal the window's rank order, not
    just the same set — ivf2 slices the first nprobe2."""
    members, subcent = frames
    ref = _window_reference(members, subcent, 3).collect()
    want = {}
    for r in sorted(ref, key=lambda r: (r.id, r.rn)):
        want.setdefault(r.id, []).append(r.sub)
    subs = _subcent_arrays(subcent)
    got_df = members.join(F.broadcast(subs), "cell").select(
        "id",
        F.transform(
            _top_subs(_scored_subs(F.col("vec")), 3), lambda x: x["sub"]
        ).alias("order"),
    )
    got = {r.id: list(r.order) for r in got_df.collect()}
    assert got == want
