"""Edit-distance join: completeness vs brute force, incl. the short tier.

The oracle (tests/test_oracle.py) pins the registered query against
DuckDB's quadratic levenshtein join; these tests attack the FILTER's
completeness directly — the q-gram overlap bound, the short-string
fallback, and the boundary pairs that cross the two tiers."""

from __future__ import annotations

import pytest

from depositaja_spark.functions.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(vals, k):
    vs = sorted(set(vals))
    return {
        (a, b, _lev(a, b))
        for i, a in enumerate(vs)
        for b in vs[i + 1 :]
        if _lev(a, b) <= k
    }


def _engine(spark, vals, k, q=2):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    return {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, "s", max_dist=k, q=q).collect()
    }


@pytest.mark.parametrize("k", [1, 2])
def test_complete_on_mixed_lengths(spark, k):
    """Short strings (below the q-gram bound), long strings, and
    boundary-crossing pairs — every tier exercised in one corpus."""
    vals = [
        # short tier (len < q*(k+1) for k=2, q=2 → < 6)
        "cat", "bat", "cats", "ca", "dog",
        # boundary: short↔long pairs at distance ≤ k
        "bridge", "ridge", "fridge",
        # long tier with planted typos
        "small ring", "small ringo", "smal ring", "large ring",
        "blue bolt", "glue bolt", "blue bolts",
        # duplicates in the input (distinct-first must collapse them)
        "cat", "small ring",
    ]
    assert _engine(spark, vals, k) == _brute(vals, k)


def test_no_false_positives_far_strings(spark):
    vals = ["abcdefgh", "zyxwvuts", "qqqqqqqq"]
    assert _engine(spark, vals, 2) == set()


def test_identical_strings_not_paired(spark):
    """dist 0 pairs require two DISTINCT equal values — impossible after
    the distinct; equal inputs collapse, so no self-pairs."""
    vals = ["same", "same", "same"]
    assert _engine(spark, vals, 2) == set()


# --- property: completeness on arbitrary small alphabets ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abc", min_size=1, max_size=8)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(_WORD, min_size=2, max_size=12))
def test_property_matches_brute(spark, vals):
    """A 3-letter alphabet with lengths 1..8 concentrates mass around
    the q-gram bound's boundary — exactly where a completeness bug in
    the tier split would hide."""
    assert _engine(spark, vals, 2) == _brute(vals, 2)
