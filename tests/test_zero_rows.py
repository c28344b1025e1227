"""Standing zero-row audit (round-9 lesson, automated per the r9 verdict).

A driver MATCH on 0 = 0 rows proves nothing: the r9 survival family was
vacuously green for a full round because its churn frame was empty at
every scale.  This audit runs EVERY registered oracle at the driver's own
sf0.01 and fails if any returns an empty frame — unless the query is in
the explicit, individually-justified ``ZERO_ROW_OK`` allowlist.

The oracle side is sufficient: the driver gate proves engine rows equal
oracle rows for every oracle-backed query, so a non-empty oracle IS a
non-empty engine result (and DuckDB runs the whole registry's SQL in
seconds, where the Spark side takes minutes).  The remaining
NO_ORACLE_OK queries are covered by their own pytest goldens, which
assert concrete non-empty outputs.
"""

from __future__ import annotations

import pytest

import depositaja_spark  # noqa: F401  (registers every query module)
from depositaja_spark import registry
from tests.oracle_harness import duckdb_connection

SF_AUDIT = "/root/testdata/sf0.01"

#: queries allowed to return 0 rows at sf0.01 — each entry must carry the
#: reason it is *legitimately* empty rather than vacuously broken
ZERO_ROW_OK: dict[str, str] = {
    # the reference's own detector constants (detector/detector.go:15-18):
    # 10,000 in a 2-minute window never fires on organic fixture traffic;
    # the predicate is exercised by hot_windows and planted streaming tests
    "above_threshold_windows": "reference 10k threshold unreachable on fixtures",
    # data-dependent: every sf0.01 purchase has value > 0; the reject path
    # is non-empty at sf0.1 and exercised by planted validation tests
    "rejected_deposits": "no non-positive purchase amounts at sf0.01",
    # data-dependent: every sf0.01 customer has at least one order;
    # non-empty at sf0.1
    "customers_without_orders": "all sf0.01 customers ordered",
    # data-dependent: the TPC-H Q22-style filter finds no idle rich
    # customers at sf0.01; non-empty at sf0.1
    "global_sales_opportunity": "filter empty at sf0.01, non-empty at sf0.1",
}


def _oracle_rows(con, sql: str) -> int:
    return con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]


def test_every_oracle_nonempty_at_audit_sf():
    """No oracle may silently return an empty frame at the driver's scale."""
    con = duckdb_connection(SF_AUDIT)
    empty = []
    for name, sql in registry.ORACLES.items():
        if _oracle_rows(con, sql) == 0 and name not in ZERO_ROW_OK:
            empty.append(name)
    assert not empty, (
        f"queries with vacuous 0-row oracles at sf0.01 (a driver MATCH on "
        f"these proves nothing — fix the frame or justify an allowlist "
        f"entry): {empty}"
    )


def test_allowlist_entries_are_actually_empty():
    """Keep ZERO_ROW_OK honest: an entry whose oracle has become non-empty
    is stale documentation and must be pruned."""
    con = duckdb_connection(SF_AUDIT)
    stale = [
        name
        for name in ZERO_ROW_OK
        if name in registry.ORACLES
        and _oracle_rows(con, registry.ORACLES[name]) > 0
    ]
    assert not stale, f"ZERO_ROW_OK entries now non-empty — prune: {stale}"


def test_allowlist_names_are_registered():
    unknown = [n for n in ZERO_ROW_OK if n not in registry.QUERIES]
    assert not unknown, f"ZERO_ROW_OK names not in the registry: {unknown}"


def test_planted_empty_query_fails_the_audit():
    """The audit must actually catch an always-empty oracle: replay the
    check against a planted `WHERE false` query and require the failure."""
    con = duckdb_connection(SF_AUDIT)
    planted = "SELECT 1 AS x WHERE false"
    assert _oracle_rows(con, planted) == 0
    with pytest.raises(AssertionError, match="planted_always_empty"):
        empty = []
        for name, sql in {"planted_always_empty": planted}.items():
            if _oracle_rows(con, sql) == 0 and name not in ZERO_ROW_OK:
                empty.append(name)
        assert not empty, f"queries with vacuous 0-row oracles: {empty}"
