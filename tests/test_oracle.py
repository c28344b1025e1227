"""Oracle-differential tests: every registry query vs its DuckDB oracle.

Mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) so regressions are
caught locally before a round ends.  Runs at sf0.001 by default for speed;
set ORACLE_SF_DIR=/root/testdata/sf0.01 to match the driver exactly.
"""

from __future__ import annotations

import os

import pytest

from depositaja_spark import registry
from tests.oracle_harness import compare, duckdb_connection

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_query_matches_oracle(spark, con, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    compare(df, con, registry.ORACLES[name])


def test_every_query_has_oracle_or_is_documented():
    missing = set(registry.QUERIES) - set(registry.ORACLES)
    # queries without oracles must be explicitly whitelisted as
    # non-SQL-expressible (driver falls back to a rows-only check)
    assert missing <= registry.NO_ORACLE_OK, f"undocumented oracle-less queries: {missing}"
