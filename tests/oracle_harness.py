"""Local replica of the driver's oracle-differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value fingerprint (floats rounded, rows sorted).  This is
deliberately a bit stricter than lenient: if it passes here, the driver's
hash compare should pass too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from depositaja_spark.schemas import TEST_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame, float_places: int = 6) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, bool):
            return f"b:{v}"
        if isinstance(v, float):
            if math.isinf(v):
                return f"f:{v}"
            return f"f:{round(v, float_places)!r}"
        if isinstance(v, (int,)):
            return f"i:{v}"
        return f"s:{v}"

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"
    g, w = _normalize(got), _normalize(want)
    if g != w:
        diff = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diff}")
