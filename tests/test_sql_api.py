"""SQL surface: registered views answer the same questions as the
DataFrame builders (same Catalyst plans underneath)."""

from __future__ import annotations

from depositaja_spark.sql import register_all

SF = "/root/testdata/sf0.001"


def test_sql_surface_matches_dataframe_api(spark):
    names = register_all(spark, SF)
    assert {"deposits", "balances", "flags", "check_all", "lineitem"} <= set(names)

    got = {
        r.wallet_id: (round(r.balance, 4), r.above_threshold)
        for r in spark.sql("SELECT * FROM check_all").collect()
    }
    from depositaja_spark.plans import check_pipeline
    from depositaja_spark.sources import deposits_from_events, load_table

    want = {
        r.wallet_id: (round(r.balance, 4), r.above_threshold)
        for r in check_pipeline(
            deposits_from_events(load_table(spark, SF, "events"))
        ).collect()
    }
    assert got == want


def test_sql_adhoc_join_over_views(spark):
    """Ad-hoc SQL over engine views composes with base tables."""
    register_all(spark, SF)
    df = spark.sql(
        """
        SELECT b.wallet_id, b.balance, count(*) AS n_events
        FROM balances b
        JOIN accepted_deposits d ON d.wallet_id = b.wallet_id
        GROUP BY b.wallet_id, b.balance
        ORDER BY b.balance DESC
        LIMIT 5
        """
    )
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0].balance >= rows[-1].balance
