"""Runtime bloom-filter join pruning — the engine-level feature that cuts
the probe-side scan of a selective join before the shuffle.  At 100 TB a
selective dimension filter (p_size = 1 keeps ~2% of part) means 98% of
the lineitem probe rows shuffle only to be dropped at the join; the
injected bloom filter (built from the filtered build side at runtime)
drops them AT THE SCAN.  Locally the size thresholds are lowered to
force injection — on a cluster the defaults trigger it for exactly the
big-probe/selective-build case this models."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from depositaja_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_runtime_filter_prunes_probe_side(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        part = load_table(spark, SF, "part").filter(F.col("p_size") == 1)
        j = li.join(part, li.l_partkey == part.p_partkey)
        p = _plan(j)
        assert "might_contain" in p, "bloom runtime filter not injected"
        # and the filtered result is still correct
        exact = (
            li.join(part.hint("broadcast"), li.l_partkey == part.p_partkey).count()
        )
        assert j.count() == exact
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
