"""Session factory invariants (r13): the BLAS thread pin.

Spark schedules one core per task, so a per-task numpy kernel must not
spawn its own thread pool: 32 reused workers × 32 OpenBLAS threads
thrash on small matmuls (the jpeg IDCT's 8×8 gemms ran 6-10× slower
whenever a reused worker carried a live OpenBLAS pool from an earlier
dgemm query — bimodal per JVM, stable within, caught by the r13
extended-bench band).  `get_spark` pins the three standard BLAS env
knobs to "1" BEFORE the JVM launches (workers inherit the JVM env in
local mode) and mirrors them into spark.executorEnv for cluster
executors.
"""

from __future__ import annotations

import os

import pandas as pd

BLAS_KEYS = ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS")


def test_blas_pin_set_in_parent_env(spark):
    # the session fixture went through get_spark, so the parent process
    # env (inherited by the JVM, then by every python worker) is pinned
    for k in BLAS_KEYS:
        assert os.environ.get(k) == "1", k


def test_blas_pin_mirrored_to_executor_env(spark):
    for k in BLAS_KEYS:
        assert spark.conf.get(f"spark.executorEnv.{k}") == "1", k


def test_blas_pin_reaches_python_workers(spark):
    """The pin must be visible INSIDE a python worker (the process that
    actually runs numpy kernels), not just in the driver."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def worker_env(v: pd.Series) -> pd.Series:
        env = ",".join(os.environ.get(k, "MISSING") for k in BLAS_KEYS)
        return pd.Series([env] * len(v))

    df = spark.range(4).select(worker_env("id").alias("env"))
    vals = {r.env for r in df.collect()}
    assert vals == {"1,1,1"}, vals
