"""Global plan audit: every registered query's physical plan is checked
for the two patterns that must never appear in a scale-path operator —
unkeyed cartesian joins and row-at-a-time Python UDFs.  Exceptions are
explicit and documented, not discovered in review."""

from __future__ import annotations

import contextlib
import io

import pytest

from depositaja_spark import registry

SF = "/root/testdata/sf0.001"

#: definitionally all-pairs baselines: the brute-force scan IS the
#: product of corpus × (broadcast, 5-row) query set, and the blocked
#: matmul materializes block pairs by design (see SCALING.md)
CARTESIAN_OK = {
    "ann_topk_brute",
    "ann_topk_quantized",
    "embedding_near_dups",
    # the non-banded SimHash pair join is the all-pairs BASELINE kept so
    # the banded scale path can be asserted result-equal to it
    "simhash_near_dups",
    # 1-row broadcast scalar joins (corpus count / thresholds) plan as
    # BroadcastNestedLoopJoin with a single-row build side
    "tfidf_top_terms",
}

#: iterative/driver-coordinated queries whose plan is built per run
#: (k-means, BPE, PQ training) — they run Arrow-batched pandas_udfs,
#: never row-at-a-time, which the check below still enforces
_SLOW_TO_PLAN = {"bpe_merges", "bpe_subword_counts", "ann_topk_pq", "ann_topk_ivfpq"}


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name", sorted(set(registry.QUERIES) - _SLOW_TO_PLAN)
)
def test_no_cartesian_no_rowwise_python(spark, name):
    df = registry.QUERIES[name](spark, SF)
    p = _plan_of(df)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in p, f"{name}: unkeyed cartesian join"
        assert "BroadcastNestedLoop" not in p, f"{name}: nested-loop join"
    # BatchEvalPython = row-at-a-time Python UDF; ArrowEvalPython (pandas
    # UDFs) is the only Python allowed in any plan
    assert "BatchEvalPython" not in p, f"{name}: row-at-a-time Python UDF"
