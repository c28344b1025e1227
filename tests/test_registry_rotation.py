"""Driver-sample priority: the round driver correctness-checks the FIRST
50 registry entries in insertion order, so the registry front-loads an
EXPLICIT, static priority list (never-driver-sampled queries + queries
whose code changed this round).  The order must be deterministic — no
dependence on what artifacts happen to sit in the repo root.
Pure-Python tests — no SparkSession."""

from __future__ import annotations

from depositaja_spark import registry as R


def test_duplicate_registration_fails_loudly():
    """registry.query() must refuse a name collision instead of silently
    overwriting (the round-8 stacked-decorator paste would have dropped
    a query from coverage invisibly — the driver counts names)."""
    import pytest

    assert "valid_deposits" in R.QUERIES
    with pytest.raises(AssertionError, match="duplicate query registration"):

        @R.query("valid_deposits", "SELECT 1 AS x")
        def _clash(spark, sf_dir):  # pragma: no cover
            raise AssertionError("never called")

    # the original registration survives the rejected attempt
    assert R.QUERIES["valid_deposits"].__name__ == "q_valid_deposits"


def test_priority_entries_exist():
    """Every SAMPLE_PRIORITY name refers to a registered query (a typo
    here would silently waste a driver-sample slot)."""
    missing = [n for n in R.SAMPLE_PRIORITY if n not in R.QUERIES]
    assert missing == [], f"unknown names in SAMPLE_PRIORITY: {missing}"


def test_priority_fits_driver_window():
    """The whole priority list must fit inside the driver's 50-entry
    sample window — otherwise its tail silently never gets checked."""
    assert len(R.SAMPLE_PRIORITY) <= 50


def test_registry_front_loads_priority():
    """The first len(SAMPLE_PRIORITY) registry entries are exactly the
    priority list, in its order."""
    names = list(R.QUERIES)
    k = len(R.SAMPLE_PRIORITY)
    assert tuple(names[:k]) == R.SAMPLE_PRIORITY


def test_order_is_deterministic_no_artifact_dependence():
    """Re-deriving the order from scratch gives the same sequence — the
    reorder is a pure function of registration order + the static list
    (regression guard for the removed CORRECTNESS_r*.json import-time
    read)."""
    import importlib
    import sys

    # source-level guard: the module must not read driver artifacts
    src = open(R.__file__).read()
    assert "CORRECTNESS_r" not in src.replace("test_registry", "")
    # filesystem-scanning imports, not the substring (query names like
    # global_sales_opportunity legitimately contain "glob")
    assert "import glob" not in src and "glob.glob" not in src and "glob(" not in src

    # behavioral guard: two fresh imports of the same source produce the
    # identical order (comparing fresh-to-fresh, not fresh-to-startup,
    # so an edit landing mid-suite can't false-fail the determinism
    # claim — determinism is a property of one source state)
    saved = {m: sys.modules.pop(m) for m in list(sys.modules)
             if m.startswith("depositaja_spark")}
    try:
        fresh1 = importlib.import_module("depositaja_spark.registry")
        order1 = (list(fresh1.QUERIES), list(fresh1.ORACLES))
        for m in [m for m in sys.modules if m.startswith("depositaja_spark")]:
            sys.modules.pop(m)
        fresh2 = importlib.import_module("depositaja_spark.registry")
        assert (list(fresh2.QUERIES), list(fresh2.ORACLES)) == order1
    finally:
        for m in [m for m in sys.modules if m.startswith("depositaja_spark")]:
            sys.modules.pop(m)
        sys.modules.update(saved)


def test_oracles_keys_follow_query_order():
    """oracle_sql() iteration must mirror queries() order (the driver
    zips them positionally in some paths)."""
    qnames = [n for n in R.QUERIES if n in R.ORACLES]
    assert list(R.ORACLES) == qnames


def test_round13_changed_queries_are_prioritized():
    """Queries whose implementation changed in round 13 (both bucket
    dgemm kernels extracted + the ivf2 one blocked/vectorized, and the
    multimodal_features float-recovery bound guard) must sit in the
    driver window so the change is re-verified by the external gate,
    not only locally."""
    changed = {
        "hard_negative_pairs_ivf2", "semdedup_cells2",
        "multimodal_features",
    }
    assert changed <= set(list(R.QUERIES)[:50])


def test_round13_changed_queries_lead_the_window():
    """The r13 kernel rewrites lead the window (highest re-verification
    value: a blocked/vectorized dgemm kernel is exactly the kind of
    change a value-hash differential exists to catch), and the
    registry remains fully oracle-backed."""
    assert list(R.QUERIES)[:3] == [
        "hard_negative_pairs_ivf2", "semdedup_cells2",
        "multimodal_features",
    ]
    assert R.NO_ORACLE_OK == set()


def test_max_staleness_bound():
    """Verdict r12 #4: rotation keeps paying — the round-13 window
    contains the entire r5-vintage cohort (32 queries) AND the entire
    r6-vintage cohort (15), so no registered query outside the window
    may have a latest driver sample older than round 7.  Computed from
    the recorded driver artifacts, so a future window edit that
    silently lets the tail age fails here."""
    import glob
    import json
    import re

    latest: dict[str, int] = {}
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    if not latest:  # fresh checkout without artifacts: nothing to pin
        return
    window = set(R.SAMPLE_PRIORITY)
    stale = sorted(
        n for n in R.QUERIES
        if n not in window and latest.get(n, 0) <= 6
    )
    assert stale == [], (
        f"queries outside the window with latest driver sample <= r6: "
        f"{stale} — the round-13 window must hold the r5 AND r6 cohorts"
    )
