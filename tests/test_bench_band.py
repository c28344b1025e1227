"""Variance-band logic of the bench orchestrator (round-12, after
BENCH_r11 shipped a +25% JVM/OS-aging artifact under `idle: true`).
Pure-Python — the subprocess orchestration itself is exercised by the
round's real bench run."""

from __future__ import annotations

import ast
import importlib.util
import os

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_agreeing_pair_found_within_band():
    b = _load_bench()
    assert b._first_agreeing_pair([6.2, 6.5], 0.08) == (0, 1)


def test_disagreeing_pair_rejected():
    b = _load_bench()
    # the r11 failure mode: 6.16 vs 8.16 is +32% — must NOT band
    assert b._first_agreeing_pair([6.163, 8.164], 0.08) is None


def test_third_run_rescues_after_noise_spike():
    b = _load_bench()
    # run 0 cold-true, run 1 aged/contended, run 2 cold-true again:
    # the accepted pair must be (0, 2), skipping the spike
    assert b._first_agreeing_pair([6.2, 8.1, 6.35], 0.08) == (0, 2)


def test_zero_total_never_bands():
    b = _load_bench()
    assert b._first_agreeing_pair([0.0, 0.0], 0.08) is None


def test_band_is_relative_to_smaller_run():
    b = _load_bench()
    # 8% of the SMALLER run: 6.0 vs 6.45 bands (7.5%), 6.0 vs 6.55
    # does not (9.2%) — values chosen clear of the FP boundary
    assert b._first_agreeing_pair([6.0, 6.45], 0.08) == (0, 1)
    assert b._first_agreeing_pair([6.0, 6.55], 0.08) is None


def test_orchestrator_is_the_default_entry():
    """`python bench.py` must run the banded orchestrator; the raw
    measurement body only runs under --child (a driver invoking the
    old single-run path would silently lose the band).  Since r13 both
    entries take the --extended flag (heavy-family tier), so match the
    call prefix, not the exact argless call."""
    tree = ast.parse(open(_BENCH).read())
    guard = [n for n in tree.body if isinstance(n, ast.If)][-1]
    src = ast.unparse(guard)
    assert "--child" in src and "_child_main(" in src and "main(" in src


def test_agreeing_pair_prefers_smallest_confirmed_total():
    b = _load_bench()
    # the real r12 shakedown run: [6.143, 6.797, 6.598] — (0,2) agrees
    # at 7.4% and (1,2) at 3.0%; the pair containing the confirmed MIN
    # must win, not the later pair
    assert b._first_agreeing_pair([6.143, 6.797, 6.598], 0.08) == (0, 2)


def test_steal_discipline_excludes_dirty_runs_from_pairing():
    """r14: two runs inflated by the SAME co-tenant storm can agree
    within the band (the r13 artifact banded 10.868 vs 11.515 with
    5.3 steal-s blocks) — a run whose steal discipline failed must not
    be band-eligible while a clean pair can still form around it."""
    b = _load_bench()
    totals = [10.868, 11.515, 6.5, 6.7]
    clean = [False, False, True, True]
    assert b._first_agreeing_pair(totals, 0.08, eligible=clean) == (2, 3)
    # only dirty runs available: the unrestricted fallback still pairs
    # them (band_ok=False on that path), min-total pair first
    assert b._first_agreeing_pair(totals[:2], 0.08) == (0, 1)


def test_steal_discipline_no_clean_pair():
    b = _load_bench()
    assert (
        b._first_agreeing_pair([6.2, 6.3], 0.08, eligible=[True, False])
        is None
    )
    # legacy children without the flag stay eligible via the caller's
    # .get default — eligible=None keeps the r12 behavior byte-for-byte
    assert b._first_agreeing_pair([6.2, 6.3], 0.08, eligible=None) == (0, 1)
