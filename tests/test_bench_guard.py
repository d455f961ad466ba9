"""Bench regression guard: per-query history vs best, >1.5x fails."""

from __future__ import annotations

import pytest

import bench


def test_best_times_per_sf():
    history = [
        {"sf": 0.1, "queries": {"q1": 2.0, "q2": 5.0}},
        {"sf": 0.1, "queries": {"q1": 1.0, "q2": 6.0}},
        {"sf": 0.01, "queries": {"q1": 0.1}},  # other sf ignored
    ]
    assert bench.best_times(history, 0.1) == {"q1": 1.0, "q2": 5.0}


def test_check_regressions_flags_only_above_factor():
    best = {"q1": 1.0, "q2": 1.0, "q3": 1.0}
    timings = {"q1": 1.4, "q2": 1.6, "q4": 9.9}  # q4 has no baseline
    regs = bench.check_regressions(timings, best, factor=1.5)
    assert set(regs) == {"q2"}
    assert regs["q2"]["ratio"] == pytest.approx(1.6)


def test_recorded_history_has_no_regressions():
    """The real guard: the latest recorded bench run must not regress any
    headline query >1.5x against the best recorded time at its sf."""
    history = bench.load_history()
    if not history:
        pytest.skip("no bench history recorded yet")
    latest = history[-1]
    prior = history[:-1]
    regs = bench.check_regressions(
        latest.get("queries", {}),
        bench.best_times(prior, latest.get("sf")),
    )
    assert not regs, f"bench regressions vs recorded best: {regs}"


def test_min_delta_suppresses_subsecond_jitter():
    """A 2x ratio on a 0.3s query is scheduler noise, not a regression."""
    best = {"tiny": 0.3, "big": 10.0}
    timings = {"tiny": 0.6, "big": 16.0}
    regs = bench.check_regressions(timings, best)
    assert set(regs) == {"big"}
