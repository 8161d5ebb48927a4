"""The perf-regression gate's comparison logic (benchmarks/suite.py).

The gate's job (VERDICT r2 #7, criterion's regression-tracking role) is to
fail on CODE regressions and not on tunnel weather — this pins the pure
logic: per-field directions (including the ms-unit inversion for latency
benches), and the best-of-N merge the weather guard compares against after
re-measuring a regressed workload.
"""

import importlib.util
import json
import os

import pytest

_SUITE = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "suite.py")


@pytest.fixture(scope="module")
def suite():
    spec = importlib.util.spec_from_file_location("knaster_suite", _SUITE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def baseline_path(tmp_path):
    rows = [
        {"bench": "wrappers_vs_nodes", "config": "c", "value": 18,
         "wrapper_rate": 18},
        {"bench": "edit_latency", "config": "e", "value": 34.0,
         "unit": "ms (cache-hit edit -> audible)", "cache_hit_push_ms": 34.0},
    ]
    p = tmp_path / "base.json"
    p.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return str(p)


def test_weather_dip_recovers_via_best_of(suite, baseline_path):
    recs = [
        {"bench": "wrappers_vs_nodes", "config": "c", "value": 10,
         "wrapper_rate": 10},
        {"bench": "wrappers_vs_nodes", "config": "c", "value": 18,
         "wrapper_rate": 17},
    ]
    assert suite.compare_to_baseline(
        suite._best_records(recs), baseline_path) == []


def test_genuine_drop_still_flags(suite, baseline_path):
    recs = [{"bench": "wrappers_vs_nodes", "config": "c", "value": 14,
             "wrapper_rate": 14}]
    regs = suite.compare_to_baseline(suite._best_records(recs), baseline_path)
    assert len(regs) == 2 and "wrappers_vs_nodes" in regs[0]


def test_latency_value_direction_inverted(suite, baseline_path):
    # lower ms = improvement: must NOT flag
    better = [{"bench": "edit_latency", "config": "e", "value": 20.0,
               "unit": "ms (cache-hit edit -> audible)",
               "cache_hit_push_ms": 20.0}]
    assert suite.compare_to_baseline(better, baseline_path) == []
    # higher ms = regression: must flag both value and cache_hit_push_ms
    worse = [{"bench": "edit_latency", "config": "e", "value": 60.0,
              "unit": "ms (cache-hit edit -> audible)",
              "cache_hit_push_ms": 60.0}]
    assert len(suite.compare_to_baseline(worse, baseline_path)) == 2


def test_best_records_picks_lower_latency(suite):
    recs = [
        {"bench": "edit_latency", "config": "e", "value": 60.0,
         "unit": "ms (cache-hit edit -> audible)"},
        {"bench": "edit_latency", "config": "e", "value": 30.0,
         "unit": "ms (cache-hit edit -> audible)"},
    ]
    assert suite._best_records(recs)[0]["value"] == 30.0


def test_best_records_preserves_order_and_nonnumeric(suite):
    recs = [
        {"bench": "a", "config": None, "value": 1, "unit": "samples/s"},
        {"bench": "b", "config": None, "value": 2, "unit": "samples/s"},
        {"bench": "a", "config": None, "value": 3, "unit": "samples/s"},
    ]
    out = suite._best_records(recs)
    assert [r["bench"] for r in out] == ["a", "b"]
    assert out[0]["value"] == 3


def test_bench_to_fn_covers_every_emitted_bench(suite):
    # every ALL entry must be reachable from the names records emit,
    # so the weather guard can always re-run a regressed workload
    assert set(suite._BENCH_TO_FN.values()) == set(suite.ALL)
