"""The driver parses bench output out of a ~2000-char stdout tail.

BENCH_r05.json recorded ``parsed: null`` because the per-query dict
outgrew that window; ``bench.compact_line`` now bounds the printed
line. These tests pin the invariant without running Spark.
"""

from __future__ import annotations

import json

from bench import HEADLINE, MAX_LINE_BYTES, compact_line


def _fake_times(n: int) -> dict[str, float]:
    return {f"query_with_a_rather_long_name_{i:03d}": 0.1234 + i * 0.017 for i in range(n)}


def test_line_fits_tail_window_for_huge_registries() -> None:
    for n in (1, 30, 90, 200, 500):
        times = _fake_times(n)
        line = compact_line(times, sum(times.values()), 99.9, 0.1, 80000, None)
        assert len(line) <= MAX_LINE_BYTES, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_total_wall_sec"
        assert parsed["n_queries"] == n
        assert len(parsed["queries"]) + parsed["queries_omitted"] == n


def test_most_expensive_queries_shown_first() -> None:
    times = _fake_times(300)
    parsed = json.loads(compact_line(times, 1.0, 1.0, 0.1, None, None))
    shown = parsed["queries"]
    assert 0 < len(shown) < 300
    cutoff = min(times[k] for k in shown)
    omitted_max = max(v for k, v in times.items() if k not in shown)
    assert cutoff >= omitted_max


def test_current_headline_set_fits() -> None:
    times = {name: 7.7777 for name in HEADLINE}
    err = "SomeException: " + "x" * 400
    line = compact_line(times, sum(times.values()), 123.4, 0.1, None, err)
    assert len(line) <= MAX_LINE_BYTES
    assert len(json.loads(line)["streaming_error"]) <= 120


def test_streaming_trial_spread_recorded() -> None:
    """r8 verdict task 2: the printed line must carry the per-trial
    rows/s so the judge can tell regression from warm-up noise."""
    times = {name: 7.7777 for name in HEADLINE}
    line = compact_line(
        times,
        1.0,
        1.0,
        0.1,
        80000,
        None,
        sink_rps=60000,
        stream_rps_trials=[78000, 80000, 83000],
        sink_rps_trials=[59000, 60000, 61000],
    )
    assert len(line) <= MAX_LINE_BYTES
    parsed = json.loads(line)
    assert parsed["streaming_rows_per_sec_trials"] == [78000, 80000, 83000]
    assert parsed["streaming_sink_rows_per_sec_trials"] == [59000, 60000, 61000]


def test_cpu_contract_fields_present() -> None:
    """r15 verdict task 2: the printed line must state the core count
    the harness was asked to use AND the parallelism the session got,
    so the driver's scaling probe can tell "knob ignored" from
    "constant-bound at this SF" without reading the code."""
    times = {name: 7.7777 for name in HEADLINE}
    line = compact_line(
        times, 1.0, 1.0, 0.1, None, None, cpus=8, default_parallelism=8
    )
    assert len(line) <= MAX_LINE_BYTES
    parsed = json.loads(line)
    assert parsed["cpus"] == 8
    assert parsed["default_parallelism"] == 8


def test_median_helper() -> None:
    from bench import _median

    assert _median([]) == 0.0
    assert _median([3.0]) == 3.0
    assert _median([1.0, 9.0, 2.0]) == 2.0
    assert _median([1.0, 2.0, 3.0, 10.0]) == 2.5
