"""Round-8 regression tests.

Covers the VERDICT r7 items: bench stdout truncation-proofing (#2), the
stdlib AVI video codec (#4), and learned BPE merges (#5).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _simulate_driver_capture(stdout: str, window: int = 2000) -> dict:
    """Replicate the driver's recording: keep the LAST `window` characters
    of stdout (BENCH_r07.json's `tail` field is exactly this), then parse
    the trailing JSON line out of it."""
    tail = stdout[-window:]
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError("no parseable JSON line survived the tail capture")


def test_bench_line_survives_tail_truncation():
    # worst-case median widths: every benched query at a 4-digit-second
    # median with 3 decimals (e.g. 1234.567) — wider than anything real
    timings = {name: 1234.567 for name in bench.BENCH_QUERIES}
    line, detail = bench.format_bench_output(timings, "0.1", 3)
    assert len(line) <= bench.TAIL_CAPTURE_BUDGET
    # simulate: 5k of progress-bar noise before the line, newline after
    stdout = ("\r[Stage 42:>  (0 + 32) / 32]" * 200) + "\n" + line + "\n"
    parsed = _simulate_driver_capture(stdout)
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == round(sum(timings.values()), 3)
    # the sidecar keeps what was moved off stdout
    samples = {name: [1.0, 2.0, 3.0] for name in bench.BENCH_QUERIES}
    _, detail = bench.format_bench_output(timings, "0.1", 3, samples)
    assert set(detail["spread"]) == set(bench.BENCH_QUERIES)


def test_bench_line_budget_guard_fires():
    # a registry grown past the capture window must fail LOUDLY at format
    # time, not silently truncate in the recorded artifact
    timings = {f"query_with_a_rather_long_name_{i:03d}": 1.234 for i in range(80)}
    with pytest.raises(AssertionError, match="tail capture"):
        bench.format_bench_output(timings, "0.1", 3)
