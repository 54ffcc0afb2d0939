"""Bench output contract: the driver's capture keeps only the last 2000
bytes and parses the final line, so the emitted JSON must fit — this
failed silently in round 3 (BENCH_r03 parsed: null) when the query list
outgrew the buffer. Fail at test time, not at bench time."""

from __future__ import annotations

import json

import bench


def _encode(values: dict) -> str:
    return json.dumps(
        {
            "metric": "bench_total_seconds",
            "value": 99999.99,
            "unit": "sec",
            "queries": values,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )


def test_bench_json_line_fits_driver_capture():
    # the HARD guarantee: bench.py's final integer fallback must fit the
    # 2000-byte buffer even with every entry in the 1000-9999 s range (a
    # pathological stalled run — the 1-decimal model alone missed this,
    # round-4 review finding)
    fallback = _encode({k: 9999 for k in bench.BENCH_QUERIES})
    assert len(fallback) <= 1990, (
        f"bench JSON line would be {len(fallback)} chars even at integer "
        f"precision; trim BENCH_QUERIES (see bench.py MAX_LINE note)"
    )
    # the common fallback: 1-decimal with every entry at 100+ seconds
    fallback1 = _encode({k: 111.2 for k in bench.BENCH_QUERIES})
    assert len(fallback1) <= 1990
    # the common case: 2-decimal sub-100s entries should not even need
    # the fallback
    typical = _encode({k: 11.23 for k in bench.BENCH_QUERIES})
    assert len(typical) <= bench.MAX_LINE + 69, (
        "typical 2-decimal line is drifting toward the fallback threshold; "
        "consider trimming BENCH_QUERIES"
    )


def test_bench_queries_resolve():
    from petasearch_spark.registry import REGISTRY

    for name in bench.BENCH_QUERIES:
        assert name in bench.BENCH_ONLY or name in REGISTRY, name
