"""Regenerate BENCH_KEYS.json, the committed key map for the short
positional keys bench.py emits (the driver's 2000-byte tail capture
forced key compression — see bench.py's MAX_LINE note). Run after
appending to BENCH_QUERIES; tests/test_bench_contract.py fails if the
committed map drifts from bench.py's derivation."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_KEYS.json")
    with open(out, "w") as f:
        json.dump({k: name for name, k in bench.BENCH_KEYS.items()}, f, indent=1)
        f.write("\n")
    print(f"wrote {os.path.normpath(out)} ({len(bench.BENCH_KEYS)} keys)")


if __name__ == "__main__":
    main()
