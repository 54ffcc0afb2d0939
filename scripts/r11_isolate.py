"""Round-11 optimization harness: isolate-time bench entries and capture
their formatted plans (spark_optimization_guide §1: measure first, noop
sink, labelled jobs, explain("formatted") per query).

Usage:
    python scripts/r11_isolate.py q1 q2 ...       # time entries, 3 reps
    python scripts/r11_isolate.py --plan q1 ...   # also write plans/r11/<q>_<tag>.txt
    python scripts/r11_isolate.py --tag after ... # plan/report tag (default "before")
    python scripts/r11_isolate.py --reps 5 q1

Timing methodology matches bench.py exactly (noop sink, clearCache between
entries, same session factory) so isolated numbers are comparable to
BENCH_SAMPLE/BENCH_r* per-key values. Reps let warm-vs-cold effects show:
rep 0 includes kernel compile / layout build; min(rep>0) is the steady state.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petasearch_spark import maintenance_bench  # noqa: E402, F401
from petasearch_spark.registry import REGISTRY  # noqa: E402
from petasearch_spark.session import get_spark  # noqa: E402


def _resolve(name: str):
    from bench import BENCH_ONLY

    if name in BENCH_ONLY:
        return BENCH_ONLY[name]
    return REGISTRY[name][0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("r11_isolate")
    # same session warmup as bench.py so rep timings sit on a warm JVM
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) as s").collect()
    spark.read.parquet(os.path.join(args.sf_dir, "region.parquet")).count()

    def _warm(batches):
        for pdf in batches:
            yield pdf

    spark.range(1_000).mapInPandas(_warm, schema="id long").count()

    report = {}
    for name in args.names:
        fn = _resolve(name)
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        report[name] = times
        print(f"{name}: {times}", flush=True)
        if args.plan:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(out, "w") as f:
                f.write(buf.getvalue())
            print(f"  plan -> {out}", flush=True)
            spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"tag": args.tag, "timings": report}))


if __name__ == "__main__":
    main()
