"""Round-11 streaming forensics: run streaming bench entries with a
StreamingQueryListener attached and dump each micro-batch's durationMs
breakdown (addBatch / getBatch / queryPlanning / walCommit / commitOffsets
/ triggerExecution) plus stateOperators metrics — the measure-first step
(guide §1) for the per-batch machinery cost VERDICT r10 item 3 targets.

Usage: python scripts/r11_stream_probe.py events_stream_join ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from petasearch_spark.registry import REGISTRY  # noqa: E402
from petasearch_spark.session import get_spark  # noqa: E402


class ProgressDump(StreamingQueryListener):
    def onQueryStarted(self, event):
        print(f"  stream started: {event.name} at {time.strftime('%H:%M:%S')}", flush=True)

    def onQueryProgress(self, event):
        p = event.progress
        state = [
            {
                "numRowsTotal": s.numRowsTotal,
                "numRowsUpdated": s.numRowsUpdated,
                "commitTimeMs": s.commitTimeMs,
                "memoryUsedBytes": s.memoryUsedBytes,
            }
            for s in p.stateOperators
        ]
        print(
            "  batch %s rows=%s durationMs=%s state=%s"
            % (p.batchId, p.numInputRows, json.dumps(dict(p.durationMs)), json.dumps(state)),
            flush=True,
        )

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11_stream_probe")
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) as s").collect()

    def _warm(batches):
        for pdf in batches:
            yield pdf

    spark.range(1_000).mapInPandas(_warm, schema="id long").count()
    spark.streams.addListener(ProgressDump())
    from bench import BENCH_ONLY

    for name in names:
        fn = BENCH_ONLY[name] if name in BENCH_ONLY else REGISTRY[name][0]
        for rep in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} rep{rep}: build+stream {t1 - t0:.2f}s, "
                f"materialize {t2 - t1:.2f}s, total {t2 - t0:.2f}s",
                flush=True,
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
