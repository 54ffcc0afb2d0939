"""Interleaved A/B re-time of the round-10 delta-append headline pair:
append(10% delta) vs full rebuild, at 1M sequences. The lifecycle smoke
(round10_delta_append_1m_smoke.py) carries the correctness assertions
but times its phases SEQUENTIALLY — on this burst-class host a moving
throttle window can invert adjacent phases (its first 1M run read
append1 408 s vs rebuild 138 s, physically impossible for strictly less
work), so perf claims re-time interleaved: R A R A (BASELINE.md
round-10 A/B protocol).

    python scripts/round10_delta_ab_retime.py [n_seqs] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from round6_search_1m_smoke import synth  # noqa: E402
from petasearch_spark.operators.kmer_index import (
    append_sharded_layout,
    write_sharded_layout,
)
from petasearch_spark.session import get_spark

NUM_SHARDS = 4096


def main() -> None:
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("round10_delta_ab", shuffle_partitions=64)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, object] = {"n_seqs": n_seqs, "trials": trials}

    grown = os.path.join(tempfile.gettempdir(), f"ps_r10_ab_{os.getpid()}")
    rebuilt = grown + "_rebuilt"
    for d in (grown, rebuilt):
        shutil.rmtree(d, ignore_errors=True)
    try:
        seqs = synth(spark, n_seqs, 62_500).persist()
        seqs.count()
        in_d1 = F.col("seq_id") % 10 == 1
        base, d1 = seqs.filter(~in_d1), seqs.filter(in_d1)
        write_sharded_layout(base, grown, num_shards=NUM_SHARDS)  # untimed

        rebuilds, appends = [], []
        for _ in range(trials):
            shutil.rmtree(rebuilt, ignore_errors=True)
            t0 = time.time()
            write_sharded_layout(seqs, rebuilt, num_shards=NUM_SHARDS)
            rebuilds.append(round(time.time() - t0, 1))
            t0 = time.time()
            gen = append_sharded_layout(spark, grown, d1)
            appends.append(round(time.time() - t0, 1))
            shutil.rmtree(gen)  # restore the base for the next trial
        out["rebuild_s"] = rebuilds
        out["append_10pct_s"] = appends
        out["append_vs_rebuild"] = [
            round(a / r, 3) for a, r in zip(appends, rebuilds)
        ]
    finally:
        for d in (grown, rebuilt):
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
