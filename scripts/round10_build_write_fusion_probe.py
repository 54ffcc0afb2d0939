"""Round-10 measurement (VERDICT r9 item 6): does the bucketed index
WRITE pay a second exchange after the J2 aggregation, or does the plan
already reuse the groupBy shuffle? And if there is no second exchange,
what does the write actually cost — and does aligning the aggregation's
shuffle with the bucket count change anything?

Background: build_kmer_index groups by kmer (one hash exchange);
write_kmer_index_bucketed then bucketBy(32, kmer).sortBy(kmer)
.saveAsTable. Hypothesis from the verdict: the two hashes are the same,
so a second layout exchange would be pure waste IF Spark inserted one.

The probe answers three questions at a configurable scale:

1. PLAN: how many Exchange nodes does the CTAS-equivalent physical plan
   carry? (EXPLAIN FORMATTED on a bucketed CTAS over the build query.)
2. TIME: build+write wall-clock as shipped (agg at the session's
   shuffle parallelism) vs with the aggregation repartitioned to
   exactly the bucket count before the write (task == bucket, one file
   per bucket — the fully-fused shape, at the cost of 32-wide
   parallelism in the final stage).
3. LAYOUT: files per bucket each variant produces (multi-file buckets
   make the probe-side bucketed scan read more, smaller files).

    python scripts/round10_build_write_fusion_probe.py [n_seqs]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from round6_search_1m_smoke import synth  # noqa: E402
from petasearch_spark.operators.kmer_index import (
    build_kmer_index,
    write_kmer_index_bucketed,
)
from petasearch_spark.session import get_spark

NUM_BUCKETS = 32


def bucket_file_stats(spark, table: str) -> dict:
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    d = os.path.join(wh, table.lower())
    per_bucket: dict[str, int] = {}
    n_bytes = 0
    for f in os.listdir(d):
        m = re.match(r"part-\d+-.*_(\d{5})(?:\.c\d+)?\.(?:zstd\.)?parquet", f)
        if m:
            per_bucket[m.group(1)] = per_bucket.get(m.group(1), 0) + 1
            n_bytes += os.path.getsize(os.path.join(d, f))
    counts = sorted(per_bucket.values())
    return {
        "n_files": sum(counts),
        "files_per_bucket_max": counts[-1] if counts else 0,
        "mb": round(n_bytes / 1e6, 1),
    }


def main() -> None:
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("round10_fusion_probe", shuffle_partitions=256)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, object] = {"n_seqs": n_seqs, "num_buckets": NUM_BUCKETS}

    seqs = synth(spark, n_seqs, 50_000).persist()
    seqs.count()

    # --- 1. plan shape of the bucketed write over the build query
    build_kmer_index(seqs).createOrReplaceTempView("r10_fusion_src")
    spark.sql("DROP TABLE IF EXISTS r10_fusion_plan_probe")
    plan = spark.sql(
        f"EXPLAIN FORMATTED CREATE TABLE r10_fusion_plan_probe USING parquet "
        f"CLUSTERED BY (kmer) SORTED BY (kmer) INTO {NUM_BUCKETS} BUCKETS "
        f"AS SELECT * FROM r10_fusion_src"
    ).collect()[0][0]
    out["ctas_exchange_nodes"] = plan.count("Exchange")
    out["ctas_sort_nodes"] = plan.count("Sort ")
    sys.stderr.write(plan[:4000] + "\n")

    # --- 2. interleaved A/B/A/B timings (the burst-class host drifts on
    # the scale of one run — back-to-back single timings are not an A/B,
    # BASELINE.md round-8/9 era notes)
    def variant_a():
        write_kmer_index_bucketed(build_kmer_index(seqs), "r10_fusion_a", NUM_BUCKETS)

    def variant_b():
        # explicit repartition to the bucket hash before the write
        # (task == bucket -> exactly one file per bucket, at the cost of
        # a second 192M-row exchange and 32-wide final-stage parallelism)
        write_kmer_index_bucketed(
            build_kmer_index(seqs).repartition(NUM_BUCKETS, "kmer"),
            "r10_fusion_b",
            NUM_BUCKETS,
        )

    for run in range(2):
        for name, fn in (("as_shipped", variant_a), ("aligned", variant_b)):
            t0 = time.time()
            fn()
            out.setdefault(f"{name}_s", []).append(round(time.time() - t0, 1))
    out["as_shipped_layout"] = bucket_file_stats(spark, "r10_fusion_a")
    out["aligned_layout"] = bucket_file_stats(spark, "r10_fusion_b")

    # value identity between the two layouts
    a = spark.table("r10_fusion_a")
    b = spark.table("r10_fusion_b")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    out["identical"] = True

    for t in ("r10_fusion_a", "r10_fusion_b", "r10_fusion_plan_probe"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
