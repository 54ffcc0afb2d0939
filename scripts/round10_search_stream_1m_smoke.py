"""Round-10 streaming-service smoke: a CONTINUOUS stream of query
batches probing the 1M-sequence on-disk sharded layout — the
deployment shape of `protein_search_stream` (a long-lived service
draining query arrivals against a fixed index).

What it records that the one-shot interactive smoke cannot:

* per-micro-batch end-to-end latency across MANY batches (steady-state
  jitter, not a single cold number);
* that the flat-cache contract holds: every frame the cascade persists
  per batch is released after the batch's sink write, so the session's
  persistent-RDD count stays bounded no matter how long the stream
  runs (a leak here would OOM a real service in hours);
* union-over-batches equality against the one-shot cascade on the same
  query set (the exactly-once sink contract under a real
  maxFilesPerTrigger=1 drain).

    python scripts/round10_search_stream_1m_smoke.py [n_seqs] [n_batches]
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
from petasearch_spark.operators.kmer_index import write_sharded_layout
from petasearch_spark.plans.search import search_sharded_layout
from petasearch_spark.session import get_spark
from petasearch_spark.streaming.ann_stream import (
    make_probe_batch_writer,
    read_probe_sink,
)
from petasearch_spark.operators.doc_search import SEARCH_INT_COLS, SEARCH_INT_SCHEMA

NUM_SHARDS = 4096


def main() -> None:
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    q_stride = n_seqs // (2 * n_batches)  # 2 queries per micro-batch
    spark = get_spark("round10_stream_smoke", shuffle_partitions=64)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, object] = {"n_seqs": n_seqs, "n_batches": n_batches}

    work = os.path.join(tempfile.gettempdir(), f"ps_r10_stream_{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    root = os.path.join(work, "layout")
    try:
        seqs = synth(spark, n_seqs, q_stride).persist()
        t0 = time.time()
        write_sharded_layout(seqs, root, num_shards=NUM_SHARDS)
        out["layout_build_s"] = round(time.time() - t0, 1)

        # stage the query set as n_batches parquet files (one per
        # micro-batch arrival)
        queries = seqs.filter(F.col("seq_id") % q_stride == 0)
        q_src = os.path.join(work, "q_src")
        queries.withColumn(
            "b", F.pmod(F.col("seq_id") / q_stride, F.lit(n_batches)).cast("int")
        ).repartition(n_batches, "b").drop("b").write.parquet(q_src)
        nq = queries.count()
        seqs.unpersist()
        spark.catalog.clearCache()

        sink = os.path.join(work, "sink")
        batch_times: list[float] = []
        cache_counts: list[int] = []

        def probe(batch_q, persisted):
            t = time.time()
            res = search_sharded_layout(batch_q, root, persisted=persisted).select(
                *SEARCH_INT_COLS
            )
            batch_times.append(round(time.time() - t, 2))
            return res

        run_batch = make_probe_batch_writer(sink, probe)

        def run_and_track(batch_df, batch_id):
            run_batch(batch_df, batch_id)
            cache_counts.append(spark.sparkContext._jsc.getPersistentRDDs().size())

        stream = (
            spark.readStream.schema(
                "seq_id long, accession string, header string, sequence string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(q_src)
        )
        t0 = time.time()
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                stream.writeStream.foreachBatch(run_and_track)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out["stream_total_s"] = round(time.time() - t0, 1)
        out["per_batch_s"] = batch_times
        out["cache_counts_after_batch"] = cache_counts
        # the flat-cache law: the service's storage memory must not grow
        # with stream length
        assert max(cache_counts) <= 2, f"cache leak across batches: {cache_counts}"

        streamed = read_probe_sink(
            spark, sink, schema=SEARCH_INT_SCHEMA, order_by=("query_id", "target_id")
        )
        got = sorted(tuple(r) for r in streamed.collect())
        one_shot = sorted(
            tuple(r)
            for r in search_sharded_layout(queries, root)
            .select(*SEARCH_INT_COLS)
            .collect()
        )
        assert got == one_shot and got, "stream union drifted from one-shot cascade"
        out["n_queries"] = nq
        out["alignments"] = len(got)
        out["equality"] = "exact"
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
