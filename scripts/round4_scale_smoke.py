"""Scale smoke for the round-4 surface: J5 multi-target fan-out reuse and
paired-end FASTQ ingestion at volume.

* multi_target — `search_multi_target` over 3 target splits of the sf0.1
  corpus vs 3 independent `search` calls, in the reference's DEFAULT
  expansion mode (the regime where the shared query k-mer table pays:
  expansion is the expensive target-independent stage). Results must be
  identical and the shared fan-out must be no slower than the
  independent path, which runs FIRST so warm-cache bias works AGAINST
  the claim. In plain exact mode at this SF the persist costs a ~1 s
  constant instead (cache round-trip vs trivially-recomputed
  extraction) — measured and accepted; the persist is the right plan
  once the query batch is large or masking/expansion is on.
* paired_fastq — R1/R2 files of n_reads synthesized reads ingested with
  `read_fastq_paired`: validation passes, every pair_id carries exactly
  two mates, ids are dense/interleaved, and a planted desync (one
  swapped accession) fails loudly.
* ivf_stream — 1000 query vectors streamed in 4 micro-batches against a
  materialized 200k-vector IVF index (foreachBatch + partition-pruned
  probe): the appended results must equal one direct batch probe of the
  same index, and per-batch latency is reported (the real-time
  retrieval SLA quantity).

    python scripts/round4_scale_smoke.py [n_reads] [n_vecs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.operators.doc_search import derived_sequences
from petasearch_spark.plans.search import search, search_multi_target
from petasearch_spark.session import get_spark
from petasearch_spark.sources.fasta import read_fastq_paired
from petasearch_spark.sources.tables import load_table


def main() -> None:
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("round4_scale_smoke")
    out: dict[str, object] = {"n_reads": n_reads, "sf_dir": sf_dir}

    # --- J5 multi-target reuse at sf0.1 -----------------------------------
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    seqs = derived_sequences(docs).drop("source").persist()
    seqs.count()  # materialize once so both paths start from the same cache
    queries = seqs.filter(F.col("seq_id") % 100 == 0)
    targets = [seqs.filter(F.col("seq_id") % 3 == i) for i in range(3)]
    cols = ["query_id", "target_id", "raw", "alnlen", "qstart", "tstart"]
    kw = dict(expand_similar=True)
    # warm code paths (JVM codegen + Python expansion workers) off the clock
    search(queries.limit(3), targets[0], **kw).count()

    t0 = time.time()
    per: list[tuple] = []
    for t in targets:
        per.extend(tuple(r) for r in search(queries, t, **kw).select(*cols).collect())
    out["multi_target_independent_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    multi = sorted(
        tuple(r)
        for r in search_multi_target(queries, targets, **kw).select(*cols).collect()
    )
    out["multi_target_shared_s"] = round(time.time() - t0, 1)

    assert multi == sorted(per) and len(multi) > 0, "fan-out result drift"
    out["multi_target_rows"] = len(multi)
    assert out["multi_target_shared_s"] <= out["multi_target_independent_s"] * 1.05, (
        f"shared-qk fan-out ({out['multi_target_shared_s']} s) slower than independent "
        f"searches ({out['multi_target_independent_s']} s) — reuse regressed"
    )
    spark.catalog.clearCache()

    # --- paired FASTQ at volume -------------------------------------------
    tmp = tempfile.mkdtemp(prefix="r4_smoke_fq_")
    try:
        reads = spark.range(n_reads).select(
            F.concat(F.lit("@r"), F.col("id")).alias("acc_stem"),
            F.substring(
                F.repeat(F.lit("ACDEFGHIKLMNPQRSTVWY"), 5),
                (F.col("id") % 20 + 1).cast("int"),
                60,
            ).alias("seq"),
        )
        for mate in (1, 2):
            lines = reads.select(
                F.concat_ws(
                    "\n",
                    F.concat(F.col("acc_stem"), F.lit(f"/{mate}")),
                    "seq",
                    F.lit("+"),
                    F.repeat(F.lit("I"), F.length("seq")),
                ).alias("value")
            )
            lines.coalesce(1).write.mode("overwrite").text(os.path.join(tmp, f"r{mate}"))
        t0 = time.time()
        paired = read_fastq_paired(
            spark, os.path.join(tmp, "r1"), os.path.join(tmp, "r2")
        ).persist()
        n_rows = paired.count()
        out["paired_ingest_s"] = round(time.time() - t0, 1)
        assert n_rows == 2 * n_reads, n_rows
        per_pair = paired.groupBy("pair_id").agg(
            F.count(F.lit(1)).alias("n"), F.collect_set("mate").alias("mates")
        )
        bad = per_pair.filter((F.col("n") != 2) | (F.size("mates") != 2)).count()
        assert bad == 0, f"{bad} pairs without exactly mates 1+2"
        stats = paired.agg(
            F.min("seq_id").alias("lo"),
            F.max("seq_id").alias("hi"),
            F.countDistinct("seq_id").alias("n_ids"),
        ).collect()[0]
        assert (stats["lo"], stats["hi"], stats["n_ids"]) == (0, 2 * n_reads - 1, 2 * n_reads)

        # planted desync: swap one R2 accession -> must fail loudly
        r2_dir = os.path.join(tmp, "r2")
        part = next(f for f in sorted(os.listdir(r2_dir)) if f.endswith(".txt"))
        p = os.path.join(r2_dir, part)
        with open(p) as fh:
            content = fh.read()
        with open(p, "w") as fh:
            fh.write(content.replace("@r0/2\n", "@rX/2\n", 1))
        crc = os.path.join(r2_dir, f".{part}.crc")
        if os.path.exists(crc):  # stale Hadoop checksum would mask the desync
            os.remove(crc)
        try:
            read_fastq_paired(spark, os.path.join(tmp, "r1"), r2_dir)
            raise AssertionError("desync not detected")
        except ValueError as e:
            assert "stems differ" in str(e)
        out["desync_detected"] = True
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- streaming IVF probe at 200k vectors -------------------------------
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_stream_queries, n_batches, dim, n_cent = 1000, 4, 64, 64
    tmp = tempfile.mkdtemp(prefix="r4_smoke_ivf_")
    try:
        import numpy as np
        import pandas as pd

        from petasearch_spark.operators.ivf import probe_ivf_index, write_ivf_index

        def synth_vecs(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                rows = [
                    np.random.default_rng(int(i)).standard_normal(dim).round(3).tolist()
                    for i in ids
                ]
                yield pd.DataFrame({"vec_id": ids, "v": rows})

        emb = (
            spark.range(n_vecs)
            .repartition(32)
            .mapInPandas(synth_vecs, schema="vec_id long, v array<double>")
        )
        cent_rows = [
            (r["vec_id"], r["v"]) for r in emb.filter(F.col("vec_id") < n_cent).collect()
        ]
        idx = os.path.join(tmp, "ivf_idx")
        t0 = time.time()
        write_ivf_index(emb, idx, cent_rows)
        out["ivf_index_build_s"] = round(time.time() - t0, 1)

        q = emb.filter(F.col("vec_id") < n_stream_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        ).persist()
        qdir = os.path.join(tmp, "qstream")
        os.makedirs(qdir)
        for b in range(n_batches):
            q.filter(F.col("query_id") % n_batches == b).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmp, f"qb{b}"))
            part = next(
                f
                for f in sorted(os.listdir(os.path.join(tmp, f"qb{b}")))
                if f.endswith(".parquet")
            )
            os.symlink(os.path.join(tmp, f"qb{b}", part), os.path.join(qdir, f"b{b}.parquet"))

        sink = os.path.join(tmp, "sink")

        def probe_batch(bdf, bid):
            persisted = []
            probe_ivf_index(
                spark, idx, bdf, cent_rows, _persisted=persisted
            ).write.mode("append").parquet(sink)
            for df in persisted:  # flat storage memory per batch, targeted
                df.unpersist()

        t0 = time.time()
        stream = (
            spark.readStream.schema("query_id long, qv array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(qdir)
        )
        ckpt = os.path.join(tmp, "ckpt")
        sq = (
            stream.writeStream.foreachBatch(probe_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        stream_s = time.time() - t0
        out["ivf_stream_total_s"] = round(stream_s, 1)
        out["ivf_stream_per_batch_s"] = round(stream_s / n_batches, 1)

        streamed = sorted(
            tuple(r) for r in spark.read.parquet(sink).select(
                "query_id", "neighbor_id", "cos", "rk"
            ).collect()
        )
        direct = sorted(
            tuple(r) for r in probe_ivf_index(spark, idx, q, cent_rows).select(
                "query_id", "neighbor_id", "cos", "rk"
            ).collect()
        )
        assert streamed == direct and len(streamed) > 0, "stream/batch probe drift"
        out["ivf_stream_rows"] = len(streamed)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
