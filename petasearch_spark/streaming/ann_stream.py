"""Streaming ANN probe — a stream of query vectors searched against the
STATIC corpus per micro-batch. This is the real-time retrieval shape a
production embedding service runs: the corpus (or its IVF index) is a
fixed table; queries arrive continuously; each micro-batch executes the
same broadcast-join top-k the batch operator uses (`foreachBatch` — the
Structured Streaming idiom for per-batch logic that needs window
functions, which streaming plans cannot host directly).

Equivalence: each query vector arrives in exactly one micro-batch and
per-query top-k needs no cross-query state, so the union of per-batch
results equals the batch answer over all queries — the DuckDB oracle IS
the batch operator's SQL, verbatim.

Scale shape: the per-batch work is one broadcast of the (small) query
batch against the corpus scan; state across batches is zero. Swapping
the brute-force core for `probe_ivf_index` gives the same pattern with
partition-pruned bucket scans.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.operators.similarity import N_QUERIES, _as_double, cosine_topk
from petasearch_spark.sources.tables import load_table

#: output schema of both probes — used to return a TYPED empty frame when
#: the stream produced no sink files (empty corpus / empty query set: a
#: parquet dir with no part files cannot infer a schema)
RESULT_SCHEMA = "query_id long, neighbor_id long, cos double, rk int"


def _read_sink(spark: SparkSession, sink: str) -> DataFrame:
    has_parts = os.path.isdir(sink) and any(
        f.endswith(".parquet") for f in os.listdir(sink)
    )
    if not has_parts:
        return spark.createDataFrame([], RESULT_SCHEMA)
    return spark.read.parquet(sink).orderBy("query_id", "rk")


def ann_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch top-5 cosine search: query vectors (vec_id <
    N_QUERIES) staged as a 2-file parquet stream (maxFilesPerTrigger=1 ->
    >=2 real micro-batches), probed against the static embeddings table,
    results appended to a parquet sink. Output (and oracle) = the batch
    ann_cosine_topk exactly."""
    from petasearch_spark.streaming.stateful import _stage_two_files

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    if not emb.filter(F.col("vec_id") < N_QUERIES).take(1):
        # no query vectors: skip staging + the whole streaming machinery
        # (the empty-table sweep otherwise pays a full stream startup)
        return spark.createDataFrame([], RESULT_SCHEMA)
    q_schema = "query_id long, qv array<double>"
    q_src = os.path.join(
        tempfile.gettempdir(),
        f"ps_ann_qsrc_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    if not os.path.exists(os.path.join(q_src, "_SUCCESS")):
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        ).coalesce(1).write.mode("overwrite").parquet(q_src)
    staged = _stage_two_files(spark, q_src, "query_id")

    # fixed per-SF sink path, cleared per run: repeated gate/bench
    # invocations reuse one location instead of accumulating tempdirs
    import shutil

    sink = os.path.join(
        tempfile.gettempdir(),
        f"ps_ann_stream_sink_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(sink, ignore_errors=True)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        # the SAME core as the batch operator — stream/batch cannot drift
        cosine_topk(batch_df, emb).write.mode("append").parquet(sink)

    stream = (
        spark.readStream.schema(q_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    with tempfile.TemporaryDirectory() as ckpt:
        query = (
            stream.writeStream.foreachBatch(probe_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return _read_sink(spark, sink)


def ann_ivf_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-pruned variant: the corpus is a MATERIALIZED IVF
    index (write_ivf_index — parquet partitioned by bucket), and each
    micro-batch probe reads only its queries' nprobe bucket DIRECTORIES
    (probe_ivf_index's partition pruning). This is the scale path for
    streaming retrieval: per batch, the executor never opens a file
    outside the probed buckets. Output (and oracle) = the batch
    ann_ivf_topk exactly — same frozen coarse quantizer (the first
    N_CENTROIDS vectors), same ranking."""
    import shutil

    from petasearch_spark.operators.ivf import (
        N_CENTROIDS,
        probe_ivf_index,
        write_ivf_index,
    )
    from petasearch_spark.streaming.stateful import _stage_two_files

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    cent_rows = [
        (r["vec_id"], r["v"])
        for r in emb.filter(F.col("vec_id") < N_CENTROIDS).collect()
    ]
    if not cent_rows:
        # empty corpus: no quantizer can exist and write_ivf_index would
        # produce a fileless parquet dir — typed empty answer instead
        return spark.createDataFrame([], RESULT_SCHEMA)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    idx_path = os.path.join(tempfile.gettempdir(), f"ps_ivf_stream_idx_{sf_tag}")
    if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
        write_ivf_index(emb, idx_path, cent_rows)

    q_src = os.path.join(tempfile.gettempdir(), f"ps_ann_qsrc_{sf_tag}")
    if not os.path.exists(os.path.join(q_src, "_SUCCESS")):
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        ).coalesce(1).write.mode("overwrite").parquet(q_src)
    staged = _stage_two_files(spark, q_src, "query_id")

    sink = os.path.join(tempfile.gettempdir(), f"ps_ivf_stream_sink_{sf_tag}")
    shutil.rmtree(sink, ignore_errors=True)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        probe_ivf_index(spark, idx_path, batch_df, cent_rows).write.mode(
            "append"
        ).parquet(sink)

    stream = (
        spark.readStream.schema("query_id long, qv array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    with tempfile.TemporaryDirectory() as ckpt:
        query = (
            stream.writeStream.foreachBatch(probe_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return _read_sink(spark, sink)
