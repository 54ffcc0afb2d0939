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
batch against the corpus scan (brute probe) or a partition-pruned scan
of the materialized IVF index's nprobe bucket directories (IVF probe).
State across batches is zero; per-batch caches are released after every
batch so a continuous stream's storage memory stays flat.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.operators.similarity import N_QUERIES, _as_double, cosine_topk
from petasearch_spark.sources.tables import load_table
from petasearch_spark.streaming.stateful import _stage_two_files, source_fingerprint

#: output schema of both probes — used to return a TYPED empty frame when
#: the stream produced no sink files (empty corpus / empty query set: a
#: parquet dir with no part files cannot infer a schema)
RESULT_SCHEMA = "query_id long, neighbor_id long, cos double, rk int"


def _load_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )


def _stage_queries(spark: SparkSession, emb: DataFrame, sf_dir: str) -> str:
    """Stage the query vectors (vec_id < N_QUERIES) as a 2-file parquet
    stream source, cached per source CONTENT (regenerated testdata gets
    a fresh key — round-4 review finding)."""
    fp = source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    q_src = os.path.join(tempfile.gettempdir(), f"ps_ann_qsrc_{fp}")
    if not os.path.exists(os.path.join(q_src, "_SUCCESS")):
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        ).coalesce(1).write.mode("overwrite").parquet(q_src)
    return _stage_two_files(spark, q_src, "query_id")


def _run_foreach_stream(
    spark: SparkSession,
    staged: str,
    sink_tag: str,
    probe_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Drive `staged` as a maxFilesPerTrigger=1 stream, run `probe_fn`
    per micro-batch, append its result to a fixed per-tag sink (cleared
    per run), and return the combined result — a typed empty frame if
    nothing was produced. Per-batch persist() blocks are released after
    each batch write so a continuous stream's cache stays flat."""
    sink = os.path.join(tempfile.gettempdir(), f"ps_ann_stream_sink_{sink_tag}")
    shutil.rmtree(sink, ignore_errors=True)

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        probe_fn(batch_df).write.mode("append").parquet(sink)
        spark.catalog.clearCache()

    stream = (
        spark.readStream.schema("query_id long, qv array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    with tempfile.TemporaryDirectory() as ckpt:
        query = (
            stream.writeStream.foreachBatch(run_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
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
    emb = _load_emb(spark, sf_dir)
    if not emb.filter(F.col("vec_id") < N_QUERIES).take(1):
        # no query vectors: skip staging + the whole streaming machinery
        # (the empty-table sweep otherwise pays a full stream startup)
        return spark.createDataFrame([], RESULT_SCHEMA)
    staged = _stage_queries(spark, emb, sf_dir)
    fp = source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    # the SAME core as the batch operator — stream/batch cannot drift
    return _run_foreach_stream(
        spark, staged, f"brute_{fp}", lambda batch: cosine_topk(batch, emb)
    )


def ann_ivf_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-pruned variant: the corpus is a MATERIALIZED IVF
    index (write_ivf_index — parquet partitioned by bucket), and each
    micro-batch probe reads only its queries' nprobe bucket DIRECTORIES
    (probe_ivf_index's partition pruning). This is the scale path for
    streaming retrieval: per batch, the executor never opens a file
    outside the probed buckets, and the probe's per-batch persist is
    released after the batch write. Output (and oracle) = the batch
    ann_ivf_topk exactly — same frozen coarse quantizer (the first
    N_CENTROIDS vectors), same ranking."""
    from petasearch_spark.operators.ivf import (
        N_CENTROIDS,
        probe_ivf_index,
        write_ivf_index,
    )

    emb = _load_emb(spark, sf_dir)
    cent_rows = [
        (r["vec_id"], r["v"])
        for r in emb.filter(F.col("vec_id") < N_CENTROIDS).collect()
    ]
    if not cent_rows:
        # empty corpus: no quantizer can exist and write_ivf_index would
        # produce a fileless parquet dir — typed empty answer instead
        return spark.createDataFrame([], RESULT_SCHEMA)
    fp = source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    idx_path = os.path.join(tempfile.gettempdir(), f"ps_ivf_stream_idx_{fp}")
    if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
        write_ivf_index(emb, idx_path, cent_rows)
    staged = _stage_queries(spark, emb, sf_dir)
    return _run_foreach_stream(
        spark,
        staged,
        f"ivf_{fp}",
        lambda batch: probe_ivf_index(spark, idx_path, batch, cent_rows),
    )
