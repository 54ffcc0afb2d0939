"""Custom stateful streaming operators (applyInPandasWithState) +
streaming dedup — the beyond-parity Structured Streaming surface.

Both queries stage the events/documents parquet as a 2-file directory and
run with ``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``, so the
stream executes as (at least) two micro-batches and the state store does
real cross-batch work; a single-batch run would never exercise state
round-trips. Over the full file set the result must equal the batch
answer, which is what the DuckDB oracle checks.

Determinism: per-user money totals are accumulated as integer cents
(floor(value*100 + 0.5) — values are positive 2-decimal amounts), so the
running state is exact and the final doubles are bit-identical to the
oracle's integer arithmetic regardless of row order across batches.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _stage_two_files(spark: SparkSession, src_parquet: str, split_col: str) -> str:
    """Split one parquet file into a 2-file staging dir (micro-batch bait)."""
    stage = tempfile.mkdtemp(prefix="stream2_")
    df = spark.read.parquet(src_parquet)
    for i in range(2):
        df.filter(F.col(split_col) % 2 == i).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stage, f"half{i}")
        )
    flat = tempfile.mkdtemp(prefix="stream2flat_")
    n = 0
    for i in range(2):
        half = os.path.join(stage, f"half{i}")
        for f in sorted(os.listdir(half)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(half, f), os.path.join(flat, f"part{n}.parquet"))
                n += 1
    return flat


def _run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> None:
    spark = stream_df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def events_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user (n_events, total_value) via a custom stateful
    operator: groupBy(user_id).applyInPandasWithState, state = (n, cents).
    Each micro-batch emits the updated running totals; the latest emission
    per user (largest n) is the final answer and must equal the batch
    aggregate."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = _stage_two_files(spark, f"{sf_dir}/events.parquet", "event_id")
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .select("user_id", "value")
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].to_numpy()
            cents += int((v * 100 + 0.5).astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "events_stream_user_totals_sink"
    _run_to_memory(out, name, "update")
    emitted = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
        .orderBy("user_id")
    )


EVENTS_STREAM_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def docs_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates on the content hash across
    micro-batches (state = seen hashes), then per-source distinct-document
    counts. Equals the batch COUNT(DISTINCT md5(text)) per source."""
    stage = _stage_two_files(spark, f"{sf_dir}/documents.parquet", "doc_id")
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .select("source", F.md5("text").alias("content_hash"))
        .dropDuplicates(["source", "content_hash"])
    )
    name = "docs_stream_dedup_sink"
    _run_to_memory(stream, name, "append")
    return (
        spark.table(name)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_unique_docs"))
        .orderBy("source")
    )


DOCS_STREAM_DEDUP_SQL = """
SELECT source, COUNT(DISTINCT md5(text)) AS n_unique_docs
FROM documents GROUP BY source ORDER BY source
"""
