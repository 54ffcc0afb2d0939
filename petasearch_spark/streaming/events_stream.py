"""Structured Streaming surface.

The reference engine is strictly batch (SURVEY §2.10) — this module is part
of the beyond-parity pipeline surface: incremental ingestion of an event
stream with windowed aggregation. The batch twin (operators/events.py
events_hourly) provides the DuckDB oracle: a correct streaming run over the
full file set must produce exactly the batch answer.

Runs with ``Trigger.AvailableNow`` + a memory sink so the result is a
normal DataFrame the driver can collect; in production the same lineage
points at a file/Kafka source and a parquet/Delta sink with checkpointing.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts/sums computed via readStream ->
    writeStream(availableNow) -> memory sink; returns the final table."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file-stream source wants a directory; stage the single parquet
    # file behind a symlink (a real deployment points this at the landing
    # directory new files arrive in).
    stage = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), os.path.join(stage, "events.parquet"))
    from petasearch_spark.sources.tables import normalize_events_ts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = normalize_events_ts(spark.readStream.schema(batch_schema).parquet(stage))
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = "events_stream_hourly_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with tempfile.TemporaryDirectory() as ckpt:
        query = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name).orderBy("hour", "event_type")


EVENTS_STREAM_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""
