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

from petasearch_spark.session import apply_session_defaults


def events_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts/sums computed via readStream ->
    writeStream(availableNow) -> memory sink; returns the final table."""
    apply_session_defaults(spark)  # nanosAsLong + UTC for a foreign session
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file-stream source wants a directory; stage the single parquet
    # file behind a symlink (a real deployment points this at the landing
    # directory new files arrive in).
    stage = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), os.path.join(stage, "events.parquet"))
    from petasearch_spark.sources.tables import normalize_events_ts

    stream = normalize_events_ts(spark.readStream.schema(batch_schema).parquet(stage))
    from petasearch_spark.operators.events import _finite_value

    # day-less law + finite-value law, explicit on BOTH sides (round-7
    # fuzz): F.window silently drops NULL-ts rows, and Spark's
    # double->decimal cast silently NULLs non-finite where DuckDB's CAST
    # errors — the batch events_hourly applies both; the stream twin
    # must not drift from it
    stream = stream.filter(F.col("ts").isNotNull())
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).cast("double").alias("sum_value"),
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
       CAST(SUM(CAST(CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END
                     AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY hour, event_type
"""


JOIN_WINDOW_S = 21600  # 6 h: errors following a purchase by the same user


def events_stream_purchase_error_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INTERVAL JOIN: purchases joined to the same user's
    errors arriving within {JOIN_WINDOW_S} s — the remaining structured-
    streaming operator class after windowed aggregation
    (events_stream_hourly), custom state (events_stream_user_totals) and
    streaming dedup (docs_stream_dedup).

    Both sides are branches of ONE file stream with watermarks; the
    watermark + time-range condition is what lets Spark BOUND the join
    state (a purchase can be evicted once the error-side watermark passes
    ts + window — without it, stream-stream state grows forever at
    100 TB/day). The staging splits the events at the median timestamp
    into TWO files processed as separate micro-batches
    (maxFilesPerTrigger=1), so purchases buffered in batch 0 must be
    matched against errors arriving in batch 1 — cross-batch join state
    is genuinely exercised, and because the split is by time the
    watermark never drops a row, keeping the batch theta-join oracle
    exact. Inner join, append mode, availableNow.
    """
    apply_session_defaults(spark)  # nanosAsLong + UTC for a foreign session
    from petasearch_spark.sources.tables import normalize_events_ts

    batch = normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    mid = batch.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    stage = tempfile.mkdtemp(prefix="events_join_stream_")
    for i, cond in enumerate(
        (F.unix_micros("ts") <= mid, F.unix_micros("ts") > mid)
    ):
        batch.filter(cond).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stage, f"half{i}")
        )
    flat = os.path.join(stage, "flat")
    os.makedirs(flat)
    n = 0
    for i in range(2):  # half0 symlinked first -> older mtime -> batch 0
        half = os.path.join(stage, f"half{i}")
        for f in sorted(os.listdir(half)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(half, f), os.path.join(flat, f"part{n}.parquet"))
                n += 1
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "error_id",
        (F.unix_micros("e_ts") - F.unix_micros("p_ts")).alias("gap_us"),
    )
    name = "events_stream_join_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with tempfile.TemporaryDirectory() as ckpt:
        query = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table(name).orderBy("user_id", "purchase_id", "error_id")


EVENTS_STREAM_JOIN_SQL = f"""
SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
       epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND epoch_us(e.ts) - epoch_us(p.ts) >= 0
 AND epoch_us(e.ts) - epoch_us(p.ts) <= {JOIN_WINDOW_S * 1000000}
ORDER BY p.user_id, purchase_id, error_id
"""
