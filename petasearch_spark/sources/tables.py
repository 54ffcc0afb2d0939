"""Parquet table catalog for the driver's synthetic TPC-H-ish star schema
(TESTDATA.md). Mirrors the reference's file-of-paths source idea
(S5, SRAUtil::getFileNamesFromFile, /root/reference/src/commons/SRAUtil.cpp:47-60):
a named set of tables resolved to storage paths."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events.ts column to the session TIMESTAMP type.

    events.ts has shipped as TIMESTAMP(NANOS) (Spark's reader rejects it —
    read as raw nanos via spark.sql.legacy.parquet.nanosAsLong, truncate to
    micros) and as timestamp[us] with no timezone (Spark reads
    TIMESTAMP_NTZ, which time-arithmetic builtins like unix_micros reject).
    Shared by the batch loader and the streaming source so the two cannot
    drift. Callers must have set session tz = UTC (see load_table) for the
    NTZ cast to preserve wall-clock values."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _path_bytes(path: str) -> int:
    """Bytes on disk for a parquet file or directory of part files."""
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    return os.path.getsize(path) if os.path.exists(path) else 0


def widen(spark: SparkSession, df: DataFrame, src_bytes: int | None = None) -> DataFrame:
    """Repartition a narrow scan up to cluster parallelism.

    Small parquet files arrive as one or two input splits, which serializes
    any CPU-heavy per-row work (explodes, HOF transforms, pandas UDFs)
    downstream of the scan. At real scale the scan has thousands of splits
    and this is a no-op; the repartition only fires when the source is
    narrower than the cluster.

    The split-count estimate comes from bytes on disk vs
    spark.sql.files.maxPartitionBytes — NOT from df.rdd.getNumPartitions():
    instantiating .rdd converts the whole logical plan to an RDD lineage
    per call (driver-side work that showed up as a per-query regression in
    BENCH_r02), while a stat() is free."""
    target = spark.sparkContext.defaultParallelism
    if src_bytes is None:
        # caller gave no size hint: fall back to the (slower) exact check
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
        return df
    max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b").rstrip("b"))
    est_splits = max(1, src_bytes // max_split)
    if est_splits < target:
        return df.repartition(target)
    return df


def load_table(
    spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR, widen_scan: bool = False
) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # nanosAsLong + UTC: required by the NANOS-timestamp read and the
        # NTZ->TIMESTAMP normalization; applied via the package's single
        # idempotent defaults entry point (the caller may be a foreign
        # session — the driver gate builds its own)
        from petasearch_spark.session import apply_session_defaults

        apply_session_defaults(spark)
        df = normalize_events_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    if widen_scan:
        df = widen(spark, df, src_bytes=_path_bytes(path))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = False) -> dict[str, DataFrame]:
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            # route through load_table so events gets the same ts
            # normalization as every other entry point (ADVICE r2)
            out[name] = load_table(spark, name, sf_dir)
            if register_views:
                out[name].createOrReplaceTempView(name)
    return out
