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


def widen(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a narrow scan up to cluster parallelism.

    Small parquet files arrive as one or two input splits, which serializes
    any CPU-heavy per-row work (explodes, HOF transforms, pandas UDFs)
    downstream of the scan. At real scale the scan has thousands of splits
    and this is a no-op; the repartition only fires when the source is
    narrower than the cluster."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(
    spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR, widen_scan: bool = False
) -> DataFrame:
    if widen_scan:
        return widen(spark, load_table(spark, name, sf_dir))
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) (Spark's reader rejects
        # it — read as raw nanos, truncate to micros) and as timestamp[us]
        # with no timezone (Spark reads TIMESTAMP_NTZ, which time-arithmetic
        # builtins like unix_micros reject). Normalize both to the session
        # TIMESTAMP type; session tz is UTC, so the wall-clock values DuckDB
        # sees are preserved and oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = False) -> dict[str, DataFrame]:
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
            if register_views:
                out[name].createOrReplaceTempView(name)
    return out
