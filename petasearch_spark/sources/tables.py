"""Parquet table catalog for the driver's synthetic TPC-H-ish star schema
(TESTDATA.md). Mirrors the reference's file-of-paths source idea
(S5, SRAUtil::getFileNamesFromFile, /root/reference/src/commons/SRAUtil.cpp:47-60):
a named set of tables resolved to storage paths."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
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
