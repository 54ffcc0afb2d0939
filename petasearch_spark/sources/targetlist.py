"""File-of-paths source (SURVEY §2.1 S5).

Reference: `targetlist`/`resultlist` files hold one database path per line
(SRAUtil::getFileNamesFromFile, /root/reference/src/commons/SRAUtil.cpp:47-60,
consumed at src/sra/comparekmertables.cpp:356-365); the workflow fans out one
job per listed DB and concatenates results (petasearch.sh:42-65).

Here a target list resolves to a list of DataFrames (FASTA or parquet,
by extension) that plans.search.search_multi_target unions — Spark's
scheduler replaces the reference's hand-rolled shell-job fan-out and
device round-robin (roundRobinOrder, comparekmertables.cpp:304-335)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from petasearch_spark.sources.fasta import read_fasta, read_fastq


def read_target_list(path: str) -> list[str]:
    """One path per line; blanks and #-comments skipped."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def load_target(spark: SparkSession, path: str) -> DataFrame:
    """Load one target set by extension: .parquet -> sequences table
    as-is; .fq/.fastq (optionally .gz) -> FASTQ; anything else FASTA."""
    if path.endswith(".parquet") or os.path.isdir(path):
        return spark.read.parquet(path)
    base = path.removesuffix(".gz")
    if base.endswith((".fq", ".fastq")):
        return read_fastq(spark, path).drop("quality")
    return read_fasta(spark, path)


def load_target_sets(spark: SparkSession, list_path: str) -> list[DataFrame]:
    return [load_target(spark, p) for p in read_target_list(list_path)]
