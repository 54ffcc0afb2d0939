"""BLAST-m8 TSV sink (S8) — the reference's final output format
(/root/reference/src/sra/convertsraalignments.cpp:297-311; 12 default
columns, 14-column variant appends qlen/tlen at 458-474; multi-target concat
= petasearch.sh:62-65 -> unionByName before a single write here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default BLAST-TAB columns, order fixed
M8_COLUMNS = [
    "query",
    "target",
    "fident",
    "alnlen",
    "mismatch",
    "gapopen",
    "qstart",
    "qend",
    "tstart",
    "tend",
    "evalue",
    "bits",
]


def to_m8(alignments: DataFrame, with_lengths: bool = False) -> DataFrame:
    """Project an alignments DF (schema per FIXTURES.md §1) to m8 columns.

    `query`/`target` are accessions, not ids
    (convertsraalignments.cpp:236-259 re-joins headers); coordinates are
    already 1-based in the alignments table.
    """
    cols = [
        F.col("query_accession").alias("query"),
        F.col("target_accession").alias("target"),
        F.round("fident", 3).alias("fident"),
        "alnlen",
        "mismatch",
        "gapopen",
        "qstart",
        "qend",
        "tstart",
        "tend",
        F.format_string("%.3E", F.col("evalue")).alias("evalue"),
        F.round("bits").cast("int").alias("bits"),
    ]
    if with_lengths:
        cols += ["qlen", "tlen"]
    return alignments.select(*cols)


def write_m8(alignments: DataFrame, path: str, with_lengths: bool = False) -> None:
    """Write m8 TSV. Spark's per-task files + commit protocol replaces the
    reference's per-thread shards + cat (SRADBWriter merge,
    /root/reference/src/commons/SRADBWriter.cpp:150-176)."""
    to_m8(alignments, with_lengths).write.mode("overwrite").option("sep", "\t").csv(path)
