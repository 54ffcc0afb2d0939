from petasearch_spark.sources.fasta import (
    filter_reads,
    read_fasta,
    read_fastq,
    read_fastq_paired,
    write_fasta,
)
from petasearch_spark.sources.m8 import M8_COLUMNS, read_m8, to_m8, write_m8
from petasearch_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "read_fasta",
    "read_fastq",
    "read_fastq_paired",
    "write_fasta",
    "filter_reads",
    "TABLES",
    "load_table",
    "load_tables",
    "M8_COLUMNS",
    "read_m8",
    "to_m8",
    "write_m8",
]
