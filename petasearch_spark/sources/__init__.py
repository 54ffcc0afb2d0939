from petasearch_spark.sources.fasta import read_fasta
from petasearch_spark.sources.tables import TABLES, load_table, load_tables
from petasearch_spark.sources.m8 import M8_COLUMNS, to_m8, write_m8

__all__ = ["read_fasta", "TABLES", "load_table", "load_tables", "M8_COLUMNS", "to_m8", "write_m8"]
