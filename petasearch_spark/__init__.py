"""petasearch_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of steineggerlab/petasearch.

The reference engine (C++/Rust, `/root/reference`) is a fixed relational
pipeline for k-mer-prefiltered protein similarity search.  This package
re-expresses every stage Spark-first:

    ingest      -> sources.fasta / sources.tables      (S1-S5 in SURVEY §2.1)
    index build -> operators.kmer_index                (T1 + J2/A2 + O1)
    prefilter   -> operators.prefilter                 (J1 + A1 + F1-F4)
    align       -> operators.align                     (J3 + F5-F8 + UDF 3)
    output      -> sources.m8                          (S8, P6-P7, O6)

plus the generic large-scale data-pipeline surface (dedup, similarity
search, text analysis, multimodal plumbing) under operators/.
"""

from petasearch_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
