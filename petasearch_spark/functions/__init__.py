from petasearch_spark.functions.kmer import (
    AMINO_ALPHABET,
    encode_kmer_expr,
    extract_kmers,
)
from petasearch_spark.functions.scoring import (
    BLOSUM62,
    KarlinAltschul,
    bit_score_expr,
    evalue_expr,
)

__all__ = [
    "AMINO_ALPHABET",
    "encode_kmer_expr",
    "extract_kmers",
    "BLOSUM62",
    "KarlinAltschul",
    "bit_score_expr",
    "evalue_expr",
]
