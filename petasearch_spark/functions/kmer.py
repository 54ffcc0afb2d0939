"""k-mer extraction and integer encoding as pure Spark column expressions.

Reference semantics (all citations into /root/reference):

* k-mer = contiguous window of k residues; windows containing an invalid
  residue (``X``) are skipped (src/sra/createkmertable.cpp:108-110,
  src/sra/comparekmertables.cpp:235-237; F1 in SURVEY §2.8).
* Sequences shorter than k yield no k-mers (src/sra/createkmertable.cpp:64-66;
  F2).
* Encoding is base-(alphabet-1) positional: ``kmer = Σ code(c_i)·A^(k-1-i)``
  with A = 20 for amino acids (Indexer::int2index,
  lib/mmseqs/src/prefiltering/Indexer.h:20-118; P4).

Everything here stays JVM-side (whole-stage codegen) — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: canonical 20-letter amino-acid alphabet; code = index in this string.
#: ``X`` (and anything else) is invalid inside a k-mer window.
AMINO_ALPHABET = "ACDEFGHIKLMNPQRSTVWY"


def sanitize_seq(col: Column) -> Column:
    """P1 residue sanitization: drop newlines/``@``, map ``*`` -> ``X``
    (SRAUtil::stripInvalidChars, src/commons/SRAUtil.cpp:18-45)."""
    return F.translate(F.regexp_replace(col, "[\n@]", ""), "*", "X")


def _char_code(ch: Column, alphabet: str) -> Column:
    """0-based index of a single-char column in `alphabet`, JVM-side."""
    return (F.instr(F.lit(alphabet), ch) - 1).cast("long")


def encode_kmer_expr(kmer_str: Column | str, alphabet: str = AMINO_ALPHABET) -> Column:
    """Encode a k-length residue string to its integer k-mer code (P4).

    Positional base-|alphabet| fold, entirely in codegen'd expressions.
    Input must contain only alphabet characters (invalid windows are
    filtered out by :func:`extract_kmers`).
    """
    c = F.col(kmer_str) if isinstance(kmer_str, str) else kmer_str
    a = len(alphabet)
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: acc * a + _char_code(ch, alphabet),
    )


def extract_kmers(
    seq: Column | str,
    k: int = 9,
    alphabet: str = AMINO_ALPHABET,
    with_pos: bool = True,
) -> Column:
    """T1: all valid k-mer windows of `seq` as
    ``array<struct<kmer:bigint, pos:int>>`` (or ``array<bigint>``).

    Windows containing non-alphabet characters are excluded (F1); a
    sequence shorter than k yields an empty array (F2). The caller
    ``explode``s the result. Entirely built-in expressions -> whole-stage
    codegen, no Arrow hop (SURVEY §2.3 T1 mapping).
    """
    s = F.col(seq) if isinstance(seq, str) else seq
    windows = F.when(
        F.length(s) >= k,
        F.transform(
            F.sequence(F.lit(0), F.length(s) - k),
            lambda i: F.struct(s.substr(i + 1, F.lit(k)).alias("w"), i.cast("int").alias("pos")),
        ),
    ).otherwise(F.array().cast("array<struct<w:string,pos:int>>"))

    valid = F.filter(windows, lambda x: x["w"].rlike(f"^[{alphabet}]+$"))
    if with_pos:
        return F.transform(
            valid,
            lambda x: F.struct(
                encode_kmer_expr(x["w"], alphabet).alias("kmer"),
                x["pos"].alias("pos"),
            ),
        )
    return F.transform(valid, lambda x: encode_kmer_expr(x["w"], alphabet))
