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


#: m8 column -> Spark type, for the reader (evalue stays STRING: the sink
#: formats it in scientific notation; parse with `.cast("double")` when
#: numeric comparison is needed)
_M8_TYPES = {
    "query": "string",
    "target": "string",
    "fident": "double",
    "alnlen": "int",
    "mismatch": "int",
    "gapopen": "int",
    "qstart": "int",
    "qend": "int",
    "tstart": "int",
    "tend": "int",
    "evalue": "string",
    "bits": "int",
    "qlen": "int",
    "tlen": "int",
}


def read_m8(spark, path: str, with_lengths: bool = False) -> DataFrame:
    """Read m8 TSV back into a DataFrame — the roundtrip partner of
    :func:`write_m8`, and the ingest path for results produced by the
    reference (or any BLAST-compatible tool): downstream dedup/summary
    jobs consume hit tables without re-running the search. Column
    count/order follows the F9 whitelist (12-col default, 14-col
    ``+len``); headerless TSV, any number of files/shards."""
    cols = M8_COLUMNS + (["qlen", "tlen"] if with_lengths else [])
    schema = ", ".join(f"{c} {_M8_TYPES[c]}" for c in cols)
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def swap_alignments(alignments: DataFrame, query_db_residues: int) -> DataFrame:
    """P6 (Matcher::result_t::swapResult,
    /root/reference/lib/mmseqs/src/alignment/Matcher.h:93-115, invoked
    blockalign.cpp:435-440): re-key query<->target, flip I<->D in the
    backtrace, and recompute the e-value against the NEW database side
    (the query set's total residues). A pure projection — no UDF, no
    shuffle. Our pipeline emits query-keyed rows natively; this produces
    the target-keyed view."""
    from petasearch_spark.functions.scoring import evalue_expr

    swaps = {
        "query_id": "target_id", "target_id": "query_id",
        "query_accession": "target_accession", "target_accession": "query_accession",
        "qstart": "tstart", "tstart": "qstart",
        "qend": "tend", "tend": "qend",
        "qlen": "tlen", "tlen": "qlen",
    }
    cols = []
    for name in alignments.columns:
        if name in swaps:
            cols.append(F.col(swaps[name]).alias(name))
        elif name == "backtrace":
            cols.append(F.translate("backtrace", "ID", "DI").alias("backtrace"))
        elif name == "evalue":
            cols.append(
                evalue_expr(F.col("raw"), F.col("tlen"), query_db_residues).alias("evalue")
            )
        else:
            cols.append(F.col(name))
    return alignments.select(*cols)


#: IUPAC nucleotide complement (Orf::iupacReverseComplementTable,
#: /root/reference/lib/mmseqs/src/commons/Orf.cpp:48-53 — note U->A and
#: the self-complementary N/S/W; unmapped bytes print as '.').
_IUPAC_FROM = "ABCDGHKMNRSTUVWYabcdghkmnrstuvwy"
_IUPAC_TO = "TVGHCDMKNYSAABWRtvghcdmknysaabwr"
_COMPLEMENT = dict(zip(_IUPAC_FROM, _IUPAC_TO))


def _gapped(seq: str, start1: int, backtrace: str, gap_op: str, reverse_strand: bool = False) -> str:
    """Replay `backtrace` over `seq` from 1-based `start1`, inserting '-'
    where `gap_op` says this side doesn't consume a residue (P8,
    printAlnSeq /root/reference/src/sra/convertsraalignments.cpp:59-87).

    `reverse_strand` is the converter's minus-strand branch
    (convertsraalignments.cpp:63 + the start>end checks at :404-422): a
    nucleotide alignment whose start exceeds its end walks BACKWARD from
    `start1` and complements every consumed base
    (`Orf::complement(seq[offset - seqPos])`)."""
    out = []
    i = start1 - 1
    step = -1 if reverse_strand else 1
    for op in backtrace:
        if op == gap_op:
            out.append("-")
        else:
            # an inconsistent backtrace/start pair must fail loudly: Python's
            # negative indexing would otherwise wrap to the END of the
            # sequence and emit a plausible-looking corrupt alignment
            # (round-3 ADVICE)
            if i < 0 or i >= len(seq):
                raise ValueError(
                    f"backtrace walks outside the sequence (pos {i}, len {len(seq)}, "
                    f"start1={start1}, reverse={reverse_strand}) — corrupt alignment row"
                )
            c = seq[i]
            out.append(_COMPLEMENT.get(c, ".") if reverse_strand else c)
            i += step
    return "".join(out)


def with_alignment_strings(
    alignments: DataFrame, queries: DataFrame, targets: DataFrame
) -> DataFrame:
    """P8: add `qaln`/`taln` gap-inserted alignment strings. Only joins the
    sequence text back in when these outfmt columns are requested — the
    m8 default never pays for it. Backtrace ops are relative to (query,
    target): M consumes both, I consumes query only (gap in target),
    D consumes target only (gap in query). Minus-strand nucleotide
    alignments (start > end, per side independently — the converter's
    qStartPos>qEndPos / dbStartPos>dbEndPos checks at
    convertsraalignments.cpp:404-422) are emitted reverse-complemented."""
    import pandas as pd

    from pyspark.sql import functions as F

    q = queries.select(F.col("seq_id").alias("query_id"), F.col("sequence").alias("_qseq"))
    t = targets.select(F.col("seq_id").alias("target_id"), F.col("sequence").alias("_tseq"))
    rows = alignments.join(F.broadcast(q), "query_id").join(t, "target_id")
    out_schema = ", ".join(
        [f"{n} {d}" for n, d in alignments.dtypes] + ["qaln string", "taln string"]
    )
    keep = [n for n, _ in alignments.dtypes]

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["qaln"] = [
                _gapped(s, st, bt, "D", reverse_strand=st > en)
                for s, st, en, bt in zip(
                    pdf["_qseq"], pdf["qstart"], pdf["qend"], pdf["backtrace"]
                )
            ]
            pdf["taln"] = [
                _gapped(s, st, bt, "I", reverse_strand=st > en)
                for s, st, en, bt in zip(
                    pdf["_tseq"], pdf["tstart"], pdf["tend"], pdf["backtrace"]
                )
            ]
            yield pdf[keep + ["qaln", "taln"]]

    return rows.mapInPandas(run, schema=out_schema)
