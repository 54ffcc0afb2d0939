"""FASTA/FASTQ ingestion (S1 in SURVEY §2.1).

The reference parses FASTA via kseq (KSeqWrapper, used at
/root/reference/src/sra/convert2sradb.cpp:96-110) into (header, sequence)
records with dense integer keys assigned in load order
(/root/reference/src/commons/SRADBReader.cpp:317-319).

Spark-first design: FASTA is a *multi-line* record format, so we cannot use
``spark.read.text`` line-splitting directly. We read whole files split by the
record delimiter using Hadoop's ``textinputformat.record.delimiter`` = "\n>",
which gives one Spark row per FASTA record and scales to any number/size of
files without driver-side parsing. Keys are assigned with a zipWithIndex-free
window over (file, record offset): for stable dense 0-based ids we use
``row_number() - 1`` over the input order (file name, intra-file position).

At 100 TB scale the id-assignment window is the only global operation; it is a
single pass over already-small (header, length) data after the sequence text
is parsed, and the result is written to parquet once at ingest — downstream
stages never re-derive it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.functions.kmer import sanitize_seq


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Parse FASTA file(s) at `path` into
    ``sequences(seq_id BIGINT, accession STRING, header STRING, sequence STRING)``.

    * header = full text after ``>`` on the defline
    * accession = first whitespace-separated token (P3,
      Util::parseFastaHeader used at
      /root/reference/src/sra/convertsraalignments.cpp:239)
    * sequence = concatenated residue lines, sanitized (P1: ``*``->``X``,
      ``@``/newlines stripped)
    * seq_id = dense 0-based, in (file, offset) order — matching the
      reference's load-order keys.
    """
    # One row per FASTA record: delimiter "\n>" splits on record starts.
    conf = {"textinputformat.record.delimiter": "\n>"}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    )
    # (byte_offset, record_text); keep the offset for stable intra-file order.
    records = rdd.map(lambda kv: (kv[0], kv[1]))
    df = spark.createDataFrame(records, "offset long, rec string")
    df = df.filter(F.length(F.trim("rec")) > 0)
    # First record of the first file still carries its leading '>'.
    rec = F.regexp_replace(F.col("rec"), r"^>", "")
    header = F.substring_index(rec, "\n", 1)
    seq_raw = F.expr("substring(rec, instr(rec, '\n') + 1)")
    seq_raw = F.when(F.instr(rec, "\n") > 0, seq_raw).otherwise(F.lit(""))

    parsed = df.select(
        F.col("offset"),
        F.regexp_replace(header, r"^>", "").alias("header"),
        sanitize_seq(F.upper(seq_raw)).alias("sequence"),
    )
    w = Window.orderBy("offset")
    return parsed.select(
        (F.row_number().over(w) - 1).cast("long").alias("seq_id"),
        F.regexp_extract("header", r"^(\S+)", 1).alias("accession"),
        "header",
        "sequence",
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """Parse FASTQ (4-line records: @header / seq / + / quality) into the
    same sequences schema as :func:`read_fasta`, plus a `quality` column.

    Reference parity: kseq reads both formats through one interface
    (KSeqWrapper, /root/reference/src/sra/convert2sradb.cpp:96-110);
    quality strings are carried but unused by the search pipeline.

    FASTQ cannot be split on a '\\n@' delimiter — quality lines may start
    with '@' — so records are rebuilt by LINE INDEX (idx // 4), which is
    exact for well-formed 4-line-per-record files (multi-file inputs:
    every file must itself be well-formed, the standard assumption)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(
        rdd.map(lambda li: (li[1] // 4, int(li[1] % 4), li[0])), "rid long, pos int, line string"
    )
    rec = df.groupBy("rid").agg(
        F.max(F.when(F.col("pos") == 0, F.col("line"))).alias("h"),
        F.max(F.when(F.col("pos") == 1, F.col("line"))).alias("s"),
        F.max(F.when(F.col("pos") == 3, F.col("line"))).alias("q"),
    )
    parsed = rec.filter(F.col("h").startswith("@")).select(
        "rid",
        F.regexp_replace("h", r"^@", "").alias("header"),
        sanitize_seq(F.upper(F.col("s"))).alias("sequence"),
        F.col("q").alias("quality"),
    )
    w = Window.orderBy("rid")
    return parsed.select(
        (F.row_number().over(w) - 1).cast("long").alias("seq_id"),
        F.regexp_extract("header", r"^(\S+)", 1).alias("accession"),
        "header",
        "sequence",
        "quality",
    )


def sequences_from_records(spark: SparkSession, records: list[tuple[str, str]]) -> DataFrame:
    """Build a sequences DF from in-memory (header, sequence) pairs — test
    and small-query convenience; same schema/keys as :func:`read_fasta`."""
    rows = [
        (i, header.split()[0] if header.split() else "", header, seq)
        for i, (header, seq) in enumerate(records)
    ]
    df = spark.createDataFrame(rows, "seq_id long, accession string, header string, sequence string")
    return df.withColumn("sequence", sanitize_seq(F.upper(F.col("sequence"))))
