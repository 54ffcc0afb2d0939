"""The petasearch engine semantics expressed over the `documents` table —
the same operator chain as the protein pipeline (T1 -> J2 index -> J1 join ->
A1 HAVING), with word-shingles (and char k-mers) standing in for residue
k-mers. These run under the driver's DuckDB correctness gate, so the core
engine join/index semantics are oracle-verified, not just pytest-verified.

* doc_shingle_index  == build_kmer_index (J2: one representative per key —
  longest doc, ties -> smallest id; /root/reference/src/sra/createkmertable.cpp:142-190)
* doc_prefilter      == comparekmertables (J1 equi-join + A1 HAVING count > θ;
  /root/reference/src/sra/comparekmertables.cpp:473-572, 46-67)
* protein_prefilter  == the same over real k=9 char windows of
  deterministically derived "protein" sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.operators.portable import shingles_sql, tokens, word_shingles
from petasearch_spark.sources.tables import load_table

REQ_MATCHES = 2  # --req-kmer-matches 2, strict > (LocalParameters.h:144)


def _doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """DISTINCT (doc_id, shingle) + doc metadata."""
    return (
        docs.select(
            "doc_id",
            "n_chars",
            "source",
            F.explode(word_shingles(tokens(F.col("text")), n)).alias("shingle"),
        )
        .distinct()
    )


def doc_shingle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 index over word 3-shingles: one row per distinct shingle,
    representative = longest doc (n_chars DESC, doc_id ASC), plus the
    number of docs containing it."""
    sh = _doc_shingles(load_table(spark, "documents", sf_dir, widen_scan=True))
    agg = sh.groupBy("shingle").agg(
        F.max_by(
            F.col("doc_id"), F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("rep_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return agg.orderBy("shingle")


DOC_SHINGLE_INDEX_SQL = f"""
WITH {shingles_sql("documents", "doc_id", "text", n=3, extra_cols="n_chars")}
, ranked AS (
    SELECT shingle, doc_id,
           ROW_NUMBER() OVER (PARTITION BY shingle ORDER BY n_chars DESC, doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY shingle) AS n_docs
    FROM sh
)
SELECT shingle, doc_id AS rep_doc_id, n_docs
FROM ranked WHERE rn = 1
ORDER BY shingle
"""


def doc_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + A1 over shingles: docs from source 'src0' are the queries, the
    J2 index over all OTHER docs is the target; keep pairs sharing
    > REQ_MATCHES distinct shingles. Query side broadcast — identical join
    strategy to the protein prefilter."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    sh = _doc_shingles(docs)
    queries = sh.filter(F.col("source") == "src0").select(F.col("doc_id").alias("query_doc"), "shingle")
    targets = sh.filter(F.col("source") != "src0")
    index = targets.groupBy("shingle").agg(
        F.max_by(F.col("doc_id"), F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))).alias("target_doc")
    )
    pairs = F.broadcast(queries).join(index, "shingle", "inner")
    return (
        pairs.groupBy("query_doc", "target_doc")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .filter(F.col("n_matches") > REQ_MATCHES)
        .orderBy("query_doc", "target_doc")
    )


DOC_PREFILTER_SQL = f"""
WITH {shingles_sql("documents", "doc_id", "text", n=3, extra_cols="n_chars, source")}
, q AS (SELECT doc_id AS query_doc, shingle FROM sh WHERE source = 'src0')
, idx AS (
    SELECT shingle, doc_id AS target_doc
    FROM (SELECT shingle, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY shingle ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM sh WHERE source <> 'src0')
    WHERE rn = 1
)
SELECT query_doc, target_doc, COUNT(*) AS n_matches
FROM q JOIN idx USING (shingle)
GROUP BY query_doc, target_doc
HAVING COUNT(*) > {REQ_MATCHES}
ORDER BY query_doc, target_doc
"""


# ---------------------------------------------------------------------------
# Derived "protein" sequences: deterministic text -> amino-alphabet mapping so
# the real k=9 pipeline can run (and be oracle-checked) on driver tables.
# a..z cycles through the 20-letter alphabet; everything else is dropped.
_FROM = "abcdefghijklmnopqrstuvwxyz"
_TO = "ACDEFGHIKLMNPQRSTVWYACDEFG"


def derived_sequences(docs: DataFrame) -> DataFrame:
    """documents -> sequences(seq_id, accession, header, sequence)."""
    seq = F.regexp_replace(F.translate(F.col("text"), _FROM, _TO), "[^A-Z]", "")
    return docs.select(
        F.col("doc_id").alias("seq_id"),
        F.concat(F.lit("doc"), F.col("doc_id")).alias("accession"),
        F.concat(F.lit("doc"), F.col("doc_id"), F.lit(" "), F.col("source")).alias("header"),
        seq.alias("sequence"),
        "source",
    )


DERIVED_SEQ_SQL = f"""
    seqs AS (
        SELECT doc_id AS seq_id,
               regexp_replace(translate(text, '{_FROM}', '{_TO}'), '[^A-Z]', '', 'g') AS sequence,
               source
        FROM documents
    )
"""


def protein_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real k=9 prefilter (T1+J2+J1+A1) over derived sequences, with
    k-mers as 9-char window STRINGS (portable to SQL; the integer encoding
    of functions/kmer.py is a bijection, so semantics are identical).
    Queries: every 20th doc. Targets: all docs. Matches the reference's
    count>2 HAVING."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    seqs = derived_sequences(docs)
    k = 9
    win = F.when(
        F.length("sequence") >= k,
        F.transform(
            F.sequence(F.lit(0), F.length("sequence") - k),
            lambda i: F.col("sequence").substr(i + 1, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    kmers = seqs.select("seq_id", F.length("sequence").cast("int").alias("seq_len"), F.explode(win).alias("kmer"))
    index = kmers.groupBy("kmer").agg(
        F.max_by(F.col("seq_id"), F.struct(F.col("seq_len"), (-F.col("seq_id")).alias("neg_id"))).alias("target_id")
    )
    qk = kmers.filter(F.col("seq_id") % 20 == 0).select(F.col("seq_id").alias("query_id"), "kmer")
    pairs = F.broadcast(qk).join(index, "kmer", "inner")
    return (
        pairs.groupBy("query_id", "target_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .filter(F.col("n_matches") > REQ_MATCHES)
        .orderBy("query_id", "target_id")
    )


PROTEIN_PREFILTER_SQL = f"""
WITH {DERIVED_SEQ_SQL}
, kmers AS (
    SELECT seq_id, len(sequence) AS seq_len, substr(sequence, i, 9) AS kmer
    FROM seqs, range(1, 8192) r(i)
    WHERE i + 8 <= len(sequence)
)
, idx AS (
    SELECT kmer, seq_id AS target_id
    FROM (SELECT kmer, seq_id,
                 ROW_NUMBER() OVER (PARTITION BY kmer ORDER BY seq_len DESC, seq_id ASC) AS rn
          FROM kmers)
    WHERE rn = 1
)
, qk AS (SELECT seq_id AS query_id, kmer FROM kmers WHERE seq_id % 20 = 0)
SELECT query_id, target_id, COUNT(*) AS n_matches
FROM qk JOIN idx USING (kmer)
GROUP BY query_id, target_id
HAVING COUNT(*) > {REQ_MATCHES}
ORDER BY query_id, target_id
"""


def protein_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine end-to-end on derived sequences: index -> prefilter ->
    banded gapped alignment -> e-value filter. Not SQL-expressible (the
    alignment kernel); the driver records a rows-only check, pytest golden
    tests cover the kernel (tests/test_align.py)."""
    from petasearch_spark.plans.search import search

    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    # the sequences table feeds index build, query k-mer extraction, both
    # alignment fetch joins AND the db-residue count — persist so the
    # regexp derivation runs once (at real scale this table is a parquet
    # ingest artifact, persisted by definition)
    seqs = derived_sequences(docs).drop("source").persist()
    queries = seqs.filter(F.col("seq_id") % 20 == 0)
    res = search(queries, seqs)
    # drop the self-hit-dominated float columns that are stable but bulky
    return res.select(
        "query_id", "target_id", "query_accession", "target_accession",
        "raw", "alnlen", "nident", "mismatch", "gapopen",
        "qstart", "qend", "qlen", "tstart", "tend", "tlen",
    )
