"""Corpus curation operators for training-data pipelines: deterministic
stratified sampling (source mixing) and train/eval n-gram decontamination.

Neither exists in the reference (it is a search engine); both are standard
steps between "raw corpus" and "training set" and sit naturally on the same
shingle machinery as the dedup family. Both are fully deterministic (md5
sampling keys, exact n-gram collisions), so they run under the driver's
DuckDB oracle gate like any relational query.

Scale notes (100 TB):
* sampling is a stateless per-row filter on an md5 of the row key — no
  shuffle at all; the per-source rate table is a broadcast of ~#sources
  rows. Filter and projection reach the parquet scan.
* decontamination joins the corpus's distinct shingle hashes against the
  EVAL set's shingles. The eval side (held-out benchmarks) is tiny by
  construction, so the collision join is a broadcast hash join; the only
  shuffle over corpus-sized data is the per-doc distinct / final groupBy,
  both on 8-byte keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.operators.portable import (
    hash64,
    hash64_sql,
    shingle_hashes_sql,
)
from petasearch_spark.sources.tables import load_table

# per-source permille rates: source "srcN" -> 50*(1 + N%10) in [50, 500].
# A real mixing config is a user-supplied table; a derived rate keeps the
# demo self-contained and oracle-checkable.
SAMPLE_SALT = "sample:v1:"

DECON_NGRAM = 8  # contamination n-gram size (13 in the Lee et al. setup;
                 # 8 keeps hits present on the short synthetic docs)
EVAL_MOD = 7     # doc_id % EVAL_MOD == 0 stands in for the held-out set
                 # (chosen so contaminated docs EXIST at every test SF —
                 # an empty result would pass the parity gate vacuously)


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified (per-source) sampling — the "data mixing"
    step of a training pipeline. A doc is kept iff
    ``hash64(salt || doc_id) % 1000 < rate_permille(source)``; the hash is
    md5-based so the SAME docs are selected on any engine and any run, and
    resampling with a new salt is independent of previous draws.

    Returns the kept rows with their source rate and inverse-probability
    weight (for unbiased downstream stats). No shuffle: the whole plan is
    scan -> filter -> project."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    rate = (F.lit(50) * (F.expr("CAST(substring(source, 4) AS INT)") % 10 + 1)).alias(
        "rate_permille"
    )
    key = hash64(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.select("doc_id", "source", "n_chars", rate)
        .filter(key < F.col("rate_permille"))
        .withColumn("weight", F.round(F.lit(1000.0) / F.col("rate_permille"), 6))
        .orderBy("doc_id")
    )


CORPUS_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       50 * (CAST(substr(source, 4) AS INT) % 10 + 1) AS rate_permille,
       ROUND(1000.0 / (50 * (CAST(substr(source, 4) AS INT) % 10 + 1)), 6) AS weight
FROM documents
WHERE {hash64_sql("'" + SAMPLE_SALT + "' || CAST(doc_id AS VARCHAR)")} % 1000
      < 50 * (CAST(substr(source, 4) AS INT) % 10 + 1)
ORDER BY doc_id
"""


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag every TRAIN doc that shares at
    least one distinct word {DECON_NGRAM}-gram with any EVAL doc (exact
    n-gram collision, the Lee/Brown-style membership test). The eval set
    here is ``doc_id % {EVAL_MOD} == 0`` (stand-in for held-out benchmark
    text arriving as its own small table).

    Returns (doc_id, n_collisions = distinct shared n-grams,
    n_eval_docs = distinct eval docs hit), contaminated docs only."""
    from petasearch_spark.operators.dedup import _shingle_hashes

    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    # persisted: the train filter and the (broadcast) eval filter are two
    # branches over the same kernel output
    sh = _shingle_hashes(docs, n=DECON_NGRAM, col="h").persist()
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = sh.filter(~is_eval)
    # the eval side is small by construction -> broadcast, so corpus-side
    # shingles are probed in place instead of shuffled
    ev = F.broadcast(
        sh.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "h")
    )
    return (
        train.join(ev, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_collisions"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


DECONTAMINATE_SQL = f"""
WITH {shingle_hashes_sql("documents", "doc_id", "text", n=DECON_NGRAM, hash_col="h")}
SELECT t.doc_id,
       COUNT(DISTINCT t.h) AS n_collisions,
       COUNT(DISTINCT e.doc_id) AS n_eval_docs
FROM shh t JOIN shh e ON t.h = e.h
WHERE t.doc_id % {EVAL_MOD} <> 0 AND e.doc_id % {EVAL_MOD} = 0
GROUP BY t.doc_id
ORDER BY t.doc_id
"""
