"""Full-text keyword retrieval: inverted-index BM25 top-k search.

The reference engine is a similarity search engine over sequence k-mers
(SURVEY §2: extract -> join -> count -> align); BM25 is the text-corpus
analogue of the same funnel — tokenize -> postings join -> score -> top-k —
and is the standard "find the docs about X" query a training-data pipeline
runs constantly (eval-set curation, topic audits, contamination triage).

Plan shape (100 TB): the ONE corpus-sized shuffle builds the posting list
``(term, doc_id, tf, dl)`` — map-side combined groupBy, exactly the k-mer
index build of SURVEY §2.3/T1. Everything query-side is broadcast: the
query-term table (a few rows) prunes the postings with a broadcast
semi-join BEFORE any scoring work, document frequencies for those terms
are a tiny agg, and the final top-k window runs per query over candidate
rows only. Adding queries never re-shuffles the corpus — at deployment
the posting table is the persisted index and each query batch is a
broadcast probe, the same index-once/probe-many economics as the k-mer
table (/root/reference/src/sra/createkmertable.cpp vs
comparekmertables.cpp).

Determinism: tf/df/dl are exact integers; idf uses ln (cross-engine
IEEE-stable, same precedent as tfidf_top_terms); each per-term partial
score is truncated to DECIMAL(28,12) before the per-doc sum so the
reduction is exact integer arithmetic in any partition order (the
unigram_logprob_score pattern); ranking is on the 6-decimal rounded
score with doc_id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.operators.portable import TOKENS_SQL, tokens
from petasearch_spark.sources.tables import load_table

K1 = 1.2
B = 0.75
TOP_K = 10

#: the standing query workload (query_id -> terms). Terms come from the
#: synthetic corpus vocabulary so every query has real matches at every SF.
QUERIES: dict[str, tuple[str, ...]] = {
    "q_spark": ("spark", "join", "window"),
    "q_storage": ("hash", "table", "scan"),
    "q_stream": ("stream", "batch", "merge"),
    "q_filter": ("customer", "filter"),
}


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} BM25 hits per standing query over ``documents``."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    return bm25_rank(docs, QUERIES)


def bm25_rank(
    docs: DataFrame,
    queries: dict[str, tuple[str, ...]],
    top_k: int = TOP_K,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Core of :func:`bm25_search` over a ``(doc_id, text)`` frame
    (separated so constructed corpora can be ranked in tests).

    ``max_df_frac`` is the standard stopword-pruning knob: query terms
    whose document frequency exceeds this fraction of the corpus are
    dropped BEFORE the postings are probed — a term with df ≈ n_docs has
    idf ≈ 0 (no ranking signal) yet makes every document a scoring
    candidate, which is the one way this plan's cost stops being
    output-bounded at 100 TB. None (default) scores every query term —
    the oracle-exact mode the driver gate checks."""
    spark = docs.sparkSession
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    # posting list: one corpus shuffle, map-side combined; dl rides along
    # (functionally dependent on doc_id, so it does not widen the key)
    posting = (
        toks.select("doc_id", F.size("ts").cast("long").alias("dl"), F.explode("ts").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus scalars (2 numbers — the same collect precedent as tfidf's N)
    n_docs, total_tokens = toks.agg(
        F.count(F.lit(1)), F.sum(F.size("ts").cast("long"))
    ).collect()[0]
    avgdl = total_tokens / n_docs  # one IEEE division, mirrored in SQL

    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in queries.items() for t in ts], "query_id string, term string"
    )
    dft = (
        posting.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if max_df_frac is not None:
        # prune saturated terms from the QUERY side, before the postings
        # are probed: the candidate join then never materializes their
        # corpus-sized posting lists
        keep = dft.filter(F.col("df") <= F.lit(max_df_frac) * F.lit(float(n_docs)))
        qterms = qterms.join(keep.select("term"), "term")
        dft = keep
    # broadcast semi-prune: only postings for (kept) query terms are scored
    cand = posting.join(F.broadcast(qterms), "term")
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    denom = F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
    per_term = (idf * (F.col("tf") * F.lit(K1 + 1.0)) / denom).cast("decimal(28,12)")
    scored = (
        cand.join(F.broadcast(dft), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(per_term).cast("double"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .orderBy("query_id", "rk")
    )


_QUERY_VALUES = ", ".join(
    f"('{qid}', '{t}')" for qid, ts in QUERIES.items() for t in ts
)

BM25_SQL = f"""
WITH queries(query_id, term) AS (VALUES {_QUERY_VALUES}),
toks AS (SELECT doc_id, {TOKENS_SQL.format(col="text")} AS ts FROM documents),
posting AS (
    SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS term FROM toks
),
tf AS (
    SELECT doc_id, dl, term, COUNT(*) AS tf FROM posting GROUP BY doc_id, dl, term
),
stats AS (
    SELECT COUNT(*) AS n_docs, CAST(SUM(len(ts)) AS BIGINT) AS total_tokens FROM toks
),
dft AS (
    SELECT term, COUNT(*) AS df FROM tf
    WHERE term IN (SELECT DISTINCT term FROM queries)
    GROUP BY term
),
scored AS (
    SELECT q.query_id, tf.doc_id,
           ROUND(CAST(SUM(CAST(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * {K1 + 1.0})
               / (tf.tf + {K1} * ({1.0 - B} + {B} * (tf.dl / (CAST(s.total_tokens AS DOUBLE) / s.n_docs))))
           AS DECIMAL(28,12))) AS DOUBLE), 6) AS score,
           COUNT(*) AS n_terms_hit
    FROM tf JOIN queries q USING (term) JOIN dft USING (term) CROSS JOIN stats s
    GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, score, n_terms_hit, rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk FROM scored)
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""
