"""Similarity search over the embeddings table (array<float> column).

* ann_cosine_topk — brute-force cosine top-k: the correctness baseline and
  the right plan when the query set is small (queries broadcast, one scan
  of the corpus, per-partition top-k via window). At 100 TB the corpus scan
  parallelizes perfectly; the window is per-query top-k on a tiny joined
  result.
* embedding_neardup — all-pairs cosine ≥ threshold over the (much smaller)
  embedding table, the embedding-space near-dup dedup pass.
* ann_ivf_topk (operators/ivf.py) is the scale path — coarse-quantizer
  bucketed search.

Float determinism: vectors are cast to double BEFORE any arithmetic, the
dot product is a left-to-right fold (F.aggregate — sequential semantics,
same as DuckDB's list functions), and results are rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.sources.tables import load_table

TOPK = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
NEARDUP_COS = 0.95


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold over zip_with products — deterministic."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbours for each query vector (vec_id < 10),
    excluding self. Deterministic ranking: (cos DESC, vec_id ASC) on
    rounded cosine."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = F.broadcast(q).join(emb, F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK)
        .orderBy("query_id", "rk")
    )


ANN_COSINE_TOPK_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
, q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES})
, scored AS (
    SELECT query_id, e.vec_id AS neighbor_id,
           ROUND(list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos
    FROM q JOIN emb e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos, rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM scored)
WHERE rk <= {TOPK}
ORDER BY query_id, rk
"""


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine ≥ 0.95 — embedding-space near-duplicate pairs.
    The embeddings table is orders of magnitude smaller than documents;
    at larger scale swap in the IVF-bucketed variant (operators/ivf.py)."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= NEARDUP_COS)
        .orderBy("id_a", "id_b")
    )


EMBEDDING_NEARDUP_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= {NEARDUP_COS}
ORDER BY id_a, id_b
"""
