"""IVF-style approximate nearest-neighbour search — the scale path for
similarity search (operators/similarity.py holds the brute-force baseline).

Classic IVF: partition vectors into buckets by nearest coarse centroid;
a query probes only the `nprobe` nearest buckets. Cost drops from
O(corpus) to O(corpus · nprobe / n_centroids) per query; on a cluster the
bucket assignment is one broadcast join (centroids are tiny) and the
probe is a co-partitioned equi-join on the centroid id — no all-pairs
shuffle anywhere.

Determinism for the oracle: centroids are the first `N_CENTROIDS`
vectors (a real deployment k-means-refines them — an iterative batch job
with the same plan shape), all arithmetic in doubles with sequential
folds, results rounded to 6 decimals; the DuckDB oracle runs the SAME
algorithm, so the (approximate) result sets match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.operators.similarity import _as_double, cosine
from petasearch_spark.sources.tables import load_table

N_CENTROIDS = 16
NPROBE = 4
TOPK = 5
N_QUERIES = 10


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed cosine top-5 for query vectors (vec_id < 10)."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    # bucket assignment: nearest centroid by cosine (broadcast join)
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "cent_id", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("cs")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cs"), "cent_id")
    buckets = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("cent_id").alias("bucket"))
    )
    # queries probe their NPROBE nearest centroids
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qprobe = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "cent_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cs"))
        .withColumn("rn", F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("cs"), "cent_id")))
        .filter(F.col("rn") <= NPROBE)
        .select("query_id", "qv", F.col("cent_id").alias("bucket"))
    )
    # probe only the selected buckets (equi-join on bucket id)
    cand = qprobe.join(buckets, "bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored_c = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    ).distinct()
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored_c.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= TOPK)
        .orderBy("query_id", "rk")
    )


_COS = "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"

ANN_IVF_TOPK_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
, cent AS (SELECT vec_id AS cent_id, v AS cv FROM emb WHERE vec_id < {N_CENTROIDS})
, assign AS (
    SELECT vec_id, v, cent_id AS bucket FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_COS.format(a="e.v", b="c.cv")} DESC, c.cent_id) AS rn
        FROM emb e CROSS JOIN cent c
    ) WHERE rn = 1
)
, q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES})
, qprobe AS (
    SELECT query_id, qv, cent_id AS bucket FROM (
        SELECT q.query_id, q.qv, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_COS.format(a="q.qv", b="c.cv")} DESC, c.cent_id) AS rn
        FROM q CROSS JOIN cent c
    ) WHERE rn <= {NPROBE}
)
, cand AS (
    SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
           {_COS.format(a="p.qv", b="a.v")} AS cos
    FROM qprobe p JOIN assign a ON a.bucket = p.bucket AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos, rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM cand)
WHERE rk <= {TOPK}
ORDER BY query_id, rk
"""
