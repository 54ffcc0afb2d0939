"""Deduplication operators for large-scale training-data pipelines.

Four families, each a first-class oracle-checked query:

* exact       — md5 content hash groupBy (the 100 TB shape: one shuffle on
                the hash, no text comparison).
* n-gram Jaccard — candidate pairs from a shingle equi-join (only docs
                sharing ≥1 shingle ever meet), exact Jaccard verify.
* MinHash+LSH — 16 min-hashes, 4 bands × 4 rows; candidates = band-bucket
                join, then exact-Jaccard verification. The scale path: cost
                is bounded by bucket collisions, not O(n²).
* SimHash     — 32-bit token-majority fingerprint, banded by 4 × 8-bit
                sub-keys, Hamming-distance verify. Same banding trick.

All hashing is the portable md5-based hash64 (operators/portable.py), so
the DuckDB oracle computes bit-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.operators.portable import hash64, hash64_sql, shingles_sql, tokens, word_shingles
from petasearch_spark.sources.tables import load_table

N_HASHES = 16
BAND_ROWS = 4  # 4 bands × 4 rows
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 6
JACCARD_THRESHOLD = 0.5


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical = smallest doc_id per content hash."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("canonical_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY canonical_doc_id
"""


def _distinct_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(word_shingles(tokens(F.col("text")), n)).alias("shingle")
    ).distinct()


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard ≥ 0.5. Candidates come
    from the shingle self-join (no O(n²) scan); Jaccard is exact int
    arithmetic — deterministic across engines."""
    sh = _distinct_shingles(load_table(spark, "documents", sf_dir))
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = F.col("shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_JACCARD_SQL = f"""
WITH {shingles_sql("documents", "doc_id", "text", n=3)}
, cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
, pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 6) AS jaccard
FROM pairs
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE ROUND(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding + exact verify.

    signature_i(doc) = min over shingles of hash64(i || '|' || shingle);
    band key = comma-joined 4 consecutive signature values; candidates share
    any band; survivors verified with exact Jaccard ≥ 0.5.
    """
    docs = load_table(spark, "documents", sf_dir)
    sh = _distinct_shingles(docs)
    seeds = spark.range(N_HASHES).select(F.col("id").cast("int").alias("seed"))
    mh = (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(hash64(F.concat_ws("|", F.col("seed"), F.col("shingle")))).alias("mh"))
    )
    bands = (
        mh.withColumn("band", F.floor(F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"].cast("string")
                ),
            ).alias("band_key")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verify on the (small) candidate set
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        cand.join(sa, "doc_a").join(sb, ["doc_b", "shingle"]).groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = F.col("shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_MINHASH_SQL = f"""
WITH {shingles_sql("documents", "doc_id", "text", n=3)}
, mh AS (
    SELECT doc_id, r.i AS seed, MIN({hash64_sql("r.i::VARCHAR || '|' || shingle")}) AS mh
    FROM sh, range(0, {N_HASHES}) r(i)
    GROUP BY doc_id, r.i
)
, bands AS (
    SELECT doc_id, FLOOR(seed / {BAND_ROWS})::INT AS band,
           string_agg(mh::VARCHAR, ',' ORDER BY seed) AS band_key
    FROM mh GROUP BY doc_id, FLOOR(seed / {BAND_ROWS})::INT
)
, cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
, cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
, shared AS (
    SELECT doc_a, doc_b, COUNT(*) AS shared
    FROM cand
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle
    GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       ROUND(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 6) AS jaccard
FROM shared
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE ROUND(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit majority fingerprint over distinct token
    hashes; candidate pairs share one of four 8-bit sub-keys; verified by
    Hamming distance ≤ 6. bit j of simhash = 1 iff more tokens have bit j
    set than not (strict majority)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok")).distinct()
    th = toks.select("doc_id", hash64(F.col("tok")).alias("h"))
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("j"))
    contrib = (
        th.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "j",
            F.when(F.expr("(h >> j) & 1") == 1, 1).otherwise(-1).alias("c"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("c").alias("s"))
    )
    sim = contrib.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    keyed = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"),
                        F.shiftright(F.col("simhash"), p * 8).bitwiseAND(F.lit(255)).alias("subkey"),
                    )
                    for p in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", F.col("band.p").alias("p"), F.col("band.subkey").alias("subkey"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.subkey") == F.col("b.subkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
    SELECT DISTINCT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
    FROM documents
)
, th AS (SELECT doc_id, {hash64_sql("tok")} AS h FROM toks)
, contrib AS (
    SELECT doc_id, r.j AS j,
           SUM(CASE WHEN (h >> r.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM th, range(0, {SIMHASH_BITS}) r(j)
    GROUP BY doc_id, r.j
)
, sim AS (
    SELECT doc_id,
           SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
    FROM contrib GROUP BY doc_id
)
, keyed AS (
    SELECT doc_id, simhash, r.p AS p, (simhash >> (r.p * 8)) & 255 AS subkey
    FROM sim, range(0, 4) r(p)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM keyed a JOIN keyed b
  ON a.p = b.p AND a.subkey = b.subkey AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""
