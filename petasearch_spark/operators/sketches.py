"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Engine-native sketches (HyperLogLog `approx_count_distinct`,
`percentile_approx`) are implementation-defined — their estimates differ
across engines and versions, so they can never sit under the value-hash
oracle gate. KMV is the sketch that CAN: hash every element with the
portable md5-based ``hash64`` (uniform on [0, 2^60)), keep the K smallest
distinct values, and estimate

    distinct ≈ (K - 1) * 2^60 / h_K        (Bar-Yossef et al. 2002)

Everything is integer until one final double division, so Spark and
DuckDB agree bit-for-bit — a sketch with an exact oracle.

Scale shape (100 TB): the sketch state per group is K 8-byte integers —
mergeable by "union = K smallest of the union", so partial aggregation
applies everywhere a COUNT(DISTINCT) would need a full shuffle of the
key universe. The reference engine has no sketch surface; this extends
the pipeline family (corpus accounting: vocabulary sizes per shard
without shuffling the vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.operators.portable import TOKENS_SQL, hash64, hash64_sql, tokens
from petasearch_spark.sources.tables import load_table

KMV_K = 64
HASH_SPACE = float(1 << 60)
#: per-doc token bound for the sketch operators, stated ONCE and applied
#: on BOTH engines: the oracle's range(1, N+1) bigram enumeration is
#: finite by construction, so the Spark side slices its token array to
#: the same bound — without this a >8191-token document would shingle
#: fully in Spark but truncate in the oracle (round-5 audit; same
#: pattern as text.BPE_MAX_WORD_LEN)
SKETCH_MAX_TOKENS = 8191


def kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct word-BIGRAM count (the synthetic unigram
    vocabulary is ~30 per source — below K — so the sketch runs on the
    ~670-per-source bigram universe): KMV estimate vs exact distinct count
    and the signed relative error — the accuracy audit a pipeline runs
    before trusting the sketch at scales where exact counting is a
    corpus-wide shuffle.

    One pass builds the distinct (source, token-hash) set; the K-th
    smallest hash per source is a per-group window (at deployment the
    K-minima merge associatively, so this runs as partial aggregation —
    the window form keeps the oracle SQL identical); the exact count
    rides the same distinct set.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    from petasearch_spark.operators.portable import word_shingles

    # token array materialized before the shingle HOF (lambdas are
    # interpreted per element; an inlined tokens() re-splits per probe),
    # and the within-doc dedup is array_distinct — the cluster-wide
    # .distinct() then shuffles only what crosses documents
    th = (
        # N starts need N + 1 tokens: slice to SKETCH_MAX_TOKENS + 1 so the
        # last bigram start equals the oracle's range bound exactly
        docs.select("source", F.slice(tokens(F.col("text")), 1, SKETCH_MAX_TOKENS + 1).alias("ts"))
        .select("source", F.explode(F.array_distinct(word_shingles(F.col("ts"), 2))).alias("t"))
        .select("source", hash64(F.col("t")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    kth = (
        th.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == KMV_K)
        .select("source", F.col("h").alias("h_k"))
    )
    exact = th.groupBy("source").agg(F.count(F.lit(1)).alias("exact_distinct"))
    # a source with fewer than K distinct values has no K-th minimum —
    # standard KMV then IS the exact count (round-5 audit: the old inner
    # join silently DROPPED such sources from the audit in both engines)
    est = F.when(
        F.col("h_k").isNotNull(),
        F.round(F.lit(float(KMV_K - 1)) * (F.lit(HASH_SPACE) / F.col("h_k")), 6),
    ).otherwise(F.col("exact_distinct").cast("double"))
    return (
        exact.join(kth, "source", "left")
        .select(
            "source",
            "exact_distinct",
            est.alias("kmv_estimate"),
            F.round((est - F.col("exact_distinct")) / F.col("exact_distinct"), 6).alias(
                "rel_error"
            ),
        )
        .orderBy("source")
    )


KMV_DISTINCT_SQL = f"""
WITH toks AS (
    SELECT source, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), tok AS (
    SELECT source, t[i] || ' ' || t[i+1] AS t
    FROM (SELECT source, ts AS t FROM toks), range(1, {SKETCH_MAX_TOKENS + 1}) r(i)
    WHERE i + 1 <= len(t)
), th AS (
    SELECT DISTINCT source, {hash64_sql("t")} AS h FROM tok
), kth AS (
    SELECT source, h AS h_k FROM (
        SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM th
    ) WHERE rk = {KMV_K}
), exact AS (
    SELECT source, COUNT(*) AS exact_distinct FROM th GROUP BY source
), est AS (
    SELECT e.source, e.exact_distinct,
           CASE WHEN k.h_k IS NULL THEN CAST(e.exact_distinct AS DOUBLE)
                ELSE ROUND({float(KMV_K - 1)} * ({HASH_SPACE} / k.h_k), 6) END AS kmv_estimate
    FROM exact e LEFT JOIN kth k USING (source)
)
SELECT source, exact_distinct, kmv_estimate,
       ROUND((kmv_estimate - exact_distinct) / exact_distinct, 6) AS rel_error
FROM est
ORDER BY source
"""


CM_DEPTH = 4     # independent hash rows
CM_WIDTH = 512   # counters per row
CM_TOP_K = 20    # heavy hitters audited against the sketch


def cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: estimate the corpus frequency of the top
    {CM_TOP_K} exact unigrams from a {CM_DEPTH}×{CM_WIDTH} Count-Min
    sketch and report the (always non-negative) overestimate — the
    accuracy audit run before trusting CM point queries at scales where
    per-term exact counts are a vocabulary-wide shuffle.

    Determinism: CM counters are SUMS over a fixed bucket assignment
    (bucket = md5-hash64 of "d:term" mod width) — order-independent and
    engine-independent, unlike engine-native frequent-item sketches
    whose state depends on arrival order. So the whole query sits under
    the DuckDB value-hash oracle.

    Scale shape (100 TB): counters derive from the (term, count) table —
    already one shuffle that any term-stat query pays — then collapse to
    a {CM_DEPTH}×{CM_WIDTH}-row table (map-side combine does nearly all
    the work); probes are a broadcast join of the tiny counter table
    against the audited terms. The sketch is mergeable across shards by
    counter addition, which is why it stands in for exact counts when
    the vocabulary itself cannot be shuffled.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).persist()
    return cm_probe(tf, depth=CM_DEPTH, width=CM_WIDTH, top_k=CM_TOP_K)


def _cm_bucket(depth_col, term_col, width: int):
    return hash64(F.concat(depth_col.cast("string"), F.lit(":"), term_col)) % width


def cm_probe(tf: DataFrame, depth: int, width: int, top_k: int) -> DataFrame:
    """Build a depth×width Count-Min table from a (term, cnt) frame and
    probe it for the top_k exact terms (cnt DESC, term ASC tie-break)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    counters = (
        tf.select(rows, "term", "cnt")
        .select("d", _cm_bucket(F.col("d"), F.col("term"), width).alias("b"), "cnt")
        .groupBy("d", "b")
        .agg(F.sum("cnt").alias("c"))
    )
    top = tf.orderBy(F.desc("cnt"), "term").limit(top_k)
    probes = top.select(
        "term",
        F.col("cnt").alias("exact_cnt"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "term", "exact_cnt", "d", _cm_bucket(F.col("d"), F.col("term"), width).alias("b")
    )
    return (
        probes.join(F.broadcast(counters), ["d", "b"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "term",
            "exact_cnt",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "term")
    )


CM_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
    SELECT unnest({TOKENS_SQL.format(col="text")}) AS term FROM documents
), tf AS (
    SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
), counters AS (
    SELECT d, {hash64_sql("CAST(d AS VARCHAR) || ':' || term")} % {CM_WIDTH} AS b,
           CAST(SUM(cnt) AS BIGINT) AS c
    FROM tf, range(0, {CM_DEPTH}) r(d)
    GROUP BY 1, 2
), top AS (
    SELECT term, cnt AS exact_cnt FROM tf ORDER BY cnt DESC, term LIMIT {CM_TOP_K}
), probes AS (
    SELECT term, exact_cnt, d,
           {hash64_sql("CAST(d AS VARCHAR) || ':' || term")} % {CM_WIDTH} AS b
    FROM top, range(0, {CM_DEPTH}) r(d)
)
SELECT p.term, p.exact_cnt, MIN(c.c) AS cm_estimate,
       MIN(c.c) - p.exact_cnt AS overestimate
FROM probes p JOIN counters c ON p.d = c.d AND p.b = c.b
GROUP BY p.term, p.exact_cnt
ORDER BY p.exact_cnt DESC, p.term
"""


HLL_M = 64        # registers (p = 6 bucket bits)
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007, m = 64)


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct word-bigram count via a DETERMINISTIC
    HyperLogLog: the md5-based ``hash64`` splits into a 6-bit register
    index (``h % 64``) and a 54-bit word whose leading-zero count + 1 is
    the rank ``rho``; registers keep ``max(rho)``. Unlike the engine's
    ``approx_count_distinct`` (implementation-defined, never
    value-hash-comparable), every step here is reproducible in SQL, so
    the sketch sits under the exact oracle like KMV.

    Determinism of the estimate: the harmonic sum ``sum(2^-reg)`` is kept
    in INTEGER arithmetic scaled by 2^55 (`1 << (55 - reg)`; empty
    registers contribute 2^55), so no float summation order exists; the
    one double division (+ the linear-counting ``ln`` on the small-range
    branch, same IEEE-stability precedent as unigram_logprob_score)
    happens on the final scalar. Rank via bit-length:
    ``rho = 55 - len(bin(w) stripped of leading zeros)`` — integer in
    both engines, and exactly 1 + leading-zeros of the 54-bit word.

    Scale shape (100 TB): sketch state per group is 64 bytes of
    registers, merged by elementwise MAX — partial aggregation applies
    everywhere; nothing but (source, bucket, max_rho) ever shuffles.
    KMV answers the same question with K integers and no bias branches;
    HLL's state is 8x smaller — this is the memory-lean twin, and the
    two estimates cross-audit each other in tests.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    from petasearch_spark.operators.portable import word_shingles

    th = (
        # N starts need N + 1 tokens: slice to SKETCH_MAX_TOKENS + 1 so the
        # last bigram start equals the oracle's range bound exactly
        docs.select("source", F.slice(tokens(F.col("text")), 1, SKETCH_MAX_TOKENS + 1).alias("ts"))
        .select("source", F.explode(F.array_distinct(word_shingles(F.col("ts"), 2))).alias("t"))
        .select("source", hash64(F.col("t")).alias("h"))
        .distinct()
    )
    regs = (
        th.select(
            "source",
            (F.col("h") % HLL_M).alias("bucket"),
            (
                55
                - F.length(
                    F.regexp_replace(F.conv(F.expr(f"h DIV {HLL_M}"), 10, 2), "^0+", "")
                )
            ).alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    per_src = regs.groupBy("source").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - reg)")).alias("denom_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = th.groupBy("source").agg(F.count(F.lit(1)).alias("exact_distinct"))
    z = F.lit(HLL_M) - F.col("n_present")
    denom = (F.col("denom_present") + z * F.lit(1 << 55)).cast("double")
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << 55)) / denom
    e_lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / z.cast("double"))
    est = F.round(F.when((z > 0) & (e_raw <= 2.5 * HLL_M), e_lc).otherwise(e_raw), 6)
    return (
        exact.join(per_src, "source")
        .select(
            "source",
            "exact_distinct",
            z.cast("long").alias("n_zero_registers"),
            est.alias("hll_estimate"),
            F.round((est - F.col("exact_distinct")) / F.col("exact_distinct"), 6).alias(
                "rel_error"
            ),
        )
        .orderBy("source")
    )


HLL_DISTINCT_SQL = f"""
WITH toks AS (
    SELECT source, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), tok AS (
    SELECT source, t[i] || ' ' || t[i+1] AS t
    FROM (SELECT source, ts AS t FROM toks), range(1, {SKETCH_MAX_TOKENS + 1}) r(i)
    WHERE i + 1 <= len(t)
), th AS (
    SELECT DISTINCT source, {hash64_sql("t")} AS h FROM tok
), regs AS (
    SELECT source, h % {HLL_M} AS bucket,
           MAX(55 - length(regexp_replace(bin(h // {HLL_M}), '^0+', ''))) AS reg
    FROM th GROUP BY source, bucket
), per_src AS (
    SELECT source,
           SUM(1::BIGINT << (55 - reg)) AS denom_present,
           COUNT(*) AS n_present
    FROM regs GROUP BY source
), exact AS (
    SELECT source, COUNT(*) AS exact_distinct FROM th GROUP BY source
), est AS (
    SELECT source, denom_present, n_present,
           {HLL_M} - n_present AS z,
           CAST(denom_present + ({HLL_M} - n_present) * (1::BIGINT << 55) AS DOUBLE) AS denom
    FROM per_src
), final AS (
    SELECT source, z,
           ROUND(CASE WHEN z > 0
                       AND {HLL_ALPHA * HLL_M * HLL_M * float(1 << 55)} / denom <= {2.5 * HLL_M}
                 THEN {float(HLL_M)} * ln({float(HLL_M)} / z)
                 ELSE {HLL_ALPHA * HLL_M * HLL_M * float(1 << 55)} / denom END, 6) AS hll_estimate
    FROM est
)
SELECT e.source, e.exact_distinct,
       CAST(f.z AS BIGINT) AS n_zero_registers,
       f.hll_estimate,
       ROUND((f.hll_estimate - e.exact_distinct) / e.exact_distinct, 6) AS rel_error
FROM exact e JOIN final f USING (source)
ORDER BY e.source
"""
