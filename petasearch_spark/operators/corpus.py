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

from petasearch_spark.functions.ordering import sort_via_exchange

from petasearch_spark.functions.localframe import literal_df

from petasearch_spark.operators.portable import (
    TOKENS_SQL,
    hash64,
    hash64_sql,
    shingle_hashes_sql,
    tokens,
)
from petasearch_spark.sources.tables import load_table

# per-source permille rates: source "srcN" -> 50*(1 + N%10) in [50, 500].
# A real mixing config is a user-supplied table; a derived rate keeps the
# demo self-contained and oracle-checkable. Arbitrary real-world sources
# (the curate CLI ingests any dump) fall back to the portable hash of the
# source string — same [50, 500] band, NEVER NULL or non-positive (a NULL
# rate would make `sampled`/`kept` NULL, and a negative suffix parse like
# 'cc:-3' would make it negative — either silently empties the curated
# output), and TRY_CAST keeps ANSI mode crash-free. Stated once per
# engine; only DIGITS-ONLY suffixes count as the synthetic shape — the
# regexp guard matters because the engines' bare TRY_CAST semantics
# DIFFER on non-integral strings (Spark TRY_CAST('3.5' AS INT) is NULL,
# DuckDB's rounds to 4 — round-5 audit): a source like 'src3.5' must
# take the hash fallback in BOTH engines, not a different rate in each.
SAMPLE_SALT = "sample:v1:"


def _source_num() -> F.Column:
    """Non-negative per-source number: the digits-only 'srcN' suffix,
    else the portable hash of the source string."""
    parsed = F.expr(
        "CASE WHEN substring(source, 4) RLIKE '^[0-9]+$'"
        " THEN TRY_CAST(substring(source, 4) AS INT) END"
    )
    return F.coalesce(parsed, hash64(F.coalesce(F.col("source"), F.lit(""))))


def _source_num_sql(source: str = "source") -> str:
    parsed = (
        f"CASE WHEN regexp_matches(substr({source}, 4), '^[0-9]+$')"
        f" THEN TRY_CAST(substr({source}, 4) AS INT) END"
    )
    fallback = hash64_sql(f"COALESCE({source}, '')")
    return f"COALESCE({parsed}, {fallback})"


def _rate_digit() -> F.Column:
    return _source_num() % 10 + 1


def _rate_digit_sql(source: str = "source") -> str:
    return f"({_source_num_sql(source)} % 10 + 1)"

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
    rate = (F.lit(50) * _rate_digit()).alias("rate_permille")
    key = hash64(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.select("doc_id", "source", "n_chars", rate)
        .filter(key < F.col("rate_permille"))
        .withColumn("weight", F.round(F.lit(1000.0) / F.col("rate_permille"), 6))
        .orderBy("doc_id")
    )


CORPUS_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       50 * {_rate_digit_sql()} AS rate_permille,
       ROUND(1000.0 / (50 * {_rate_digit_sql()}), 6) AS weight
FROM documents
WHERE {hash64_sql("'" + SAMPLE_SALT + "' || CAST(doc_id AS VARCHAR)")} % 1000
      < 50 * {_rate_digit_sql()}
ORDER BY doc_id
"""


QW_SALT = "qweight:v1:"
QW_TOK_PPM = 2500  # score saturates at 400 tokens -> keep-probability 1.0


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: keep each doc with probability
    proportional to a quality score (here: token count, saturating at
    400 tokens), the "soft filter" used when hard quality cutoffs throw
    away too much tail data.

    Deterministic Bernoulli draw per doc: keep iff
    ``hash64(salt || doc_id) % 1e6 < score_ppm`` where
    ``score_ppm = min(1e6, n_toks * {QW_TOK_PPM})``. All-integer
    arithmetic on the md5-based portable hash, so the SAME docs are kept
    on any engine/run and the oracle is exact. Inverse-probability
    weights make downstream token statistics unbiased.

    100 TB shape: identical to :func:`corpus_sample_stratified` — a
    stateless per-row filter fused into the scan (no shuffle, no state);
    the score here derives from the row itself, so there is not even a
    broadcast. Salting the hash key re-draws independently."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    n_toks = F.size(tokens(F.col("text")))
    score = F.least(F.lit(1_000_000), n_toks * QW_TOK_PPM)
    key = hash64(F.concat(F.lit(QW_SALT), F.col("doc_id").cast("string"))) % 1_000_000
    return (
        docs.select("doc_id", "source", n_toks.alias("n_toks"), score.alias("score_ppm"))
        .filter(key < score)
        .withColumn("weight", F.round(F.lit(1_000_000.0) / F.col("score_ppm"), 6))
        .orderBy("doc_id")
    )


QUALITY_WEIGHTED_SAMPLE_SQL = f"""
WITH scored AS (
    SELECT doc_id, source,
           CAST(len({TOKENS_SQL.format(col="text")}) AS INT) AS n_toks,
           CAST(LEAST(1000000, len({TOKENS_SQL.format(col="text")}) * {QW_TOK_PPM}) AS INT) AS score_ppm
    FROM documents
)
SELECT doc_id, source, n_toks, score_ppm,
       ROUND(1000000.0 / score_ppm, 6) AS weight
FROM scored
WHERE {hash64_sql("'" + QW_SALT + "' || CAST(doc_id AS VARCHAR)")} % 1000000 < score_ppm
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


# --- sequence packing (training-example assembly) --------------------------

CTX_LEN = 64     # tokens per training example (synthetic docs are 10-99
                 # tokens, so packs mix several docs and split others —
                 # both packing cases exist at every SF)
PACK_BUCKET = 64  # target docs per prefix-sum bucket (phase-1 granularity)


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in doc_id order
    into a single token stream and cut it into fixed ``CTX_LEN`` training
    examples; report per-pack composition (docs touched, docs fully
    contained, boundary splits, fill).

    The core is a GLOBAL prefix sum of token counts — the textbook
    single-partition-window trap. A bare
    ``Window.orderBy("doc_id").rowsBetween(unboundedPreceding, current)``
    funnels 100 TB through one task. Instead this runs the two-phase
    distributed prefix sum:

    1. bucket docs into contiguous id ranges of ~``PACK_BUCKET`` docs
       each (the divisor scales to the id range over a count-derived
       bucket target, so sparse content-hash id spaces bucket exactly
       like dense ones — see :func:`pack_token_lengths`) and aggregate
       per-bucket token subtotals (map-side combined; one small shuffle);
    2. collect ONLY the bucket subtotals (corpus_size / PACK_BUCKET rows —
       thousands, not billions), exclusive-scan them on the driver, and
       broadcast the offsets back;
    3. per-bucket windows (partitionBy bucket — parallel) add the local
       running sum to the bucket offset.

    Every quantity is integer arithmetic — bit-exact against the oracle's
    single-window SUM() OVER (ORDER BY doc_id).
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    lengths = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    return pack_token_lengths(lengths, ctx_len=CTX_LEN)


def pack_token_lengths(lengths: DataFrame, ctx_len: int = CTX_LEN) -> DataFrame:
    """Core of :func:`sequence_packing` over a ``(doc_id, n_toks)`` frame
    (separated so constructed corpora can be packed in tests).

    The prefix-sum bucket divisor scales to the ID RANGE over a
    COUNT-derived bucket target (~n_docs / PACK_BUCKET buckets, the same
    economics as the original fixed dense divisor): dense ids keep
    ~PACK_BUCKET docs per bucket, while SPARSE id spaces (the curate CLI
    ingests JSONL with 60-bit content-hash doc ids) would put every doc
    in its own bucket under a fixed width and turn the phase-2 collect
    into one row per document. Because the target tracks the doc count,
    phase-3 per-bucket windows stay ~PACK_BUCKET rows at ANY corpus
    size (a fixed bucket cap would instead grow them linearly). Bucket
    order still follows doc_id order, which is all the exclusive scan
    needs; output is divisor-invariant."""
    spark = lengths.sparkSession
    n, max_id = lengths.agg(F.count(F.lit(1)), F.max("doc_id")).collect()[0]
    target_buckets = max(1, int(n) // PACK_BUCKET + 1)
    div = max(PACK_BUCKET, int(max_id) // target_buckets + 1) if max_id is not None else PACK_BUCKET
    d = lengths.select(
        "doc_id", "n_toks", F.expr(f"doc_id DIV {div}").alias("bucket")
    )
    # phase 1+2: bucket subtotals -> driver exclusive scan -> broadcast
    totals = sorted(
        (r["bucket"], r["subtotal"])
        for r in d.groupBy("bucket").agg(F.sum("n_toks").alias("subtotal")).collect()
    )
    offsets, acc = [], 0
    for b, sub in totals:
        offsets.append((b, acc))
        acc += sub
    off = F.broadcast(spark.createDataFrame(offsets, "bucket long, bucket_off long"))
    # phase 3: per-bucket running sum (parallel windows) + offset
    from pyspark.sql import Window as W

    win = W.partitionBy("bucket").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    spans = (
        d.join(off, "bucket")
        .select(
            "doc_id",
            "n_toks",
            (F.col("bucket_off") + F.sum("n_toks").over(win)).alias("cum"),
        )
        .select("doc_id", "n_toks", (F.col("cum") - F.col("n_toks")).alias("start"), "cum")
    )
    # zero-token docs must not reach the explode: Spark's sequence(a, b)
    # DESCENDS when b < a (here start == cum -> b = a-1), which would emit
    # spurious packs where DuckDB's generate_series returns empty
    packs = spans.filter(F.col("n_toks") > 0).select(
        "doc_id",
        "n_toks",
        "start",
        "cum",
        F.explode(
            F.sequence(F.expr(f"start DIV {ctx_len}"), F.expr(f"(cum - 1) DIV {ctx_len}"))
        ).alias("pack_id"),
    )
    contrib = F.least(F.col("cum"), (F.col("pack_id") + 1) * ctx_len) - F.greatest(
        F.col("start"), F.col("pack_id") * ctx_len
    )
    full = (F.col("start") >= F.col("pack_id") * ctx_len) & (
        F.col("cum") <= (F.col("pack_id") + 1) * ctx_len
    )
    return (
        packs.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(full.cast("long")).alias("n_full_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum(contrib).alias("fill_tokens"),
        )
        .orderBy("pack_id")
    )


SEQUENCE_PACKING_SQL = f"""
WITH d AS (
    SELECT doc_id,
           CAST(len({TOKENS_SQL.format(col="text")}) AS BIGINT) AS n_toks
    FROM documents
), c AS (
    SELECT doc_id, n_toks,
           CAST(SUM(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM d
), spans AS (
    SELECT doc_id, n_toks, cum - n_toks AS start, cum FROM c
), x AS (
    SELECT doc_id, n_toks, start, cum,
           unnest(generate_series(start // {CTX_LEN}, (cum - 1) // {CTX_LEN})) AS pack_id
    FROM spans
    WHERE n_toks > 0
)
SELECT pack_id, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN start >= pack_id * {CTX_LEN} AND cum <= (pack_id + 1) * {CTX_LEN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       CAST(SUM(LEAST(cum, (pack_id + 1) * {CTX_LEN}) - GREATEST(start, pack_id * {CTX_LEN})) AS BIGINT) AS fill_tokens
FROM x
GROUP BY pack_id
ORDER BY pack_id
"""


# --- fuzzy (MinHash) decontamination ---------------------------------------


def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train/eval decontamination: exact n-gram overlap
    (:func:`decontaminate_ngram_overlap`) misses eval text that was lightly
    edited before landing in the training corpus; this rides the MinHash
    LSH machinery of the dedup family to flag TRAIN docs whose shingle-set
    Jaccard similarity with any EVAL doc (``doc_id % EVAL_MOD == 0``)
    reaches the dedup threshold.

    Plan (100 TB): one corpus pass builds all 16 signature minima in a
    single map-side-combining aggregation (shared with dedup_minhash_lsh);
    the EVAL side's bands are broadcast (held-out benchmarks are tiny by
    construction), so candidate generation never shuffles the corpus;
    exact-Jaccard verification broadcasts the candidate pairs through the
    shingle fetch joins exactly like dedup_minhash_lsh.

    Returns (doc_id = contaminated train doc, eval_id, jaccard ≥ 0.5).
    """
    from petasearch_spark.operators.dedup import (
        BAND_ROWS,
        JACCARD_THRESHOLD,
        MH_AB,
        MH_MOD30,
        MH_PRIME,
        N_HASHES,
        _shingle_hashes,
    )

    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    sh = _shingle_hashes(docs).persist()
    h30 = F.col("sh_h") % MH_MOD30
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * h30 + F.lit(b)) % MH_PRIME).alias(f"s{i}")
            for i, (a, b) in enumerate(MH_AB)
        ]
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("band"),
                        F.concat_ws(
                            ",", *[F.col(f"s{p * BAND_ROWS + r}") for r in range(BAND_ROWS)]
                        ).alias("band_key"),
                    )
                    for p in range(N_HASHES // BAND_ROWS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train_b = bands.filter(~is_eval)
    eval_b = F.broadcast(
        bands.filter(is_eval).select(
            F.col("doc_id").alias("eval_id"), "band", "band_key"
        )
    )
    cand = (
        train_b.join(eval_b, ["band", "band_key"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    st = sh  # train-side shingles (fetch by candidate doc_id)
    se = sh.select(F.col("doc_id").alias("eval_id"), "sh_h")
    t_side = st.join(F.broadcast(cand), "doc_id")
    shared = (
        se.join(F.broadcast(t_side), ["eval_id", "sh_h"])
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ct = cnt.select("doc_id", F.col("n_sh").alias("n_t"))
    ce = cnt.select(F.col("doc_id").alias("eval_id"), F.col("n_sh").alias("n_e"))
    j = F.col("shared").cast("double") / (F.col("n_t") + F.col("n_e") - F.col("shared"))
    return (
        shared.join(F.broadcast(ct), "doc_id")
        .join(F.broadcast(ce), "eval_id")
        .select("doc_id", "eval_id", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_id", "eval_id")
    )


def _decontaminate_minhash_sql() -> str:
    from petasearch_spark.operators.dedup import (
        _MH_BAND_ROWS,
        _MH_SIG_COLS,
        JACCARD_THRESHOLD,
    )
    from petasearch_spark.operators.portable import shingle_hashes_sql

    return f"""
WITH {shingle_hashes_sql("documents", "doc_id", "text", n=3)}
, sigs AS (
    SELECT doc_id,
           {_MH_SIG_COLS}
    FROM shh GROUP BY doc_id
)
, bands AS (
{_MH_BAND_ROWS}
)
, cand AS (
    SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_id
    FROM bands t JOIN bands e
      ON t.band = e.band AND t.band_key = e.band_key
     AND t.doc_id % {EVAL_MOD} <> 0 AND e.doc_id % {EVAL_MOD} = 0
)
, cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id)
, shared AS (
    SELECT c.doc_id, c.eval_id, COUNT(*) AS shared
    FROM cand c
    JOIN shh st ON st.doc_id = c.doc_id
    JOIN shh se ON se.doc_id = c.eval_id AND se.sh_h = st.sh_h
    GROUP BY c.doc_id, c.eval_id
)
SELECT s.doc_id, s.eval_id,
       ROUND(CAST(shared AS DOUBLE) / (ct.n_sh + ce.n_sh - shared), 6) AS jaccard
FROM shared s
JOIN cnt ct ON ct.doc_id = s.doc_id
JOIN cnt ce ON ce.doc_id = s.eval_id
WHERE ROUND(CAST(shared AS DOUBLE) / (ct.n_sh + ce.n_sh - shared), 6) >= {JACCARD_THRESHOLD}
ORDER BY s.doc_id, s.eval_id
"""


DECONTAMINATE_MINHASH_SQL = _decontaminate_minhash_sql()


# --- full curation funnel (composition showcase) ---------------------------


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end "raw corpus -> training set" decision, one row per
    document with every stage's verdict:

    * ``is_eval``       — held-out split member (doc_id % EVAL_MOD == 0)
    * ``quality_keep``  — passes the Gopher repetition thresholds
    * ``exact_dup``     — not the canonical (smallest-id) copy of its md5
    * ``near_dup``      — has a verified MinHash near-dup with a smaller id
      (keep-first rule over the LSH pair list)
    * ``contaminated``  — shares an 8-gram with the eval split
    * ``sampled``       — drawn by the deterministic stratified sampler
    * ``kept``          — the conjunction: what actually enters training

    This is the composition a 100 TB curation run executes as ONE lazy
    plan: each flag producer is an already-oracled operator (the funnel's
    oracle embeds their SQL as subqueries); the pair/contamination sides
    are tiny (broadcast flag joins), quality/exact are corpus-sized but
    key every shuffle by doc_id/content-hash, so the flag assembly
    co-partitions. Auditing per-stage loss is a GROUP BY over this
    output, not a re-run of the pipeline.
    """
    from pyspark.sql import Window as W

    from petasearch_spark.operators.dedup import dedup_minhash_lsh
    from petasearch_spark.operators.quality import gopher_quality

    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    q = gopher_quality(spark, sf_dir).select("doc_id", F.col("keep").alias("quality_keep"))
    exact = docs.select(
        "doc_id",
        (F.col("doc_id") != F.min("doc_id").over(W.partitionBy(F.md5("text")))).alias(
            "exact_dup"
        ),
    )
    near_ids = F.broadcast(
        dedup_minhash_lsh(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
        .withColumn("near_dup", F.lit(True))
    )
    contam_ids = F.broadcast(
        decontaminate_ngram_overlap(spark, sf_dir).select("doc_id")
        .withColumn("contaminated", F.lit(True))
    )
    rate = F.lit(50) * _rate_digit()
    sampled = (
        hash64(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))) % 1000 < rate
    )
    flags = (
        docs.select("doc_id", "source", (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"), sampled.alias("sampled"))
        .join(q, "doc_id")
        .join(exact, "doc_id")
        .join(near_ids, "doc_id", "left")
        .join(contam_ids, "doc_id", "left")
        .fillna(False, ["near_dup", "contaminated"])
    )
    kept = (
        ~F.col("is_eval")
        & F.col("quality_keep")
        & ~F.col("exact_dup")
        & ~F.col("near_dup")
        & ~F.col("contaminated")
        & F.col("sampled")
    )
    return flags.select(
        "doc_id",
        "is_eval",
        "quality_keep",
        "exact_dup",
        "near_dup",
        "contaminated",
        "sampled",
        kept.alias("kept"),
    ).orderBy("doc_id")


def _curation_funnel_sql() -> str:
    from petasearch_spark.operators.dedup import DEDUP_MINHASH_SQL
    from petasearch_spark.operators.quality import GOPHER_QUALITY_SQL

    return f"""
WITH quality AS (
    SELECT doc_id, keep AS quality_keep FROM ({GOPHER_QUALITY_SQL})
), near_ids AS (
    SELECT DISTINCT doc_b AS doc_id FROM ({DEDUP_MINHASH_SQL})
), contam_ids AS (
    SELECT doc_id FROM ({DECONTAMINATE_SQL})
), exact AS (
    SELECT doc_id,
           doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS exact_dup
    FROM documents
)
SELECT d.doc_id,
       d.doc_id % {EVAL_MOD} = 0 AS is_eval,
       q.quality_keep,
       e.exact_dup,
       n.doc_id IS NOT NULL AS near_dup,
       c.doc_id IS NOT NULL AS contaminated,
       {hash64_sql("'" + SAMPLE_SALT + "' || CAST(d.doc_id AS VARCHAR)")} % 1000
           < 50 * {_rate_digit_sql("d.source")} AS sampled,
       (NOT d.doc_id % {EVAL_MOD} = 0) AND q.quality_keep AND (NOT e.exact_dup)
           AND n.doc_id IS NULL AND c.doc_id IS NULL
           AND {hash64_sql("'" + SAMPLE_SALT + "' || CAST(d.doc_id AS VARCHAR)")} % 1000
               < 50 * {_rate_digit_sql("d.source")} AS kept
FROM documents d
JOIN quality q USING (doc_id)
JOIN exact e USING (doc_id)
LEFT JOIN near_ids n USING (doc_id)
LEFT JOIN contam_ids c USING (doc_id)
ORDER BY d.doc_id
"""


CURATION_FUNNEL_SQL = _curation_funnel_sql()


# ---- Bloom-filter decontamination -----------------------------------------
# The 100 TB form of the eval-membership test: instead of joining corpus
# shingles against the eval shingle SET (decontaminate_ngram_overlap), fold
# the eval set into a Bloom bitset ONCE and probe it with pure arithmetic.
# The filter is ~{BLOOM_BITS//8} bytes regardless of corpus size, the probe
# side never shuffles, and false positives are one-sided (never a miss) —
# exactly the trade a petabyte decontamination pass wants. Bit positions
# are affine transforms of the portable md5 shingle hash (same trick as the
# MinHash signature family), so the filter — and every false positive — is
# bit-identical on any engine: the oracle stays exact.
BLOOM_BITS = 1 << 20   # 128 KiB of filter state
BLOOM_K = 3            # hash probes per shingle
BLOOM_WORD = 32        # bits per packed word (BIGINT-safe shifts everywhere)
_BLOOM_PRIME = 2147483647
_BLOOM_AB = [((i * 2654435761 + 19) % _BLOOM_PRIME | 1, (i * 40503 + 23) % _BLOOM_PRIME) for i in range(BLOOM_K)]


def _bloom_pos_expr(h, j: int):
    a, b = _BLOOM_AB[j]
    return (h % (1 << 30) * a + b) % _BLOOM_PRIME % BLOOM_BITS


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train docs flagged by a Bloom filter of the eval set's word
    {DECON_NGRAM}-grams: (doc_id, n_bloom_hits) for every train doc with
    at least one shingle whose {BLOOM_K} bit positions are all set.

    Plan: eval shingles -> bit positions -> bit_or-packed words (a
    <= {BLOOM_BITS//BLOOM_WORD}-row table, broadcast); the train side
    checks its {BLOOM_K} probes via {BLOOM_K} BROADCAST joins — one per
    probe index, each on that probe's word — so a shingle's flag is a
    per-row conjunction and the corpus never shuffles for the probing
    (the earlier explode -> groupBy(doc_id, h) form shuffled every
    (shingle x probe) row back together; at 100 TB that was the whole
    corpus {BLOOM_K}x over, for a regrouping a row-local AND computes
    for free). The only corpus shuffle left is the per-doc count."""
    from petasearch_spark.operators.dedup import _shingle_hashes

    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    sh = _shingle_hashes(docs, n=DECON_NGRAM, col="h").persist()
    is_eval = F.col("doc_id") % EVAL_MOD == 0

    def positions(df):
        pos = F.explode(
            F.array(*[F.lit(0).cast("long") + _bloom_pos_expr(F.col("h"), j) for j in range(BLOOM_K)])
        ).alias("pos")
        return df.select("doc_id", "h", pos).select(
            "doc_id",
            "h",
            (F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
            (F.col("pos") % BLOOM_WORD).cast("int").alias("bit"),
        )

    filt = (
        positions(sh.filter(is_eval))
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask"))
    )
    probes = sh.filter(~is_eval)
    set_checks = []
    for j in range(BLOOM_K):
        pos_j = F.lit(0).cast("long") + _bloom_pos_expr(F.col("h"), j)
        probes = probes.withColumn(f"_w{j}", (pos_j / BLOOM_WORD).cast("long")).withColumn(
            f"_b{j}", (pos_j % BLOOM_WORD).cast("int")
        )
        fj = filt.select(F.col("word").alias(f"_w{j}"), F.col("mask").alias(f"_m{j}"))
        probes = probes.join(F.broadcast(fj), f"_w{j}", "left")
        set_checks.append(
            F.expr(f"shiftright(coalesce(_m{j}, CAST(0 AS BIGINT)), _b{j}) & 1") == 1
        )
    all_set = set_checks[0]
    for c in set_checks[1:]:
        all_set = all_set & c
    flagged = probes.filter(all_set)
    return (
        flagged.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
        .orderBy("doc_id")
    )


def _bloom_pos_sql(h: str, j: int) -> str:
    a, b = _BLOOM_AB[j]
    return f"((({h}) % {1 << 30} * {a} + {b}) % {_BLOOM_PRIME} % {BLOOM_BITS})"


def _decontaminate_bloom_sql() -> str:
    pos_list = ", ".join(_bloom_pos_sql("h", j) for j in range(BLOOM_K))
    return f"""
WITH {shingle_hashes_sql("documents", "doc_id", "text", n=DECON_NGRAM, hash_col="h")}
, pos AS (
    SELECT doc_id, h, unnest([{pos_list}]) AS p FROM shh
), wb AS (
    SELECT doc_id, h, p // {BLOOM_WORD} AS word, CAST(p % {BLOOM_WORD} AS INT) AS bit FROM pos
), filt AS (
    SELECT word, bit_or(CAST(1 AS BIGINT) << bit) AS mask
    FROM wb WHERE doc_id % {EVAL_MOD} = 0
    GROUP BY word
), probes AS (
    SELECT t.doc_id, t.h,
           (COALESCE(f.mask, 0) >> t.bit) & 1 AS hit
    FROM wb t LEFT JOIN filt f USING (word)
    WHERE t.doc_id % {EVAL_MOD} <> 0
), flagged AS (
    SELECT doc_id, h FROM probes GROUP BY doc_id, h HAVING MIN(hit) = 1
)
SELECT doc_id, COUNT(*) AS n_bloom_hits
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


DECONTAMINATE_BLOOM_SQL = _decontaminate_bloom_sql()


#: mixture target = this share of the corpus token mass, split across
#: sources by weight
MIX_SHARE_NUM, MIX_SHARE_DEN = 2, 5  # 40%, kept as a ratio for integer math
MIX_SALT = "mix|"


def mixture_weight_expr():
    """Per-source mixture weight 1..4 derived from the source name
    (``srcN`` -> ``1 + N % 4``; arbitrary real-world sources use the
    hashed fallback, never NULL) — a stand-in for the hand-tuned
    DoReMi/Pile-style domain weights a real run would load from config."""
    return 1 + (_source_num() % 4)


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted data mixing: fill a global token budget
    (``MIX_SHARE`` of the corpus) across sources in proportion to
    per-source mixture weights, taking documents in a deterministic
    hash-priority order until each source's budget is spent — the static
    mixture-construction step of an LLM training-data pipeline (the
    weighted analogue of uniform stratified sampling; a source too small
    for its budget saturates, i.e. is taken whole).

    Exactness: budgets are pure integer arithmetic
    (``share * corpus_toks * w DIV (den * sum_w)``), the per-source
    priority order is the portable md5 hash, and the keep rule is an
    integer EXCLUSIVE running sum (``cum_before < budget``) — so the
    selected set is bit-identical on any engine.

    100 TB shape: the per-source totals are one map-side-combined
    aggregation (rows = #sources — broadcast back); the running sum is a
    per-source window over (doc_id, n_toks, h) rows — ~24 bytes/doc, and
    partitionBy(source) parallelizes across sources. If ONE source
    outgrows a task, the same two-phase prefix sum as
    :func:`pack_token_lengths` applies (bucket by hash prefix, driver
    exclusive-scan over bucket subtotals); the window form keeps the
    oracle SQL identical.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    d = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
        hash64(
            F.concat(F.lit(MIX_SALT), F.col("source"), F.lit("|"), F.col("doc_id").cast("string"))
        ).alias("h"),
        mixture_weight_expr().cast("long").alias("w"),
    )
    totals = d.groupBy("source", "w").agg(F.sum("n_toks").alias("src_toks"))
    corpus = totals.agg(
        F.sum("src_toks").alias("corpus_toks"), F.sum("w").alias("sum_w")
    )
    budgets = totals.crossJoin(F.broadcast(corpus)).select(
        "source",
        F.expr(
            f"({MIX_SHARE_NUM} * corpus_toks * w) DIV ({MIX_SHARE_DEN} * sum_w)"
        ).alias("budget"),
        "src_toks",
    )
    # doc_id tie-break: a ROWS-frame running sum over tied ORDER BY keys
    # is order-dependent, so two same-source docs with colliding 60-bit
    # hashes straddling the budget boundary could swap keep verdicts
    # between engines/runs without it (round-5 audit)
    win = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = d.withColumn("cum_before", F.sum("n_toks").over(win) - F.col("n_toks"))
    return (
        cum.join(F.broadcast(budgets), "source")
        .select(
            "doc_id",
            "source",
            "n_toks",
            "cum_before",
            "budget",
            (F.col("cum_before") < F.col("budget")).alias("keep"),
            (F.col("budget") >= F.col("src_toks")).alias("saturated"),
        )
        .orderBy("doc_id")
    )


MIXTURE_SAMPLE_SQL = f"""
WITH d AS (
    SELECT doc_id, source,
           CAST(len({TOKENS_SQL.format(col="text")}) AS BIGINT) AS n_toks,
           {hash64_sql("'" + MIX_SALT + "' || source || '|' || CAST(doc_id AS VARCHAR)")} AS h,
           CAST(1 + ({_source_num_sql()} % 4) AS BIGINT) AS w
    FROM documents
), totals AS (
    SELECT source, w, SUM(n_toks) AS src_toks FROM d GROUP BY source, w
), corpus AS (
    SELECT SUM(src_toks) AS corpus_toks, SUM(w) AS sum_w FROM totals
), budgets AS (
    SELECT source,
           CAST(({MIX_SHARE_NUM} * corpus_toks * w) // ({MIX_SHARE_DEN} * sum_w) AS BIGINT) AS budget,
           src_toks
    FROM totals CROSS JOIN corpus
), cum AS (
    SELECT doc_id, source, n_toks,
           CAST(COALESCE(SUM(n_toks) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
    FROM d
)
SELECT c.doc_id, c.source, c.n_toks, c.cum_before, b.budget,
       c.cum_before < b.budget AS keep,
       b.budget >= b.src_toks AS saturated
FROM cum c JOIN budgets b USING (source)
ORDER BY c.doc_id
"""


# --- semantic (embedding-cosine) decontamination ---------------------------

SEM_DECON_COS = 0.35  # calibrated to the synthetic embeddings like
                      # NEARDUP_COS (0.4): 15 contaminated vectors at
                      # sf0.001 / 31 at sf0.01, so the parity rows carry
                      # VALUE signal at every SF (a production threshold
                      # on real embeddings would sit near 0.9)
SEM_EVAL_MOD = 20     # eval vectors: vec_id % 20 == 0 ...
SEM_EVAL_CAP = 200_000  # ... AND vec_id < CAP: bounds the eval matrix to
                        # <= CAP/MOD = 10k vectors no matter how large the
                        # corpus grows — a held-out benchmark is fixed-size;
                        # an UNcapped mod rule would collect 5% of a 10M-row
                        # corpus to the driver (round-4 review finding).
                        # No effect at the test SFs (<= 5000 vectors).


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train/eval decontamination — the fuzzy modality the
    shingle-based passes cannot see (a paraphrase sharing no n-gram with
    the benchmark still leaks it): a training vector whose embedding
    cosine against ANY eval vector reaches the threshold is flagged.
    Output: one row per contaminated training vector with its hit count
    and max cosine.

    Scale shape: the eval matrix (held-out benchmarks — bounded to
    SEM_EVAL_CAP/SEM_EVAL_MOD rows by the explicit cap, since a benchmark
    set is fixed-size while the corpus grows) rides INSIDE an Arrow
    kernel closure; the corpus makes
    one narrow pass (per-batch BLAS against the eval matrix), so there is
    no join, no shuffle before the final sort — the same
    broadcast-the-small-side law as decontaminate_ngram_overlap, pushed
    all the way into a kernel. Cosines are sequential-fold + round-6
    (operators/similarity.py conventions), so the DuckDB oracle's
    list_dot_product reproduces them exactly."""
    import numpy as np
    import pandas as pd

    from petasearch_spark.operators.similarity import (
        _as_double,
        _round_half_up6,
        _seq_dot_norms,
        _seq_norm2,
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    ev_rows = emb.filter(
        (F.col("vec_id") % SEM_EVAL_MOD == 0) & (F.col("vec_id") < SEM_EVAL_CAP)
    ).collect()
    if not ev_rows:
        return literal_df(
            spark, [], "vec_id long, n_eval_hits long, max_cos double"
        )
    E = np.array([list(r["v"]) for r in ev_rows], dtype=np.float64)
    en = np.sqrt(_seq_norm2(E))

    # no type hints: the struct-returning scalar pandas UDF form (Series
    # in, DataFrame out) is selected by returnType, not by annotations
    @F.pandas_udf("struct<n_eval_hits: long, max_cos: double>")
    def hits(v):
        if len(v) == 0:
            return pd.DataFrame({"n_eval_hits": [], "max_cos": []})
        X = np.stack(v.values)
        acc, xsq = _seq_dot_norms(X, E)
        cs = _round_half_up6(acc / (np.sqrt(xsq)[:, None] * en[None, :]))
        # NaN cosines (corrupt/zero-norm vectors) are neutral: numpy's
        # NaN >= thr is False but the DuckDB twin's total order put NaN
        # above every threshold — both engines now exclude them from
        # the hit count AND the max (round-5 audit)
        cs = np.where(np.isnan(cs), -np.inf, cs)
        hit = cs >= SEM_DECON_COS
        return pd.DataFrame(
            {
                "n_eval_hits": hit.sum(axis=1).astype("int64"),
                "max_cos": np.where(hit.any(axis=1), cs.max(axis=1), 0.0),
            }
        )

    train = emb.filter(
        (F.col("vec_id") % SEM_EVAL_MOD != 0) | (F.col("vec_id") >= SEM_EVAL_CAP)
    )
    scored = train.select("vec_id", hits(F.col("v")).alias("h"))
    # sort_via_exchange: the whole pipeline is narrow (scan -> BLAS kernel),
    # so a bare orderBy re-runs corpus scan + kernel for RangePartitioner
    # sampling (functions/ordering.py)
    return sort_via_exchange(
        scored.filter(F.col("h.n_eval_hits") > 0)
        .select("vec_id", F.col("h.n_eval_hits").alias("n_eval_hits"), F.col("h.max_cos").alias("max_cos")),
        "vec_id",
    )


DECONTAMINATE_SEMANTIC_SQL = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
, ev AS (SELECT vec_id, v FROM emb WHERE vec_id % {SEM_EVAL_MOD} = 0 AND vec_id < {SEM_EVAL_CAP})
, train AS (SELECT vec_id, v FROM emb WHERE vec_id % {SEM_EVAL_MOD} <> 0 OR vec_id >= {SEM_EVAL_CAP})
, scored AS (
    SELECT t.vec_id,
           ROUND(list_dot_product(t.v, e.v)
                 / (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cos
    FROM train t CROSS JOIN ev e
)
-- NaN cosines (corrupt vectors) are NOT hits: DuckDB's total order puts
-- NaN above every threshold, the numpy kernel's comparison is False --
-- both engines now EXCLUDE them (round-5 audit)
, finite AS (SELECT * FROM scored WHERE NOT isnan(cos))
SELECT vec_id,
       CAST(COUNT(CASE WHEN cos >= {SEM_DECON_COS} THEN 1 END) AS BIGINT) AS n_eval_hits,
       MAX(cos) AS max_cos
FROM finite
GROUP BY vec_id
HAVING COUNT(CASE WHEN cos >= {SEM_DECON_COS} THEN 1 END) > 0
ORDER BY vec_id
"""
