"""Training-data SELECTION operators: importance resampling + a hashed
Naive-Bayes quality/domain classifier.

Two published techniques every large LLM data pipeline runs between raw
crawl and training, neither covered by the dedup/decontamination family:

* ``dsir_importance_sample`` — DSIR (Xie et al. 2023, "Data Selection
  for Language Models via Importance Resampling"): score every raw
  document by the log importance ratio of a TARGET distribution to the
  RAW distribution, both modeled as hashed-(uni+bi)gram multinomials
  with Laplace smoothing, and keep the top-K. The target here is the
  corpus's ``lang = 'en'`` slice (on real data: the trusted/high-quality
  corpus). The model is a fixed ``DSIR_B``-bucket table — constant-size
  regardless of corpus size — so scoring is embarrassingly parallel.
* ``lang_classifier_nb`` — the CCNet/WebText-style linear quality
  classifier (Wenzek et al. 2020; Brown et al. 2020 use a trained
  classifier the same way), in its closed-form multinomial Naive-Bayes
  variant so training is ONE aggregation and the whole run is exactly
  reproducible in SQL (no SGD). Trains on the corpus's own ``lang``
  label over hashed unigram features and reports the resubstitution
  confusion matrix per (true, predicted) class.

The reference engine has no data-selection surface; like
``operators/quality.py`` these extend the pipeline family and are
oracle-checked cell-exact against DuckDB.

Scale notes (100 TB): both operators are two corpus passes. Pass 1
(training) reduces the gram stream to a bounded model — ``DSIR_B`` rows
for DSIR, ``NB_B x n_classes`` for NB — via one map-side-combined
aggregation; the model is then BROADCAST (it is kilobytes at any corpus
size). Pass 2 (scoring) is map-only per document — explode grams,
broadcast-hash-join the model, partially aggregate — so the only
data-volume shuffle is the 1-row-per-document partial-sum exchange.
DSIR's final top-K is a TakeOrdered (no global sort materialization);
NB's confusion matrix is a second, n_classes²-row aggregation. Driver
collects are bounded: two totals for DSIR, n_classes+1 scalars for NB.

Determinism: every per-gram term is ``ln`` of an exact integer ratio
truncated to DECIMAL(28,12) before summing (the unigram_logprob_score
precedent), so per-document sums are order-independent integer
arithmetic in both engines and argmax/top-K comparisons are exact, with
explicit tie-breaks (doc_id for top-K, lexicographically smallest class
for argmax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.functions.localframe import literal_df

from petasearch_spark.operators.portable import TOKENS_SQL, hash64_sql, tokens
from petasearch_spark.operators.quality import WINDOW_MAX_STARTS, _windows
from petasearch_spark.sources.tables import load_table

#: DSIR hashed-feature buckets (the paper uses 10k for full CC; the
#: synthetic vocabulary is ~60 tokens so 2048 keeps buckets sparse the
#: same way).
DSIR_B = 2048

#: DSIR target slice: on real data a trusted corpus; here the 'en' docs.
DSIR_TARGET_LANG = "en"

#: documents kept by the resample (top-K by mean log importance ratio).
DSIR_TOP_K = 200

#: Naive-Bayes hashed unigram buckets.
NB_B = 1024

_DEC = "decimal(28,12)"


def _doc_gram_buckets(docs: DataFrame, n_buckets: int, bigrams: bool) -> DataFrame:
    """One row per (doc_id, lang, source, gram-hash bucket).

    Grams are whitespace unigrams (plus space-joined bigrams for DSIR),
    hashed with the portable 60-bit hash and folded into ``n_buckets``.
    Documents with zero tokens contribute no rows (and are therefore
    absent from the scored output — documented contract).
    """
    toks = docs.select("doc_id", "lang", "source", tokens(F.col("text")).alias("ts"))
    wins = _windows(F.col("ts"), 1)
    if bigrams:
        wins = F.concat(wins, _windows(F.col("ts"), 2))
    return toks.select(
        "doc_id", "lang", "source", F.explode(wins).alias("wh")
    ).withColumn("b", F.pmod(F.col("wh"), F.lit(n_buckets)).cast("int")).drop("wh")


def _ln_dec(num, den) -> F.Column:
    """``CAST(ln(num / den) AS DECIMAL(28,12))`` — the portable per-gram
    log term (both engines compute ln of the same exact integer ratio)."""
    return F.log(num.cast("double") / den.cast("double")).cast(_DEC)


def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: top-``DSIR_TOP_K`` documents by mean hashed-n-gram log
    importance ratio ln p_target(g) − ln p_raw(g), Laplace-smoothed over
    ``DSIR_B`` buckets. Output is ordered (ratio DESC, doc_id) so the
    K-cutoff and row order are deterministic.

    Plan: gram-bucket counts reduce to ≤DSIR_B rows (map-side combine)
    and are broadcast back onto the gram stream (left join — empty
    buckets fall back to the smoothing floor); the only data-volume
    shuffle is the per-document partial-sum exchange; top-K runs as
    TakeOrdered. Two scalar collects (total gram counts).
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    bg = _doc_gram_buckets(docs, DSIR_B, bigrams=True)

    cnt = bg.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)).alias("tc"),
    )
    totals = cnt.agg(F.sum("rc").alias("r"), F.sum("tc").alias("t")).collect()[0]
    r_tot = int(totals["r"] or 0) + DSIR_B  # Laplace: +1 per bucket
    t_tot = int(totals["t"] or 0) + DSIR_B

    term = _ln_dec(F.lit(1) + F.coalesce(F.col("tc"), F.lit(0)), F.lit(t_tot)) - _ln_dec(
        F.lit(1) + F.coalesce(F.col("rc"), F.lit(0)), F.lit(r_tot)
    )
    scored = (
        bg.join(F.broadcast(cnt), "b", "left")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum(term).cast("double") / F.count(F.lit(1)), 6).alias("mean_log_ratio"),
        )
    )
    return scored.orderBy(F.desc("mean_log_ratio"), "doc_id").limit(DSIR_TOP_K)


DSIR_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, source, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), uni AS (
    SELECT doc_id, lang, source, unnest(ts[1:{WINDOW_MAX_STARTS}]) AS g FROM toks
), bi AS (
    SELECT doc_id, lang, source, array_to_string(ts[i:i+1], ' ') AS g
    FROM toks, range(1, {WINDOW_MAX_STARTS + 1}) r(i) WHERE i + 1 <= len(ts)
), bg AS (
    SELECT doc_id, lang, source, {hash64_sql("g")} % {DSIR_B} AS b
    FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), cnt AS (
    SELECT b, COUNT(*) AS rc,
           SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tc
    FROM bg GROUP BY b
), tot AS (
    SELECT SUM(rc) + {DSIR_B} AS r_tot, SUM(tc) + {DSIR_B} AS t_tot FROM cnt
), term AS (
    SELECT bg.doc_id, bg.lang, bg.source,
           CAST(ln(CAST(1 + COALESCE(cnt.tc, 0) AS DOUBLE) / t_tot) AS DECIMAL(28,12))
         - CAST(ln(CAST(1 + COALESCE(cnt.rc, 0) AS DOUBLE) / r_tot) AS DECIMAL(28,12)) AS w
    FROM bg LEFT JOIN cnt USING (b) CROSS JOIN tot
)
SELECT doc_id, lang, source, COUNT(*) AS n_grams,
       ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS mean_log_ratio
FROM term
GROUP BY doc_id, lang, source
ORDER BY mean_log_ratio DESC, doc_id
LIMIT {DSIR_TOP_K}
"""


def lang_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes over hashed unigrams, trained on the
    corpus's own ``lang`` label; returns the resubstitution confusion
    matrix (true lang, predicted lang, n_docs, mean winning score).

    Prediction argmax compares EXACT decimal sums; ties break to the
    lexicographically smallest class. Training is one aggregation to a
    ≤``NB_B``·n_classes-row model, pivoted to one count column per class
    and broadcast, so scoring adds no per-class row fan-out: each gram
    row carries all class counts and the per-document exchange moves one
    partial-sum row per document.

    Unlabeled docs (``lang IS NULL``) are EXCLUDED from both training
    and the confusion matrix — a null class can neither be pivoted to a
    count column nor sorted among the class strings, and resubstitution
    accuracy is undefined without a true label (round-4 ADVICE: the
    synthetic fixture is fully labeled, but the operator sits next to a
    curate CLI that ingests arbitrary dumps). The SQL twin carries the
    same filter.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True).filter(
        F.col("lang").isNotNull()
    )
    bg = _doc_gram_buckets(docs, NB_B, bigrams=False).drop("source")

    # n_classes+1 bounded driver collects: class list, doc priors, gram totals
    cls_rows = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nd")).collect()
    classes = sorted(r["lang"] for r in cls_rows)
    if not classes:
        return literal_df(
            spark, [], "lang string, pred_lang string, n_docs bigint, mean_score double"
        )
    n_docs_total = sum(int(r["nd"]) for r in cls_rows)
    prior = {r["lang"]: int(r["nd"]) for r in cls_rows}

    cnt = bg.groupBy("b", "lang").agg(F.count(F.lit(1)).alias("cb"))
    tg_rows = cnt.groupBy("lang").agg(F.sum("cb").alias("tg")).collect()
    gram_tot = {r["lang"]: int(r["tg"]) for r in tg_rows}

    model = cnt.groupBy("b").pivot("lang", classes).agg(F.first("cb"))

    sums = [
        F.sum(
            _ln_dec(
                F.lit(1) + F.coalesce(F.col(f"`{c}`"), F.lit(0)),
                F.lit(gram_tot.get(c, 0) + NB_B),
            )
        ).alias(f"s_{i}")
        for i, c in enumerate(classes)
    ]
    per_doc = (
        bg.join(F.broadcast(model), "b", "left")
        .groupBy("doc_id", "lang")
        .agg(*sums)
    )
    scores = [
        (_ln_dec(F.lit(prior[c]), F.lit(n_docs_total)) + F.col(f"s_{i}")).alias(f"sc_{i}")
        for i, c in enumerate(classes)
    ]
    per_doc = per_doc.select("doc_id", "lang", *scores)
    score_cols = [F.col(f"sc_{i}") for i in range(len(classes))]
    best = F.greatest(*score_cols) if len(classes) > 1 else score_cols[0]
    # first class in ascending order attaining the max wins ties —
    # mirrors the oracle's ORDER BY score DESC, c ASC row_number
    pred = None
    for i, c in enumerate(classes):
        pred = (F.when if pred is None else pred.when)(score_cols[i] == best, F.lit(c))
    return (
        per_doc.select("doc_id", "lang", best.alias("score"), pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(F.col("score")).cast("double") / F.count(F.lit(1)), 6).alias("mean_score"),
        )
        .orderBy("lang", "pred_lang")
    )


LANG_NB_SQL = f"""
WITH labeled AS (
    SELECT * FROM documents WHERE lang IS NOT NULL
), toks AS (
    SELECT doc_id, lang, {TOKENS_SQL.format(col="text")} AS ts FROM labeled
), bg AS (
    SELECT doc_id, lang, {hash64_sql("unnest(ts[1:{WINDOW_MAX_STARTS}])".format(WINDOW_MAX_STARTS=WINDOW_MAX_STARTS))} % {NB_B} AS b FROM toks
), cls AS (
    SELECT lang AS c, COUNT(*) AS nd FROM labeled GROUP BY lang
), tot AS (
    SELECT COUNT(*) AS n FROM labeled
), cnt AS (
    SELECT lang AS c, b, COUNT(*) AS cb FROM bg GROUP BY lang, b
), tg AS (
    SELECT c, SUM(cb) AS t FROM cnt GROUP BY c
), scored AS (
    SELECT g.doc_id, g.lang, cls.c,
           CAST(ln(CAST(1 + COALESCE(cnt.cb, 0) AS DOUBLE)
                   / (COALESCE(tg.t, 0) + {NB_B})) AS DECIMAL(28,12)) AS w
    FROM bg g
    CROSS JOIN cls
    LEFT JOIN cnt ON cnt.c = cls.c AND cnt.b = g.b
    LEFT JOIN tg ON tg.c = cls.c
), docsc AS (
    SELECT doc_id, lang, c, SUM(w) AS s FROM scored GROUP BY doc_id, lang, c
), withprior AS (
    SELECT d.doc_id, d.lang, d.c,
           CAST(ln(CAST(cls.nd AS DOUBLE) / tot.n) AS DECIMAL(28,12)) + d.s AS score
    FROM docsc d JOIN cls ON cls.c = d.c CROSS JOIN tot
), ranked AS (
    SELECT doc_id, lang, c AS pred_lang, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
    FROM withprior
)
SELECT lang, pred_lang, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS mean_score
FROM ranked WHERE rn = 1
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""
