"""Corpus-quality operators for training-data curation.

Two standard signals a 100 TB text pipeline computes before training:

* ``dup_span_coverage`` — exact duplicated-span detection: for every
  document, the fraction of token positions covered by a ``SPAN_W``-token
  window that also occurs verbatim in ANOTHER document. This is the
  hash-windowed (distributed) form of suffix-array exact-substring dedup:
  a suffix array is a single-node structure, but the spans it finds are
  exactly the fixed-width windows whose hash collides across documents,
  and windowed hashing is one groupBy + one join in Spark.
* ``gopher_quality`` — per-document repetition/quality signals in the
  style of the Gopher rules (most-frequent-2-gram mass, duplicate-3-gram
  mass, mean word length) plus the resulting keep/drop flag.

The reference engine has no document-curation surface; these extend the
pipeline family (dedup/corpus/text) and are oracle-checked cell-exact
against DuckDB.

Scale notes (100 TB): ``dup_span_coverage`` shuffles once to count
per-window document frequency and once to join the duplicate flags back;
join output is bounded by TRUE duplicate occurrences (one row per
occurrence, no fan-out — the dup side is one row per distinct window
hash). A boilerplate window shared by millions of docs contributes
linearly (its occurrences), not quadratically, unlike pair-generation —
so no df-cap is needed here. ``gopher_quality`` is a per-document
explode/re-aggregate keyed on doc_id: partial aggregation (map-side
combine) applies, and nothing is ever joined across documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.session import cut_lineage

from petasearch_spark.operators.portable import TOKENS_SQL, hash64, hash64_sql, tokens
from petasearch_spark.sources.tables import load_table

#: duplicated-span window width (tokens). Lee et al. use 50 BPE tokens on
#: real corpora; the synthetic docs are 10-99 tokens, so 8 keeps the same
#: window-to-document ratio.
SPAN_W = 8

#: Gopher-style keep thresholds (Rae et al. 2021 App. A uses 0.20 for the
#: top-2-gram and 0.18 for dup-3-gram character mass; we measure token
#: mass on synthetic text, same semantics).
TOP2_MAX = 0.20
DUP3_MAX = 0.30
#: Gopher min word count (Rae et al. use 50 for full documents; 3 is the
#: smallest count where both repetition signals exist — docs below it
#: fail CLOSED instead of silently vanishing from the verdict list)
GOPHER_MIN_TOKS = 3


#: window-start bound shared with the SQL twins' range(1, N+1)
#: enumeration — applied on BOTH engines so a >8191-token doc windows
#: identically everywhere instead of fully in Spark and truncated in
#: the oracle (round-5 audit; same rule as sketches.SKETCH_MAX_TOKENS)
WINDOW_MAX_STARTS = 8191


def _windows(ts, width: int):
    """Array of hash64(space-joined token window) for every start offset
    (1-based, capped at WINDOW_MAX_STARTS), empty when the doc is shorter
    than the window."""
    return F.when(
        F.size(ts) >= width,
        F.transform(
            F.sequence(
                F.lit(1), F.least(F.size(ts) - width + 1, F.lit(WINDOW_MAX_STARTS))
            ),
            lambda i: hash64(F.concat_ws(" ", F.slice(ts, i, width))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: tokens covered by any
    SPAN_W-window occurring in >= 2 distinct documents. Only documents
    with nonzero coverage are returned (the dedup-actionable set)."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    wins = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_toks"),
        F.posexplode(_windows(F.col("ts"), SPAN_W)).alias("idx", "wh"),
    )
    # one row per DISTINCT duplicated window hash -> the join back has no
    # fan-out; its output is bounded by true duplicate occurrences.
    dup = (
        wins.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("ddf"))
        .filter(F.col("ddf") >= 2)
        .select("wh")
    )
    covered = (
        wins.join(dup, "wh")
        # window at 0-based idx covers 1-based token positions [idx+1, idx+SPAN_W]
        .select(
            "doc_id",
            "n_toks",
            F.explode(F.sequence(F.col("idx") + 1, F.col("idx") + SPAN_W)).alias("p"),
        )
        .distinct()
        .groupBy("doc_id", "n_toks")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    return covered.select(
        "doc_id",
        "n_toks",
        "covered_tokens",
        F.round(F.col("covered_tokens").cast("double") / F.col("n_toks"), 6).alias("dup_fraction"),
    ).orderBy("doc_id")


DUP_SPAN_SQL = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), wins AS (
    SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks, i,
           {hash64_sql(f"array_to_string(ts[i:i+{SPAN_W - 1}], ' ')")} AS wh
    FROM toks, range(1, {WINDOW_MAX_STARTS + 1}) r(i)
    WHERE i + {SPAN_W - 1} <= len(ts)
), dup AS (
    SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
), pos AS (
    SELECT DISTINCT doc_id, n_toks, i + o AS p
    FROM wins JOIN dup USING (wh), range(0, {SPAN_W}) t(o)
)
SELECT doc_id, n_toks, COUNT(*) AS covered_tokens,
       ROUND(CAST(COUNT(*) AS DOUBLE) / n_toks, 6) AS dup_fraction
FROM pos
GROUP BY doc_id, n_toks
ORDER BY doc_id
"""


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher-style repetition/quality signals:

    * ``top_2gram_frac``  — mass of the most frequent 2-gram / all 2-grams
    * ``dup_3gram_frac``  — mass of 3-grams occurring more than once
    * ``mean_word_len``   — mean token length
    * ``keep``            — passes the repetition thresholds AND the
      Gopher min-length rule (``n_toks >= GOPHER_MIN_TOKS``)

    Every signal is an exact integer ratio rounded to 6 decimals, so the
    doubles are cross-engine deterministic. EVERY document gets a
    verdict row: docs too short to measure repetition (< 3 tokens — no
    3-grams exist) previously VANISHED from the output in both engines
    (inner joins over the gram sets), so a pipeline treating "not
    listed" as "keep" silently retained exactly the junk ultra-short
    docs the filter exists to flag; they now fail closed with
    zero-fraction signals (round-5 audit). raw_mwl uses try_divide —
    a zero-token doc's 0/0 ABORTED the job under Spark 4 ANSI while the
    oracle NULL-propagated.

    The token frame is persisted only WITHIN this call (base, g2 and g3
    all read it); the per-doc verdict frame is localCheckpoint'ed and
    the corpus-sized token cache released before returning — previously
    the cache was left for the caller's clearCache, which the curate CLI
    path never did, holding corpus-sized storage through every
    downstream stage (round-5 ADVICE, the k44 funnel bench flag).
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    # materialize the token array before the window HOFs: lambdas are
    # interpreted per element and an inlined tokens() would re-split the
    # text for every slice probe
    # persisted: base, g2 and g3 all read this frame — unpersisted, the
    # regex split would run three times over the corpus (round-5 review);
    # released below once the verdict frame is checkpointed
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts")).persist()
    base = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_toks"),
        F.try_divide(
            F.aggregate(
                F.col("ts"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double"),
            F.size("ts"),
        ).alias("raw_mwl"),
    )
    g2 = toks.select("doc_id", F.explode(_windows(F.col("ts"), 2)).alias("g2"))
    g2_counts = g2.groupBy("doc_id", "g2").agg(F.count(F.lit(1)).alias("c2"))
    top2 = g2_counts.groupBy("doc_id").agg(
        (F.max("c2").cast("double") / F.sum("c2")).alias("raw_top2")
    )
    g3 = toks.select("doc_id", F.explode(_windows(F.col("ts"), 3)).alias("g3"))
    g3_counts = g3.groupBy("doc_id", "g3").agg(F.count(F.lit(1)).alias("c3"))
    dup3 = g3_counts.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("c3") > 1, F.col("c3")).otherwise(0)).cast("double") / F.sum("c3")
        ).alias("raw_dup3")
    )
    out = base.join(top2, "doc_id", "left").join(dup3, "doc_id", "left")
    t2 = F.coalesce(F.col("raw_top2"), F.lit(0.0))
    d3 = F.coalesce(F.col("raw_dup3"), F.lit(0.0))
    out = out.select(
        "doc_id",
        "n_toks",
        F.round(t2, 6).alias("top_2gram_frac"),
        F.round(d3, 6).alias("dup_3gram_frac"),
        F.round("raw_mwl", 6).alias("mean_word_len"),
        (
            (F.col("n_toks") >= GOPHER_MIN_TOKS) & (t2 <= TOP2_MAX) & (d3 <= DUP3_MAX)
        ).alias("keep"),
    )
    # materialize the per-doc verdicts (narrow scalar rows) so the
    # corpus-sized token cache can be released HERE rather than leaking
    # into the caller; the _encode_with_vocab pattern (text.py).
    # cut_lineage routes to reliable checkpoint() when a durable dir is
    # configured (SPARK_GRAFT_CHECKPOINT_DIR).
    out = cut_lineage(out)
    toks.unpersist()
    return out.orderBy("doc_id")


def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-proxy quality score: per-document mean token negative
    log-likelihood under the corpus's own unigram distribution — the
    cheap first-pass perplexity filter of LLM data pipelines (docs whose
    tokens are globally rare/implausible score high). Two shuffles at any
    scale: corpus term frequencies (map-side combined), then a frequency
    join back (the unigram table is vocabulary-sized — broadcast).

    Determinism: each token's -ln(p) is truncated to DECIMAL(28,12)
    before summing, so the per-doc sum is exact integer arithmetic and
    independent of partition/reduction order in both engines (ln itself
    is cross-engine IEEE-stable here — the same precedent tfidf_top_terms
    relies on)."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    tf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("ctf"))
    total = tf.agg(F.sum("ctf")).collect()[0][0] or 1
    nll = (-F.log(F.col("ctf").cast("double") / F.lit(float(total)))).cast("decimal(28,12)")
    return (
        tok.join(F.broadcast(tf), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round((F.sum(nll).cast("double") / F.count(F.lit(1))), 6).alias("mean_nll"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), tok AS (
    SELECT doc_id, unnest(ts) AS t FROM toks
), tf AS (
    SELECT t, COUNT(*) AS ctf FROM tok GROUP BY t
), tot AS (SELECT SUM(ctf) AS total FROM tf)
SELECT doc_id, COUNT(*) AS n_toks,
       ROUND(CAST(SUM(CAST(-ln(CAST(ctf AS DOUBLE) / total) AS DECIMAL(28,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_nll
FROM tok JOIN tf USING (t) CROSS JOIN tot
GROUP BY doc_id
ORDER BY doc_id
"""


GOPHER_QUALITY_SQL = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), base AS (
    SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
           CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE) / len(ts) AS raw_mwl,
           ts
    FROM toks
), g2 AS (
    SELECT doc_id, {hash64_sql("array_to_string(ts[i:i+1], ' ')")} AS g, COUNT(*) AS c
    FROM base, range(1, {WINDOW_MAX_STARTS + 1}) r(i) WHERE i + 1 <= len(ts)
    GROUP BY doc_id, g
), top2 AS (
    SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS raw_top2 FROM g2 GROUP BY doc_id
), g3 AS (
    SELECT doc_id, {hash64_sql("array_to_string(ts[i:i+2], ' ')")} AS g, COUNT(*) AS c
    FROM base, range(1, {WINDOW_MAX_STARTS + 1}) r(i) WHERE i + 2 <= len(ts)
    GROUP BY doc_id, g
), dup3 AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c) AS raw_dup3
    FROM g3 GROUP BY doc_id
)
SELECT b.doc_id, b.n_toks,
       ROUND(COALESCE(t.raw_top2, 0.0), 6) AS top_2gram_frac,
       ROUND(COALESCE(d.raw_dup3, 0.0), 6) AS dup_3gram_frac,
       ROUND(b.raw_mwl, 6) AS mean_word_len,
       (b.n_toks >= {GOPHER_MIN_TOKS}
        AND COALESCE(t.raw_top2, 0.0) <= {TOP2_MAX}
        AND COALESCE(d.raw_dup3, 0.0) <= {DUP3_MAX}) AS keep
FROM base b LEFT JOIN top2 t USING (doc_id) LEFT JOIN dup3 d USING (doc_id)
ORDER BY b.doc_id
"""


def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span REMOVAL (Lee et al. 2021 semantics: of every
    substring occurring more than once in the corpus, keep one copy and
    cut the rest) — the rewrite twin of ``dup_span_coverage``.

    Rules, all deterministic:

    * a window (``SPAN_W`` tokens) is duplicated when it occurs >= 2
      times corpus-wide (within-doc repeats count, so self-repetition is
      trimmed too — coverage's >=2-distinct-docs rule only flags
      cross-doc copies);
    * the CANONICAL occurrence of a duplicated window is the smallest
      (doc_id, start); its token positions are protected;
    * a token position is removed iff some non-canonical duplicated
      window covers it and no canonical occurrence in the same document
      does.

    Returns only rewritten docs (n_removed > 0): doc_id, n_toks,
    n_removed, and the portable hash of the text rebuilt from surviving
    tokens (cell-exact against the SQL oracle's string_agg rebuild).

    Scale shape: window counting is ONE map-side-combined shuffle on the
    8-byte window hash; the join back is bounded by true duplicate
    occurrences, and only those fan out x SPAN_W into positions; the
    rebuild joins one removed-position-set row per rewritten doc against
    one token-array row per doc (both 1 row/doc) and filters the array
    with an index lambda — no token-stream shuffle.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    wins = toks.select(
        "doc_id",
        F.posexplode(_windows(F.col("ts"), SPAN_W)).alias("idx", "wh"),
    )
    occ = wins.groupBy("wh").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "idx")).alias("canon"),
    ).filter(F.col("n_occ") >= 2)
    # one row per duplicated-window occurrence; positions fan out x SPAN_W
    pos = (
        wins.join(occ, "wh")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("idx") + 1, F.col("idx") + SPAN_W)).alias("p"),
            (F.struct("doc_id", "idx") == F.col("canon")).alias("is_canon"),
        )
        .groupBy("doc_id", "p")
        .agg(F.max("is_canon").alias("protected"))
        .filter(~F.col("protected"))
    )
    rm = pos.groupBy("doc_id").agg(F.collect_set("p").alias("rm"))
    kept = toks.join(rm, "doc_id").select(
        "doc_id",
        F.size("ts").cast("long").alias("n_toks"),
        F.size("rm").cast("long").alias("n_removed"),
        hash64(
            F.concat_ws(
                " ", F.filter(F.col("ts"), lambda t, i: ~F.array_contains(F.col("rm"), i + 1))
            )
        ).alias("kept_hash"),
    )
    return kept.orderBy("doc_id")


DEDUP_SPAN_REMOVAL_SQL = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), wins AS (
    SELECT doc_id, i,
           {hash64_sql(f"array_to_string(ts[i:i+{SPAN_W - 1}], ' ')")} AS wh
    FROM toks, range(1, {WINDOW_MAX_STARTS + 1}) r(i)
    WHERE i + {SPAN_W - 1} <= len(ts)
), marked AS (
    SELECT doc_id, i, wh,
           COUNT(*) OVER (PARTITION BY wh) AS n_occ,
           row_number() OVER (PARTITION BY wh ORDER BY doc_id, i) AS rn
    FROM wins
), rm AS (
    SELECT doc_id, i + o AS p
    FROM marked, range(0, {SPAN_W}) t(o)
    WHERE n_occ >= 2
    GROUP BY doc_id, i + o
    HAVING MAX(CASE WHEN rn = 1 THEN 1 ELSE 0 END) = 0
), rms AS (
    SELECT doc_id, list(p) AS ps FROM rm GROUP BY doc_id
), rebuilt AS (
    -- indexed list_filter rebuild: no positional cross join, so the
    -- oracle's rebuild covers EVERY token — the old range(1, 8192)
    -- tokpos enumeration silently dropped the tail of a >8191-token
    -- doc from the rebuilt text while the engine kept it (round-5
    -- audit); windows stay bounded by WINDOW_MAX_STARTS on BOTH sides
    SELECT t.doc_id,
           CAST(len(t.ts) AS BIGINT) AS n_toks,
           CAST(len(r.ps) AS BIGINT) AS n_removed,
           -- COALESCE: DuckDB's array_to_string of an EMPTY list is NULL,
           -- but a fully-removed doc's kept text is '' on the engine side
           COALESCE(array_to_string(list_filter(t.ts, (x, i) -> NOT list_contains(r.ps, i)), ' '), '') AS kept
    FROM toks t JOIN rms r USING (doc_id)
)
SELECT doc_id, n_toks, n_removed, {hash64_sql("kept")} AS kept_hash
FROM rebuilt
WHERE n_removed > 0
ORDER BY doc_id
"""
