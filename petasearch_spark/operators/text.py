"""Text-analysis operators: quality scoring, language-ID heuristic, token
counting (whitespace + BPE-ish regex), document fingerprinting.

All pure column expressions (JVM-side) with DuckDB-oracle parity. The
language-ID here is an honest *heuristic* (vowel-ratio + marker stopwords)
— a real n-gram model would be a broadcast lookup table with the same plan
shape; the deterministic heuristic keeps the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.functions.localframe import literal_df

from petasearch_spark.session import cut_lineage

from petasearch_spark.operators.portable import (
    TOKENS_SQL,
    WS_CHARS,
    WS_PATTERN,
    hash64,
    hash64_sql,
    tokens,
)
from petasearch_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to")
# the negated class spells out the SHARED whitespace set: a bare \s
# here is Java's class on the Spark side but RE2's in DuckDB, which
# disagree on \x0B (round-5 audit)
BPE_RE = f"[a-z]+|[0-9]+|[^a-z0-9{WS_CHARS}]"


def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality aggregates: token counts, mean token length,
    stopword ratio, short-doc count. The per-doc metrics are exact int
    ratios -> deterministic doubles."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    per_doc = docs.select(
        "source",
        "doc_id",
        n_toks.alias("n_toks"),
        n_stop.alias("n_stop"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            (F.sum("n_toks").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            # try_divide: an all-empty-text source has SUM(n_toks)=0 and a
            # plain division ABORTS under Spark 4 ANSI while DuckDB yields
            # NULL (round-5 audit)
            F.try_divide(F.sum("n_stop").cast("double"), F.sum("n_toks")).alias("stopword_ratio"),
            F.sum(F.when(F.col("n_toks") < 20, 1).otherwise(0)).alias("n_short_docs"),
        )
        .orderBy("source")
    )


TEXT_QUALITY_SQL = f"""
WITH per_doc AS (
    SELECT source, doc_id,
           len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'), x -> x <> '')) AS n_toks,
           len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'),
               x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)}))) AS n_stop
    FROM documents
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(n_stop) AS DOUBLE) / SUM(n_toks) AS stopword_ratio,
       CAST(SUM(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs
FROM per_doc
GROUP BY source
ORDER BY source
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic language-ID heuristic: vowel-ending-token ratio
    thresholds. Returns the per-(actual, predicted) confusion counts."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    toks = tokens(F.col("text"))
    vowel_end = F.size(F.filter(toks, lambda t: t.rlike("[aeiou]$")))
    # try_divide: an empty/whitespace-only doc has 0 tokens — plain 0/0
    # ABORTS under ANSI; NULL falls through every threshold to 'zh',
    # exactly like the oracle's CASE on its NULL ratio (round-5 audit)
    ratio = F.round(F.try_divide(vowel_end.cast("double"), F.size(toks)), 6)
    pred = (
        F.when(ratio >= 0.5, "es")
        .when(ratio >= 0.4, "fr")
        .when(ratio >= 0.3, "de")
        .when(ratio >= 0.2, "en")
        .otherwise("zh")
    )
    return (
        docs.select(F.col("lang").alias("actual_lang"), pred.alias("pred_lang"))
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual_lang", "pred_lang")
    )


LANG_ID_SQL = f"""
WITH scored AS (
    SELECT lang AS actual_lang,
           ROUND(CAST(len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'), x -> regexp_matches(x, '[aeiou]$'))) AS DOUBLE)
                 / len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'), x -> x <> '')), 6) AS ratio
    FROM documents
)
SELECT actual_lang,
       CASE WHEN ratio >= 0.5 THEN 'es' WHEN ratio >= 0.4 THEN 'fr'
            WHEN ratio >= 0.3 THEN 'de' WHEN ratio >= 0.2 THEN 'en'
            ELSE 'zh' END AS pred_lang,
       COUNT(*) AS n
FROM scored
GROUP BY 1, 2
ORDER BY actual_lang, pred_lang
"""


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    lexer (letter runs / digit runs / single punctuation)."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    ws = F.size(tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(ws).alias("ws_tokens"),
            F.sum(bpe).alias("bpe_tokens"),
            F.try_divide(F.sum(bpe).cast("double"), F.sum(ws)).alias("bpe_per_ws"),
        )
        .orderBy("lang")
    )


TOKEN_COUNT_SQL = f"""
SELECT lang,
       CAST(SUM(len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'), x -> x <> ''))) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT) AS bpe_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS DOUBLE)
           / SUM(len(list_filter(regexp_split_to_array(text, '{WS_PATTERN}'), x -> x <> ''))) AS bpe_per_ws
FROM documents
GROUP BY lang
ORDER BY lang
"""


#: fingerprint window-start bound, applied on BOTH engines — the SQL
#: twin's range(1, N+1) enumeration is finite by construction, so the
#: Spark side caps its sequence to the same starts (round-5 audit: the
#: oracle silently truncated >8198-char docs while the engine did not)
FP_MAX_STARTS = 8191


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min/max 64-bit hash over char 8-gram
    windows (rolling-hash document signature), window starts bounded by
    FP_MAX_STARTS on both engines. Short docs (<8 chars) get the hash of
    the whole text."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    n = 8
    win = F.when(
        F.length("text") >= n,
        F.transform(
            F.sequence(F.lit(0), F.least(F.length("text") - n, F.lit(FP_MAX_STARTS - 1))),
            lambda i: hash64(F.col("text").substr(i + 1, F.lit(n))),
        ),
    ).otherwise(F.array(hash64(F.col("text"))))
    return docs.select(
        "doc_id",
        F.array_min(win).alias("fp_min"),
        F.array_max(win).alias("fp_max"),
    ).orderBy("doc_id")


DOC_FINGERPRINT_SQL = f"""
WITH hashes AS (
    SELECT doc_id, {hash64_sql("substr(text, i, 8)")} AS h
    FROM documents, range(1, {FP_MAX_STARTS + 1}) r(i)
    WHERE i + 7 <= len(text)
    UNION ALL
    -- text IS NULL: Spark's otherwise-branch emits (doc_id, NULL, NULL)
    -- for a NULL text (hash64(NULL) = NULL); without the OR the doc
    -- VANISHED from the oracle (NULL < 8 is not true) — the same
    -- missing-verdict class as the gopher short-doc fix (round-6 fuzz)
    SELECT doc_id, {hash64_sql("text")} AS h
    FROM documents WHERE len(text) < 8 OR text IS NULL
)
SELECT doc_id, MIN(h) AS fp_min, MAX(h) AS fp_max
FROM hashes
GROUP BY doc_id
ORDER BY doc_id
"""


TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (first 100 docs for output size).

    tf = term count in doc; idf = ln(N / df) over the full corpus;
    deterministic ranking (score DESC, term ASC) on 6-decimal rounding.
    Two shuffles total: term counts, then df join + per-doc top-k window.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(df_, "term")
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .orderBy("doc_id", "rk")
    )


TFIDF_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest({TOKENS_SQL.format(col="text")}) AS term FROM documents
)
, tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term)
, df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
, n AS (SELECT COUNT(*) AS n_docs FROM documents)
, scored AS (
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE tf.doc_id < 100
)
SELECT doc_id, term, tfidf, rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk FROM scored)
WHERE rk <= {TFIDF_TOP_K}
ORDER BY doc_id, rk
"""


# PII patterns chosen from the RE2 ∩ java.util.regex common subset so the
# Spark plan and the DuckDB oracle compile the SAME automaton: no
# backreferences, no lookaround, non-capturing groups only.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d -]{7,}\d"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass of a curation pipeline: count and redact emails,
    IPv4 addresses and international-format phone numbers per document.

    Counts are taken on the original text; redaction cascades
    email -> ip -> phone so a match consumed by an earlier class is not
    double-redacted. Pure column expressions (regexp_extract_all /
    regexp_replace stay in whole-stage codegen) — scan -> project, no
    shuffle but the output sort; at 100 TB this is a free rider on any
    other full-scan stage. The synthetic corpus contains no PII, so the
    count columns are honestly zero here; the redaction behavior itself is
    pinned on constructed PII-laden rows in tests/test_text_extra.py, and
    clean_hash carries per-doc value signal through the oracle gate."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    t = F.col("text")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_IPV4_RE, "<IP>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return (
        docs.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
            F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), 0)).alias("n_ips"),
            F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
            F.length(clean).alias("clean_len"),
            hash64(clean).alias("clean_hash"),
        )
        .orderBy("doc_id")
    )


PII_REDACTION_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_IPV4_RE}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_replace(regexp_replace(regexp_replace(text,
            '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
            '{PII_IPV4_RE}', '<IP>', 'g'),
            '{PII_PHONE_RE}', '<PHONE>', 'g')) AS INT) AS clean_len,
       {hash64_sql("regexp_replace(regexp_replace(regexp_replace(text, '" + PII_EMAIL_RE + "', '<EMAIL>', 'g'), '" + PII_IPV4_RE + "', '<IP>', 'g'), '" + PII_PHONE_RE + "', '<PHONE>', 'g')")} AS clean_hash
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


CHUNK_W = 32   # tokens per retrieval chunk
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-corpus chunking: overlapping {CHUNK_W}-token windows at stride
    {CHUNK_STRIDE} per document (the standard retrieval-index unit —
    overlap keeps answers that straddle a boundary findable). Emits
    (doc_id, chunk_id, start_tok, n_tokens, chunk_hash); the final short
    window is kept iff it adds tokens beyond the previous chunk.

    Purely per-document column logic (explode over a sequence of
    offsets) — embarrassingly parallel, no shuffle except the output
    sort; the chunk_hash is the portable md5-based hash64 so downstream
    dedup/embedding joins are engine-independent.
    """
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    # chunk starts: 0, STRIDE, 2*STRIDE, ... while start < n_toks and
    # (start == 0 or start + W covers new tokens: start < n_toks)
    n = F.size("ts")
    n_chunks = F.when(n <= CHUNK_W, F.lit(1)).otherwise(
        F.ceil((n - CHUNK_W).cast("double") / CHUNK_STRIDE).cast("int") + 1
    )
    chunks = toks.filter(n > 0).select(
        "doc_id",
        n.alias("n_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        F.col("ts"),
    )
    start = F.col("chunk_id") * CHUNK_STRIDE
    piece = F.slice(F.col("ts"), start + 1, CHUNK_W)
    return chunks.select(
        "doc_id",
        "chunk_id",
        start.alias("start_tok"),
        F.size(piece).alias("n_tokens"),
        hash64(F.concat_ws(" ", piece)).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


DOC_CHUNK_SQL = f"""
WITH toks AS (
    SELECT doc_id, {TOKENS_SQL.format(col="text")} AS ts FROM documents
), base AS (
    SELECT doc_id, len(ts) AS n_toks, ts,
           CASE WHEN len(ts) <= {CHUNK_W} THEN 1
                ELSE CAST(CEIL(CAST(len(ts) - {CHUNK_W} AS DOUBLE) / {CHUNK_STRIDE}) AS INT) + 1
           END AS n_chunks
    FROM toks WHERE len(ts) > 0
), chunks AS (
    SELECT doc_id, n_toks, ts, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
    FROM base
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS INT) AS start_tok,
       CAST(len(ts[chunk_id * {CHUNK_STRIDE} + 1 : chunk_id * {CHUNK_STRIDE} + {CHUNK_W}]) AS INT) AS n_tokens,
       {hash64_sql(f"array_to_string(ts[chunk_id * {CHUNK_STRIDE} + 1 : chunk_id * {CHUNK_STRIDE} + {CHUNK_W}], ' ')")} AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_id
"""


# --- hashed-TF-IDF document clustering + cluster-balanced sampling -------

HASH_DIMS = 64       #: feature-hashing trick dimensionality
N_DOC_CLUSTERS = 8   #: coarse clusters; scale with corpus like IVF's K
CLUSTER_SAMPLE_K = 25  #: docs kept per cluster by the balanced sampler


def doc_cluster_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-style document clustering for corpus diversity work: hash
    each document's TF-IDF weights into a {HASH_DIMS}-dim feature vector
    (the feature-hashing trick — fixed width regardless of vocabulary
    size, the property that matters at 100 TB), assign to the nearest of
    {N_DOC_CLUSTERS} centroid documents by cosine, and emit a
    cluster-BALANCED sample flag (first {CLUSTER_SAMPLE_K} doc_ids per
    cluster) — the "sample evenly across topics, not by corpus mass"
    primitive of diversity-aware curation (cluster-balanced selection as
    in SemDeDup/SSL-prototype pipelines).

    Determinism for the oracle: per-term weights round to 6 decimals and
    sum in DECIMAL per hashed dim (fold-order-exact); cosine runs in the
    same sequential-fold Arrow kernel as every ANN operator
    (similarity.nearest_centroid_udf == the SQL's list_dot_product shape,
    rounded HALF_UP to 6, ties to the smallest centroid id).

    Plan: term counts and document frequencies are the SAME two shuffles
    tfidf_top_terms pays; densification is a per-doc map lookup over a
    64-element sequence (no shuffle); assignment is one narrow Arrow map
    with the centroid matrix in the closure; the balanced-sample window
    partitions by cluster (bounded groups). Zero-norm documents (every
    term corpus-wide, idf 0) are excluded — cosine is undefined for
    them; none exist in real corpora."""
    from petasearch_spark.operators.similarity import nearest_centroid_udf

    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    fe = (
        tf.join(df_, "term")
        .select(
            "doc_id",
            (hash64(F.col("term")) % HASH_DIMS).cast("int").alias("dim"),
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("w"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.round(F.sum(F.col("w").cast("decimal(18,6)")), 6).cast("double").alias("v"))
    )
    vecs = (
        fe.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("dim", "v"))).alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(HASH_DIMS - 1)),
                lambda d: F.coalesce(F.element_at("m", d), F.lit(0.0)),
            ).alias("fv"),
        )
        .filter(F.exists("fv", lambda x: x != 0.0))
    )
    cent = vecs.filter(F.col("doc_id") < N_DOC_CLUSTERS).select(
        F.col("doc_id").alias("cent_id"), F.col("fv").alias("cv")
    )
    nearest = nearest_centroid_udf([(r["cent_id"], r["cv"]) for r in cent.collect()])
    assign = vecs.select("doc_id", nearest("fv").alias("cluster"))
    w = Window.partitionBy("cluster").orderBy("doc_id")
    return (
        assign.withColumn("rank_in_cluster", F.row_number().over(w))
        .withColumn("sampled", (F.col("rank_in_cluster") <= CLUSTER_SAMPLE_K).cast("int"))
        .orderBy("doc_id")
    )


_COS_SQL = "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"

DOC_CLUSTER_TFIDF_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest({TOKENS_SQL.format(col="text")}) AS term FROM documents
)
, tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term)
, df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
, n AS (SELECT COUNT(*) AS n_docs FROM documents)
, fe AS (
    SELECT tf.doc_id, CAST({hash64_sql("term")} % {HASH_DIMS} AS INT) AS dim,
           CAST(ROUND(SUM(CAST(ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS DECIMAL(18,6))), 6) AS DOUBLE) AS v
    FROM tf JOIN df USING (term) CROSS JOIN n
    GROUP BY 1, 2
)
, alld AS (
    SELECT d.doc_id, r.range AS dim
    FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN range(0, {HASH_DIMS}) r
)
, dense AS (
    SELECT a.doc_id, a.dim, COALESCE(fe.v, 0.0) AS v
    FROM alld a LEFT JOIN fe ON fe.doc_id = a.doc_id AND fe.dim = a.dim
)
, vecs AS (
    SELECT doc_id, list(v ORDER BY dim) AS fv FROM dense GROUP BY doc_id
    HAVING len(list_filter(list(v ORDER BY dim), x -> x <> 0)) > 0
)
, cent AS (SELECT doc_id AS cent_id, fv AS cv FROM vecs WHERE doc_id < {N_DOC_CLUSTERS})
, assign AS (
    SELECT doc_id, cent_id AS cluster FROM (
        SELECT v.doc_id, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY v.doc_id
                                  ORDER BY {_COS_SQL.format(a="v.fv", b="c.cv")} DESC, c.cent_id) AS rn
        FROM vecs v CROSS JOIN cent c
    ) WHERE rn = 1
)
SELECT doc_id, cluster,
       ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY doc_id) AS rank_in_cluster,
       CAST(ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY doc_id) <= {CLUSTER_SAMPLE_K} AS INT) AS sampled
FROM assign
ORDER BY doc_id
"""


# --- Distributed BPE tokenizer training -------------------------------------

#: merge rounds learned by bpe_train_merges; the DuckDB oracle is a chained
#: CTE per round, so keep this small enough that the oracle stays cheap at
#: the parity SFs (6 rounds ~ the textbook toy-corpus demonstration depth)
N_BPE_MERGES = 6


def _apply_merge(toks, lhs: str, rhs: str):
    """Greedy left-to-right non-overlapping application of one merge rule
    to a token array, as a pure column fold: walk the array once, and
    whenever the accumulated tail is `lhs` and the next token is `rhs`,
    replace the tail with the merged token. Token-boundary exact (the
    comparison is on whole array elements), matching the SQL twin's
    space-delimited fold."""
    merged = lhs + rhs
    first = F.slice(toks, 1, 1)
    rest = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        first,
        lambda acc, x: F.when(
            (x == F.lit(rhs)) & (F.element_at(acc, -1) == F.lit(lhs)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_BPE_MERGES
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (not just counting): learn the
    first `n_merges` merge rules over the documents corpus, returning
    (step, lhs, rhs, merged, pair_count) per learned rule.

    The reference engine has no tokenizer trainer; this is part of the
    beyond-parity LLM-data-pipeline surface (a 100 TB pretraining corpus
    needs its tokenizer learned from the same distributed table it is
    cleaned on). Algorithm = textbook word-level BPE (Sennrich et al.
    2016): collapse the corpus to a (word, count) vocabulary first — ONE
    corpus-wide shuffle, after which every round works on the vocabulary
    table, which is bounded by DISTINCT words, not corpus size. Each
    round: count adjacent token pairs weighted by word count (one agg
    shuffle over the small vocab), pick the most frequent pair (count
    desc, then lexicographic lhs/rhs — fully deterministic), collect that
    ONE scalar row to the driver, and apply the merge as a narrow column
    fold. The vocabulary is re-persisted per round with the previous
    cache released, so lineage and storage stay flat regardless of
    n_merges; the driver only ever holds the n_merges rule rows.

    Words are lowercase a-z runs (digits/punctuation excluded), so token
    strings are collation-safe across engines."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    return train_bpe(spark, docs, n_merges)


#: the BPE word definition, stated ONCE per engine: lowercase a-z runs,
#: capped at BPE_MAX_WORD_LEN chars so the SQL twin's range(1, 8192)
#: pair enumeration is exhaustive — an unbounded letter run would be
#: pair-counted fully by Spark but truncated by the oracle
BPE_WORD_RE = "[^a-z]+"
BPE_MAX_WORD_LEN = 8191


def _corpus_words(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """Word occurrences (one row each): (*extra_cols, w) — the single
    statement of the BPE word rule on the Spark side."""
    return docs.select(
        *extra_cols, F.explode(F.split(F.lower("text"), BPE_WORD_RE)).alias("w")
    ).filter((F.col("w") != "") & (F.length("w") <= BPE_MAX_WORD_LEN))


def _initial_vocab(docs: DataFrame) -> DataFrame:
    """(w, wc, toks): the word-collapsed vocabulary with single-char
    token arrays — round 0 of the trainer."""
    words = _corpus_words(docs).groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    return words.select(
        "w",
        "wc",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("toks"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-token pair counts weighted by word count —
    the one shuffle each training round pays (plan shape pinned by
    tests/test_plan_pushdown.py against THIS function)."""
    pair = F.zip_with(
        F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
        F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        vocab.select("wc", F.explode(pair).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("cnt"))
    )


def _train_bpe_core(
    spark: SparkSession, docs: DataFrame, n_merges: int, keep_vocab: bool
):
    """Shared trainer loop: returns (rules, vocab | None). With
    ``keep_vocab`` the FINAL merge is applied too and the persisted
    (w, wc, toks) vocabulary is returned — the caller must unpersist it
    after consuming (bpe_fertility does)."""
    vocab = _initial_vocab(docs).persist()
    rules: list[tuple] = []
    try:
        for step in range(1, n_merges + 1):
            best = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            rules.append((step, a, b, a + b, cnt))
            if step < n_merges or keep_vocab:
                nxt = vocab.withColumn(
                    "toks", _apply_merge(F.col("toks"), a, b)
                ).persist()
                try:
                    nxt.count()  # materialize from the cached vocab (narrow map)
                except Exception:
                    nxt.unpersist()  # the outer handler releases `vocab`
                    raise
                vocab.unpersist()
                vocab = nxt
    except Exception:
        vocab.unpersist()
        raise
    if keep_vocab:
        return rules, vocab
    vocab.unpersist()
    return rules, None


def train_bpe(spark: SparkSession, docs: DataFrame, n_merges: int) -> DataFrame:
    """The trainer core over any docs(text) frame — see bpe_train_merges."""
    rules, _ = _train_bpe_core(spark, docs, n_merges, keep_vocab=False)
    return literal_df(
        spark, rules, "step int, lhs string, rhs string, merged string, pair_count long"
    ).orderBy("step")


def bpe_fertility(
    spark: SparkSession, sf_dir: str, n_merges: int = N_BPE_MERGES
) -> DataFrame:
    """Tokenizer EVALUATION: train the `n_merges`-rule BPE on the corpus,
    apply all learned rules back to the vocabulary, and report per-source
    fertility — tokens emitted per word, the standard "is this tokenizer
    efficient on this corpus" metric (lower is better; 1.0 = every word
    is a single learned token).

    Plan shape: training as in bpe_train_merges (vocabulary-bounded),
    then ONE join of the word-occurrence stream against the tiny
    (w -> token-count) vocabulary — broadcast-able whenever the distinct
    vocabulary fits, an ordinary shuffle join otherwise — and one
    per-source aggregation. Fertility is a single BIGINT/BIGINT division,
    so the doubles are bit-identical cross-engine."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    rules, vocab = _train_bpe_core(spark, docs, n_merges, keep_vocab=True)
    try:
        word_tok = vocab.select("w", F.size("toks").alias("n_tok"))
        dw = _corpus_words(docs, "source")
        out = (
            dw.join(word_tok, "w")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_tok").alias("bpe_tokens"),
                F.sum(F.length("w")).alias("n_chars"),
                (
                    F.sum("n_tok").cast("double") / F.count(F.lit(1))
                ).alias("fertility"),
            )
            .orderBy("source")
        )
        # materialize before releasing the vocabulary cache the join reads
        rows = out.collect()
    finally:
        vocab.unpersist()
    return literal_df(spark, [tuple(r) for r in rows], out.schema)


def bpe_encode_corpus(
    spark: SparkSession, sf_dir: str, n_merges: int = N_BPE_MERGES
) -> DataFrame:
    """Tokenizer APPLICATION — the step a training-data pipeline runs
    after training: train the ``n_merges``-rule BPE on the corpus, then
    tokenize every document with the learned merges and emit per doc
    ``(doc_id, n_words, n_tokens, fertility, token_ids)`` where
    ``token_ids`` is the space-joined integer id sequence in document
    order. This completes the train -> evaluate -> apply triple
    (bpe_train_merges / bpe_fertility / here — round-4 VERDICT item 5).

    Token ids are assigned by lexicographic rank over the DISTINCT final
    tokens (row_number from 1) — deterministic and cross-engine exact.
    The id table is bounded by |alphabet| + n_merges entries (each merge
    mints exactly one new token), so it is a scalar-bounded driver
    collect turned into a literal map column: tokenization itself adds
    NO join for the id step. Plan shape: the vocabulary-bounded trainer,
    then ONE join of the (doc_id, pos, word) occurrence stream against
    the distinct-word vocabulary (broadcast-able when the vocab fits,
    AQE otherwise) and one per-doc aggregation that reassembles ids in
    position order — the same two exchanges a production distributed
    tokenizer pays regardless of corpus size."""
    docs = load_table(spark, "documents", sf_dir, widen_scan=True)
    return encode_corpus(spark, docs, n_merges)


def encode_corpus(spark: SparkSession, docs: DataFrame, n_merges: int) -> DataFrame:
    """The encode core over any docs(doc_id, text) frame (separated for
    constructed-corpus tests) — see :func:`bpe_encode_corpus`."""
    rules, vocab = _train_bpe_core(spark, docs, n_merges, keep_vocab=True)
    return _encode_with_vocab(spark, docs, vocab)


def encode_corpus_with_rules(
    spark: SparkSession, docs: DataFrame, rules: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize ``docs`` with EXTERNALLY trained merge rules — the
    production decoupling (train once on a reference corpus, apply to
    every new dump; same output contract as :func:`encode_corpus`).
    The docs' own distinct-word vocabulary is built (the one
    corpus-wide shuffle), each rule is folded over it IN ORDER — the
    greedy non-overlapping fold, exactly as during training — and the
    shared id/join/assembly core runs from there. Words containing
    characters outside the trained alphabet still tokenize (their
    untouched single chars just mint ids of their own, the standard
    byte-fallback analogue). Token ids are lexicographic ranks over the
    tokens PRESENT after folding, so two corpora encoded under the same
    rules agree on ids exactly when they surface the same token set —
    ship the id table alongside the rules when cross-corpus id
    stability matters. Each rule adds one expression layer to the fold,
    so this form suits the engine's demonstration-depth rule counts;
    a 32k-merge production tokenizer would move the fold into one
    Arrow-batched kernel over the same vocabulary table (identical plan
    shape, constant expression depth)."""
    vocab = _initial_vocab(docs)
    for lhs, rhs in rules:
        vocab = vocab.withColumn("toks", _apply_merge(F.col("toks"), lhs, rhs))
    vocab = vocab.persist()
    return _encode_with_vocab(spark, docs, vocab)


def _encode_with_vocab(spark: SparkSession, docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Shared encode tail: id assignment over the folded (w, toks)
    vocabulary (which must arrive PERSISTED; released here), the
    occurrence-stream join, and the position-ordered reassembly."""
    out_schema = (
        "doc_id long, n_words bigint, n_tokens bigint, fertility double,"
        " token_ids string"
    )
    try:
        # bounded collect: <= 26 + n_merges distinct token strings
        toks = sorted(
            r["t"] for r in vocab.select(F.explode("toks").alias("t")).distinct().collect()
        )
        if not toks:
            return spark.createDataFrame([], out_schema)
        id_map = F.create_map(
            *[F.lit(x) for t, i in zip(toks, range(1, len(toks) + 1)) for x in (t, i)]
        )
        word_ids = vocab.select(
            "w",
            F.transform("toks", lambda t: F.element_at(id_map, t)).alias("ids"),
            F.size("toks").cast("long").alias("n_tok"),
        )
        # word occurrences with document-order positions (pre-filter
        # split indices on both engines, so ordering matches exactly)
        ws = (
            docs.select(
                "doc_id",
                F.posexplode(F.split(F.lower("text"), BPE_WORD_RE)).alias("pos", "w"),
            )
            .filter((F.col("w") != "") & (F.length("w") <= BPE_MAX_WORD_LEN))
        )
        ordered = F.array_sort(F.collect_list(F.struct("pos", "ids")))
        flat_ids = F.flatten(F.transform(ordered, lambda s: s["ids"]))
        out = (
            ws.join(word_ids, "w")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_tok").alias("n_tokens"),
                (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("fertility"),
                F.array_join(
                    F.transform(flat_ids, lambda x: x.cast("string")), " "
                ).alias("token_ids"),
            )
            .orderBy("doc_id")
        )
        # materialize EXECUTOR-side before releasing the vocabulary cache
        # the join reads: the output is one row per document (unbounded),
        # so a driver collect would not scale — localCheckpoint cuts the
        # lineage at the executors (a production run would write straight
        # to its sink here instead)
        out = cut_lineage(out)
    finally:
        vocab.unpersist()
    return out


def _bpe_encode_sql(n_merges: int = N_BPE_MERGES) -> str:
    """The DuckDB encode twin: the trained chain with the final rule
    applied, an id per distinct token by lexicographic row_number, and a
    position-ordered flatten back to one id string per document."""
    parts = _bpe_stage_ctes(n_merges, apply_final=True)
    parts.append(
        f"""tok_ids AS (
    SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY tok) AS INT) AS id
    FROM (SELECT DISTINCT toks[i] AS tok FROM t{n_merges}, range(1, 8192) r(i)
          WHERE i <= len(toks))
)"""
    )
    parts.append(
        f"""word_ids AS (
    SELECT w, list(id ORDER BY i) AS ids, COUNT(*) AS n_tok
    FROM (SELECT w, toks[i] AS tok, i FROM t{n_merges}, range(1, 8192) r(i)
          WHERE i <= len(toks)) x
    JOIN tok_ids USING (tok)
    GROUP BY w
)"""
    )
    parts.append(
        f"""dw AS (
    SELECT doc_id, pos, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '{BPE_WORD_RE}')) AS w,
               unnest(range(1, len(regexp_split_to_array(lower(text), '{BPE_WORD_RE}')) + 1)) AS pos
        FROM documents
    ) WHERE w <> '' AND len(w) <= {BPE_MAX_WORD_LEN}
)"""
    )
    return (
        "WITH "
        + "\n, ".join(parts)
        + """
SELECT d.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(wi.n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(wi.n_tok) AS DOUBLE) / COUNT(*) AS fertility,
       array_to_string(list_transform(flatten(list(wi.ids ORDER BY d.pos)),
                                      x -> CAST(x AS VARCHAR)), ' ') AS token_ids
FROM dw d JOIN word_ids wi USING (w)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""
    )


def _bpe_words_src_sql(cols: str = "") -> str:
    """The SQL statement of the BPE word rule (the _corpus_words twin) —
    stated ONCE and reused by the vocabulary CTE and the fertility
    occurrence stream. `cols` is a 'col, ' prefix for extra columns."""
    return f"""SELECT {cols}w FROM (
        SELECT {cols}unnest(regexp_split_to_array(lower(text), '{BPE_WORD_RE}')) AS w
        FROM documents
    ) WHERE w <> '' AND len(w) <= {BPE_MAX_WORD_LEN}"""


def _bpe_stage_ctes(n_merges: int, apply_final: bool) -> list[str]:
    """The shared chained-CTE stages of the DuckDB BPE twin: one
    pair-count + best-pair block per round, plus the fold applying each
    learned rule. The fold is the same boundary-exact greedy rule as
    _apply_merge, expressed as list_reduce over the token list with a
    space-delimited accumulator (tokens are a-z only, so the space
    boundary and LIKE pattern are exact). With ``apply_final`` the last
    rule is applied too (t{n} exists — the fully tokenized vocabulary
    bpe_fertility consumes); otherwise the chain stops at b{n-1} like
    the trainer. Each fold stage LEFT-joins its (at most one-row) best
    pair and passes tokens through unchanged when the round ran dry —
    a cross join against an EMPTY b{i} would wipe the vocabulary chain
    and diverge from the trainer's break (round-4 review finding)."""
    parts = [
        f"""words AS (
    SELECT w, COUNT(*) AS wc
    FROM ({_bpe_words_src_sql()})
    GROUP BY w
)""",
        "t0 AS (SELECT w, wc, string_split(w, '') AS toks FROM words)",
    ]
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS (
    SELECT toks[i] AS a, toks[i+1] AS b, CAST(SUM(wc) AS BIGINT) AS cnt
    FROM t{i}, range(1, 8192) r(i)
    WHERE i + 1 <= len(toks)
    GROUP BY 1, 2
)"""
        )
        parts.append(
            f"b{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        if i < n_merges - 1 or apply_final:
            parts.append(
                f"""t{i + 1} AS (
    SELECT w, wc,
           CASE WHEN a IS NULL THEN toks
                ELSE string_split(list_reduce(toks, (acc, x) ->
        CASE WHEN x = b AND (acc = a OR acc LIKE '%' || ' ' || a)
             THEN CASE WHEN acc = a THEN a || b
                  ELSE substr(acc, 1, len(acc) - len(a) - 1) || ' ' || a || b END
             ELSE acc || ' ' || x END), ' ')
           END AS toks
    FROM t{i} LEFT JOIN b{i} ON TRUE
)"""
            )
    return parts


def _bpe_train_sql(n_merges: int = N_BPE_MERGES) -> str:
    """The DuckDB trainer twin — see _bpe_stage_ctes."""
    parts = _bpe_stage_ctes(n_merges, apply_final=False)
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + "\n, ".join(parts) + f"\nSELECT * FROM ({selects}) ORDER BY step"


def _bpe_fertility_sql(n_merges: int = N_BPE_MERGES) -> str:
    """The DuckDB fertility twin: the same trained chain with the final
    rule applied, joined back to the word-occurrence stream."""
    parts = _bpe_stage_ctes(n_merges, apply_final=True)
    parts.append(f"final AS (SELECT w, len(toks) AS n_tok FROM t{n_merges})")
    parts.append(f"dw AS ({_bpe_words_src_sql('source, ')})")
    return (
        "WITH "
        + "\n, ".join(parts)
        + """
SELECT d.source,
       COUNT(*) AS n_words,
       CAST(SUM(f.n_tok) AS BIGINT) AS bpe_tokens,
       CAST(SUM(len(d.w)) AS BIGINT) AS n_chars,
       CAST(SUM(f.n_tok) AS DOUBLE) / COUNT(*) AS fertility
FROM dw d JOIN final f USING (w)
GROUP BY d.source
ORDER BY d.source
"""
    )


BPE_TRAIN_SQL = _bpe_train_sql()
BPE_FERTILITY_SQL = _bpe_fertility_sql()
BPE_ENCODE_SQL = _bpe_encode_sql()
