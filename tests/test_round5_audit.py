"""Round-5 cross-engine audit regressions: oracle-blind-spot and
engine-divergence bugs the synthetic fixtures (positive 2-3-decimal
money values, dense non-null ids/timestamps, integer 'srcN' sources,
short word-soup docs, finite embeddings) could never trigger. Each test
constructs the adversarial input and checks Spark against the REAL
DuckDB oracle SQL (or pins the loud contract)."""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _duck(sql: str, view: str, df, spark, tmp_path, name: str):
    """Write df as parquet, register as `view`, run the oracle SQL."""
    path = os.path.join(str(tmp_path), f"{name}.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return [dict(zip(cols, r)) for r in res.fetchall()]


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _run_events_op(spark, fn, df):
    import petasearch_spark.operators.events as E

    orig = E.load_table
    try:
        E.load_table = lambda _s, _n, _d, **_k: df
        return fn(spark, SF).collect()
    finally:
        E.load_table = orig


def test_json_stats_survives_and_matches_oracle_on_messy_props(spark, tmp_path):
    """ANSI-mode crash + rounding divergence: {"k":3.0} aborted the whole
    Spark job (CAST_INVALID_INPUT), and the old oracle's ::BIGINT rounded
    3.5 to 4. The integral-string rule must now hold on both engines."""
    from petasearch_spark.operators import events

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (1, t0, 1, "click", 1.0, '{"k": 2}'),
        (2, t0, 1, "click", 1.0, '{"k": 3.0}'),   # non-integral repr: ignored
        (3, t0, 1, "click", 1.0, '{"k": 3.5}'),   # ignored (old oracle said 4)
        (4, t0, 1, "click", 1.0, '{"k": "7"}'),   # quoted integral: counts
        (5, t0, 1, "click", 1.0, '{"k": true}'),  # ignored
        (6, t0, 1, "click", 1.0, "{}"),
        (7, t0, 1, "error", 1.0, '{"k": -4}'),
        (8, t0, 1, "error", 1.0, "not json"),
        # second-pass review edges: whitespace-padded quoted integral
        # (Spark's cast trims all chars <= 0x20) and a >int64 integral
        # (regexp passes, TRY_CAST must go NULL — not abort the oracle)
        (9, t0, 1, "error", 1.0, '{"k": "\\t11"}'),
        (10, t0, 1, "error", 1.0, '{"k": 99999999999999999999}'),
    ]
    df = _events_df(spark, rows)
    got = [r.asDict() for r in _run_events_op(spark, events.events_json_stats, df)]
    want = _duck(events.EVENTS_JSON_SQL, "events", df, spark, tmp_path, "ev_json")
    assert got == want
    by_type = {r["event_type"]: r for r in got}
    assert by_type["click"]["sum_k"] == 9 and by_type["click"]["min_k"] == 2
    assert by_type["error"]["sum_k"] == 7  # -4 + trimmed 11; huge int is NULL


def test_value_quantiles_and_mad_exclude_null_values(spark, tmp_path):
    """NULL values ordered NULLS FIRST in Spark's cumulative window but
    NULLS LAST in the oracle's row_number — both now exclude them, and
    the quantiles are those of the non-null values."""
    from petasearch_spark.operators.events import (
        EVENTS_VALUE_OUTLIERS_SQL,
        EVENTS_VALUE_QUANTILES_SQL,
        value_mad_outliers,
        value_quantiles,
    )

    rows = [("a", None), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", None), ("b", 5.0)]
    e = spark.createDataFrame(rows, "event_type string, value double")
    got_q = sorted(tuple(r) for r in value_quantiles(e).collect())
    want_q = sorted(
        tuple(r.values())
        for r in _duck(EVENTS_VALUE_QUANTILES_SQL, "events", e, spark, tmp_path, "evq")
    )
    assert got_q == want_q
    qa = {r["event_type"]: r for r in value_quantiles(e).collect()}
    assert qa["a"]["n_events"] == 3 and qa["a"]["p50"] == 2.0

    got_m = sorted(tuple(r) for r in value_mad_outliers(e).collect())
    want_m = sorted(
        tuple(r.values())
        for r in _duck(EVENTS_VALUE_OUTLIERS_SQL, "events", e, spark, tmp_path, "evm")
    )
    assert got_m == want_m


def test_sessionize_and_asof_exclude_null_timestamps(spark, tmp_path):
    """A NULL ts sorted NULLS FIRST in Spark's lag/carry-forward windows
    but NULLS LAST (or never-matching) in the oracle — both engines now
    exclude undated events."""
    from petasearch_spark.operators import events

    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, None, 1, "click", 1.0, "{}"),
        (2, t0, 1, "click", 1.0, "{}"),
        (3, t0 + datetime.timedelta(minutes=5), 1, "purchase", 2.0, "{}"),
        (4, None, 1, "purchase", 2.0, "{}"),
    ]
    df = _events_df(spark, rows)
    got = [r.asDict() for r in _run_events_op(spark, events.events_sessionize, df)]
    want = _duck(events.EVENTS_SESSIONIZE_SQL, "events", df, spark, tmp_path, "ev_s")
    assert got == want
    assert got[0]["n_sessions"] == 1 and got[0]["n_events"] == 2

    got_a = [r.asDict() for r in _run_events_op(spark, events.events_asof_join, df)]
    want_a = _duck(events.EVENTS_ASOF_SQL, "events", df, spark, tmp_path, "ev_a")
    assert got_a == want_a
    # the dated purchase matched the dated click; the undated pair is gone
    assert len(got_a) == 1 and got_a[0]["last_click_id"] == 2


def test_source_num_non_integer_suffix_agrees_across_engines(spark, tmp_path):
    """'src3.5': Spark TRY_CAST -> NULL but DuckDB TRY_CAST -> 4, so the
    two engines sampled DIFFERENT rates before the digits-only regexp
    guard. Every source shape must now take the same rate in both."""
    from petasearch_spark.operators.corpus import (
        CORPUS_SAMPLE_SQL,
        corpus_sample_stratified,
    )

    rows = [
        (i, f"text body {i}", "en", src, 20)
        for i, src in enumerate(
            ["src3", "src3.5", "src+4", "src007", "commoncrawl", None, "src-2", "src3e2"]
            * 8
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    got = sorted(
        tuple(r) for r in corpus_sample_stratified(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(CORPUS_SAMPLE_SQL).fetchall())
    assert got == want
    # integer suffixes still parse as the synthetic shape
    rates = {r[1]: r[3] for r in got}
    if "src3" in rates:
        assert rates["src3"] == 50 * (3 % 10 + 1)
    if "src007" in rates:
        assert rates["src007"] == 50 * (7 % 10 + 1)


def test_decontaminate_semantic_nan_vector_is_not_a_hit(spark, tmp_path):
    """A NaN cosine was a hit in the DuckDB oracle (NaN sorts above every
    threshold) but not in the numpy kernel — both engines now exclude
    it, and a corrupt (NaN-component) vector contaminates nothing."""
    import math

    from petasearch_spark.operators.corpus import (
        DECONTAMINATE_SEMANTIC_SQL,
        SEM_EVAL_MOD,
        decontaminate_semantic,
    )

    dim = 64
    base = [1.0] + [0.0] * (dim - 1)
    rows = []
    for vid in range(30):
        v = list(base)
        v[vid % 8] = 1.0
        if vid == 3:  # train vector with a NaN component
            v[5] = math.nan
        rows.append((vid, v, int(vid % 10)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    path = os.path.join(str(tmp_path), "embeddings.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(path)

    got = sorted(tuple(r) for r in decontaminate_semantic(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(DECONTAMINATE_SEMANTIC_SQL).fetchall())
    assert got == want
    assert 3 % SEM_EVAL_MOD != 0  # vid 3 is a train vector in this layout
    assert all(r[0] != 3 for r in got), "NaN train vector must not be flagged"


def test_kmv_small_source_falls_back_to_exact(spark, tmp_path):
    """A source with fewer than K distinct bigrams VANISHED from the KMV
    audit in both engines (inner join on rk == K) — standard KMV returns
    the exact count below K; parity must hold too."""
    from petasearch_spark.operators.sketches import (
        KMV_DISTINCT_SQL,
        KMV_K,
        kmv_distinct_tokens,
    )

    rows = [(0, "tiny doc few words", "en", "small", 20)]
    rows += [
        (i, " ".join(f"w{i}x{j}" for j in range(40)), "en", "big", 200)
        for i in range(1, 8)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    path = os.path.join(str(tmp_path), "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    got = {r["source"]: r.asDict() for r in kmv_distinct_tokens(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    res = con.execute(KMV_DISTINCT_SQL)
    cols = [d[0] for d in res.description]
    want = {r[0]: dict(zip(cols, r)) for r in res.fetchall()}
    assert got == want
    small = got["small"]
    assert small["exact_distinct"] == 3 < KMV_K
    assert small["kmv_estimate"] == 3.0 and small["rel_error"] == 0.0
    assert got["big"]["exact_distinct"] >= KMV_K  # estimate path still taken
    assert got["big"]["kmv_estimate"] != got["big"]["exact_distinct"]


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def _write_docs(spark, tmp_path, rows, name="documents"):
    df = _docs_df(spark, rows)
    path = os.path.join(str(tmp_path), f"{name}.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return con


def test_text_ops_survive_empty_docs_and_match_oracle(spark, tmp_path):
    """Empty/whitespace-only docs: 0/0 divisions ABORTED the whole job
    under Spark 4 ANSI while the oracles NULL-propagated. try_divide
    makes both engines agree (NULL ratios; lang-id falls through to
    'zh'; gopher emits a fail-closed verdict)."""
    from petasearch_spark.operators.quality import GOPHER_QUALITY_SQL, gopher_quality
    from petasearch_spark.operators.text import (
        LANG_ID_SQL,
        TEXT_QUALITY_SQL,
        TOKEN_COUNT_SQL,
        lang_id_heuristic,
        text_quality_stats,
        token_count_bpe,
    )

    rows = [
        (0, "", "en", "src0", 0),
        (1, "   ", "zh", "src0", 3),
        (2, "normal words with vowels like data", "es", "src1", 30),
        (3, "spam", "en", "src1", 4),          # 1 token: no 2-grams
        (4, "buy now", "en", "src1", 7),        # 2 tokens: no 3-grams
    ]
    con = _write_docs(spark, tmp_path, rows)
    sf = str(tmp_path)

    for fn, sql in (
        (text_quality_stats, TEXT_QUALITY_SQL),
        (lang_id_heuristic, LANG_ID_SQL),
        (token_count_bpe, TOKEN_COUNT_SQL),
        (gopher_quality, GOPHER_QUALITY_SQL),
    ):
        got = [tuple(r) for r in fn(spark, sf).collect()]
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        assert got == want, (fn.__name__, got, want)

    # gopher: EVERY doc gets a verdict; too-short/empty docs fail CLOSED
    g = {r["doc_id"]: r for r in gopher_quality(spark, sf).collect()}
    assert set(g) == {0, 1, 2, 3, 4}
    assert not g[0]["keep"] and not g[1]["keep"] and not g[3]["keep"] and not g[4]["keep"]
    assert g[2]["keep"]
    assert g[3]["top_2gram_frac"] == 0.0 and g[3]["dup_3gram_frac"] == 0.0


def test_whitespace_rule_identical_across_all_three_engines(spark, tmp_path):
    """Bare \\s differs per dialect (Java includes \\x0B; RE2 does not;
    Python re is Unicode-aware). The explicit shared class must tokenize
    identically in Spark, DuckDB, and the Python shingle kernel —
    vertical tab splits, \\xa0 (non-ASCII space) does NOT."""
    from petasearch_spark.operators.dedup import _shingle_hashes
    from petasearch_spark.operators.portable import TOKENS_SQL, tokens

    text = "a\x0bb c\td x\xa0y e f g"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    spark_toks = df.select(tokens(F.col("text")).alias("t")).collect()[0]["t"]
    duck_toks = duckdb.connect().execute(
        "SELECT " + TOKENS_SQL.format(col="?::VARCHAR")
    , [text]).fetchone()[0]
    assert spark_toks == duck_toks == ["a", "b", "c", "d", "x\xa0y", "e", "f", "g"]

    # the Python kernel shingles over the same tokens: 3-gram count =
    # len(toks) - 2, and one of them hashes 'c d x\xa0y' as ONE window
    sh = _shingle_hashes(df, n=3).collect()
    assert len(sh) == len(spark_toks) - 2

    # NULL text: kernel must skip (SQL twins NULL-propagate), not crash
    dfn = spark.createDataFrame([(0, None), (1, "a b c d")], "doc_id long, text string")
    shn = _shingle_hashes(dfn, n=3).collect()
    assert {r["doc_id"] for r in shn} == {1}


def test_customers_never_ordered_set_semantics_on_duplicate_rows(spark, tmp_path):
    """exceptAll().distinct() was MULTISET difference then dedup: a
    double-loaded customer key with one order survived as 'never
    ordered' while the oracle's EXCEPT removed it."""
    from petasearch_spark.operators.relational import (
        CUSTOMERS_NEVER_ORDERED_SQL,
        customers_never_ordered,
    )

    cust = spark.createDataFrame([(5,), (5,), (6,)], "c_custkey long")
    orders = spark.createDataFrame([(5,)], "o_custkey long")
    cpath = os.path.join(str(tmp_path), "customer.parquet")
    opath = os.path.join(str(tmp_path), "orders.parquet")
    cust.coalesce(1).write.mode("overwrite").parquet(cpath)
    orders.coalesce(1).write.mode("overwrite").parquet(opath)
    got = [r["custkey"] for r in customers_never_ordered(spark, str(tmp_path)).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{cpath}/*.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{opath}/*.parquet')")
    want = [r[0] for r in con.execute(CUSTOMERS_NEVER_ORDERED_SQL).fetchall()]
    assert got == want == [6]


def test_zero_norm_and_nan_vectors_in_similarity_family(spark, tmp_path):
    """Round-5 batch 4: a zero-norm vector ABORTED every cosine under
    ANSI (try_divide now yields NULL, ranked last like the oracle), and
    a NaN-element vector was a near-dup hit in DuckDB/Spark-filter but
    not in the numpy kernel (now excluded everywhere)."""
    import duckdb as _d

    from petasearch_spark.operators.similarity import (
        ANN_COSINE_TOPK_SQL,
        EMBEDDING_NEARDUP_SQL,
        ann_cosine_topk,
        embedding_neardup,
    )

    dim = 64
    rows = []
    for vid in range(30):
        v = [0.0] * dim
        v[vid % 6] = 1.0
        v[(vid + 1) % 6] = 0.5
        if vid == 4:
            v = [0.0] * dim  # zero-norm corpus+query vector
        if vid == 13:
            v[3] = float("nan")  # NaN-element train vector
        rows.append((vid, v, int(vid % 10)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    path = os.path.join(str(tmp_path), "embeddings.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(path)
    con = _d.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')")

    def _norm(rows):
        # repr-normalize so NaN == NaN (both engines agree the NaN vector
        # ranks FIRST; Python tuple equality would call nan != nan)
        return sorted(tuple(repr(v) for v in r) for r in rows)

    got = _norm(ann_cosine_topk(spark, str(tmp_path)).collect())
    want = _norm(con.execute(ANN_COSINE_TOPK_SQL).fetchall())
    assert got == want and len(got) > 0

    got_n = sorted(tuple(r) for r in embedding_neardup(spark, str(tmp_path)).collect())
    want_n = sorted(tuple(r) for r in con.execute(EMBEDDING_NEARDUP_SQL).fetchall())
    assert got_n == want_n
    assert all(13 not in (r[0], r[1]) for r in got_n), "NaN vector must pair with nothing"


def test_pq_trains_on_sub_k_corpora_like_the_oracle(spark, tmp_path):
    """A corpus with fewer than PQ_K vectors returned [] from the engine
    while the oracle trained on the codewords that exist — the KMV sub-K
    rule now applies to PQ too."""
    import duckdb as _d

    from petasearch_spark.operators.ivf import ANN_PQ_TOPK_SQL, PQ_K, ann_pq_topk

    dim = 64
    rows = []
    for vid in range(12):  # < PQ_K = 16
        v = [0.0] * dim
        v[vid % 5] = 1.0
        v[(vid + 2) % 7] = 0.25
        rows.append((vid, v, int(vid % 10)))
    assert len(rows) < PQ_K
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    path = os.path.join(str(tmp_path), "embeddings.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(path)
    con = _d.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')")
    got = sorted(tuple(r) for r in ann_pq_topk(spark, str(tmp_path)).collect())
    want = sorted(tuple(r) for r in con.execute(ANN_PQ_TOPK_SQL).fetchall())
    assert got == want and len(got) > 0


def test_stage_split_keeps_negative_and_null_ids(spark, tmp_path):
    """_stage_two_files split with `% 2 == i` dropped negative/NULL keys
    (Spark % keeps the dividend sign and propagates NULL) — pmod plus the
    NULL->half0 rule stages every row."""
    from petasearch_spark.streaming.stateful import _stage_two_files

    df = spark.createDataFrame([(2,), (-1,), (None,), (7,)], "event_id long")
    src = os.path.join(str(tmp_path), "ev.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    staged = _stage_two_files(spark, src, "event_id")
    assert spark.read.parquet(staged).count() == 4


def test_stream_user_totals_ignores_null_values(spark, tmp_path):
    """A NULL value crashed the stateful kernel (NaN through Arrow into
    int()); the row is now excluded from count AND sum like the filtered
    SQL twin."""
    import datetime

    import duckdb as _d

    from petasearch_spark.streaming.stateful import (
        EVENTS_STREAM_USER_TOTALS_SQL,
        events_stream_user_totals,
    )

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (0, t0, 1, "click", 2.25, "{}"),
        (1, t0, 1, "click", None, "{}"),
        (2, t0, 2, "click", -3.5, "{}"),
        (3, t0, 2, "click", 1.0, "{}"),
    ]
    ev = _events_df(spark, rows)
    src = os.path.join(str(tmp_path), "events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    got = sorted(tuple(r) for r in events_stream_user_totals(spark, str(tmp_path)).collect())
    con = _d.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{src}/*.parquet')")
    want = sorted(tuple(r) for r in con.execute(EVENTS_STREAM_USER_TOTALS_SQL).fetchall())
    assert got == want
    assert got[0] == (1, 1, 2.25)  # NULL row excluded from n_events too


def test_blank_and_null_id_lines_are_quarantined(spark, tmp_path):
    """from_json/from_csv parse a blank line as an all-NULL row WITHOUT a
    corrupt marker, and an empty leading CSV field as a NULL event_id —
    all three now land in quarantine, keeping every input line accounted."""
    from petasearch_spark.sources.csv_events import read_events_csv
    from petasearch_spark.sources.jsonl import read_jsonl_docs, split_malformed

    jl = str(tmp_path / "d.jsonl")
    with open(jl, "w") as f:
        f.write('{"id": "a", "text": "hello world"}\n')
        f.write("\n")          # blank
        f.write("   \n")       # whitespace-only
        f.write("not json\n")
    clean, bad = split_malformed(read_jsonl_docs(spark, jl))
    assert clean.count() == 1 and bad.count() == 3

    cf = str(tmp_path / "e.csv")
    with open(cf, "w") as f:
        f.write("1,2024-01-01 00:00:00,7,click,1.5\n")
        f.write("\n")                                   # blank
        f.write(",2024-01-01 00:00:00,7,click,1.5\n")   # NULL event_id
        f.write("2,2024-01-01 00:00:00,7,click,oops\n")  # bad value
    ev = read_events_csv(spark, cf)
    assert ev.filter(F.col("_malformed").isNull()).count() == 1
    assert ev.filter(F.col("_malformed").isNotNull()).count() == 3
