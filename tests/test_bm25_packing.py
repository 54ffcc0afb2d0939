"""Semantic invariants for bm25_search and sequence_packing (value parity
vs DuckDB lives in test_oracle_parity.py; these pin the properties parity
alone can't state)."""

from __future__ import annotations

import pyspark.sql.functions as F

from petasearch_spark.operators import bm25, corpus
from petasearch_spark.operators.portable import tokens
from petasearch_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestBM25:
    def test_ranking_invariants(self, spark):
        rows = bm25.bm25_search(spark, SF_DIR).collect()
        assert rows, "standing queries must hit the synthetic corpus"
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == set(bm25.QUERIES), "every standing query returns hits"
        for qid, hits in by_q.items():
            assert [h["rk"] for h in hits] == list(range(1, len(hits) + 1))
            assert len(hits) <= bm25.TOP_K
            scores = [h["score"] for h in hits]
            assert scores == sorted(scores, reverse=True), "scores non-increasing in rank"
            assert all(h["score"] > 0 for h in hits)
            assert all(1 <= h["n_terms_hit"] <= len(bm25.QUERIES[qid]) for h in hits)

    def test_top_doc_is_term_dense(self, spark):
        """The rank-1 doc for each query must actually contain every term it
        was credited for (n_terms_hit distinct query terms)."""
        res = bm25.bm25_search(spark, SF_DIR).filter(F.col("rk") == 1).collect()
        docs = {
            r["doc_id"]: set(r["ts"])
            for r in load_table(spark, "documents", SF_DIR)
            .select("doc_id", tokens(F.col("text")).alias("ts"))
            .collect()
        }
        for r in res:
            present = sum(t in docs[r["doc_id"]] for t in bm25.QUERIES[r["query_id"]])
            assert present == r["n_terms_hit"]


class TestSequencePacking:
    def test_packing_invariants(self, spark):
        packs = corpus.sequence_packing(spark, SF_DIR).collect()
        total_tokens = (
            load_table(spark, "documents", SF_DIR)
            .select(F.sum(F.size(tokens(F.col("text")))).alias("t"))
            .collect()[0]["t"]
        )
        ids = [p["pack_id"] for p in packs]
        assert ids == list(range(len(packs))), "pack ids contiguous from 0"
        # conservation: every token lands in exactly one pack
        assert sum(p["fill_tokens"] for p in packs) == total_tokens
        # every pack except the last is exactly full
        for p in packs[:-1]:
            assert p["fill_tokens"] == corpus.CTX_LEN
        assert 0 < packs[-1]["fill_tokens"] <= corpus.CTX_LEN
        for p in packs:
            assert p["n_full_docs"] <= p["n_docs"]
            assert p["first_doc"] <= p["last_doc"]

    def test_no_single_partition_scan(self, spark):
        """The global prefix sum must run as per-bucket windows, never as a
        single-partition global window (the 100 TB bottleneck the two-phase
        scan exists to avoid)."""
        plan = corpus.sequence_packing(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


def _brute_packs(lengths: list[tuple[int, int]], ctx: int):
    """Token-at-a-time reference packing over (doc_id, n_toks) sorted rows."""
    out: dict[int, list] = {}
    pos = 0
    for doc_id, n in lengths:
        start, end = pos, pos + n
        pos = end
        if n == 0:
            continue
        for p in range(start // ctx, (end - 1) // ctx + 1):
            e = out.setdefault(p, [0, 0, [], 0])
            e[0] += 1
            if start >= p * ctx and end <= (p + 1) * ctx:
                e[1] += 1
            e[2].append(doc_id)
            e[3] += min(end, (p + 1) * ctx) - max(start, p * ctx)
    return [
        (p, v[0], v[1], min(v[2]), max(v[2]), v[3]) for p, v in sorted(out.items())
    ]


class TestPackingConstructed:
    def test_matches_brute_force(self, spark):
        """Random corpora with gaps in doc_id, zero-token docs, and docs
        longer than several contexts — vs the token-at-a-time reference."""
        import random

        rng = random.Random(7)
        for case in range(3):
            ids = sorted(rng.sample(range(1000), 120))
            lengths = [
                (i, rng.choice([0, 1, 2, 7, 63, 64, 65, 200, rng.randrange(0, 150)]))
                for i in ids
            ]
            df = spark.createDataFrame(lengths, "doc_id long, n_toks long")
            got = [
                (r["pack_id"], r["n_docs"], r["n_full_docs"], r["first_doc"], r["last_doc"], r["fill_tokens"])
                for r in corpus.pack_token_lengths(df, ctx_len=64).collect()
            ]
            assert got == _brute_packs(lengths, 64), f"case {case}"

    def test_fill_tokens_sum_to_corpus_tokens(self, spark):
        """SUM(fill_tokens) == SUM(n_toks) exactly: every token lands in
        exactly one pack (gapless, non-overlapping least/greatest spans).
        The curate CLI relies on this to derive kept_tokens from the
        packs artifact instead of a second corpus tokenize pass
        (round 11)."""
        import random

        rng = random.Random(23)
        lengths = [
            (i, rng.choice([0, 1, 63, 64, 65, 200])) for i in sorted(rng.sample(range(500), 80))
        ]
        df = spark.createDataFrame(lengths, "doc_id long, n_toks long")
        got = corpus.pack_token_lengths(df, ctx_len=64).agg(
            {"fill_tokens": "sum"}
        ).collect()[0][0]
        assert got == sum(n for _, n in lengths)

    def test_sparse_hash_ids_match_brute_force(self, spark):
        """60-bit content-hash doc ids (the curate CLI's JSONL id space):
        the scaled bucket divisor must keep the phase-2 subtotal collect
        bounded AND leave the output identical to the reference walk —
        a fixed 64-wide divisor would collect one row per document."""
        import random

        rng = random.Random(11)
        lengths = sorted(
            (rng.randrange(0, 1 << 60), rng.randrange(0, 150)) for _ in range(150)
        )
        df = spark.createDataFrame(lengths, "doc_id long, n_toks long")
        got = [
            (r["pack_id"], r["n_docs"], r["n_full_docs"], r["first_doc"], r["last_doc"], r["fill_tokens"])
            for r in corpus.pack_token_lengths(df, ctx_len=64).collect()
        ]
        assert got == _brute_packs(lengths, 64)


def _brute_bm25(docs: dict[int, list[str]], queries: dict[str, tuple[str, ...]], k1=1.2, b=0.75):
    import math

    n_docs = len(docs)
    avgdl = sum(len(ts) for ts in docs.values()) / n_docs
    df: dict[str, int] = {}
    for ts in docs.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, terms in queries.items():
        for doc_id, ts in docs.items():
            dl = len(ts)
            s, hit = 0.0, 0
            for t in terms:
                tf = ts.count(t)
                if not tf:
                    continue
                hit += 1
                idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
            if hit:
                out[(qid, doc_id)] = (s, hit)
    return out


class TestBM25Constructed:
    def test_matches_reference_scoring(self, spark):
        import random

        rng = random.Random(11)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
        docs = {
            i: [rng.choice(vocab) for _ in range(rng.randrange(3, 40))] for i in range(60)
        }
        queries = {"qa": ("alpha", "beta"), "qb": ("gamma", "zeta", "eta"), "qc": ("theta",)}
        df = spark.createDataFrame(
            [(i, " ".join(ts)) for i, ts in docs.items()], "doc_id long, text string"
        )
        expected = _brute_bm25(docs, queries)
        rows = bm25.bm25_rank(df, queries, top_k=10**9).collect()
        assert len(rows) == len(expected)
        for r in rows:
            exp_s, exp_hit = expected[(r["query_id"], r["doc_id"])]
            assert abs(r["score"] - exp_s) < 1e-5, (r, exp_s)
            assert r["n_terms_hit"] == exp_hit

    def test_max_df_pruning_equals_stripped_queries(self, spark):
        """Pruning saturated terms must give exactly the ranking that
        removing those terms from the queries would give."""
        import random

        rng = random.Random(3)
        vocab = ["stop", "alpha", "beta", "gamma", "delta"]
        # "stop" appears in every doc; the rest are sparse
        docs = {
            i: ["stop"] + [rng.choice(vocab[1:]) for _ in range(rng.randrange(2, 12))]
            for i in range(40)
        }
        df = spark.createDataFrame(
            [(i, " ".join(ts)) for i, ts in docs.items()], "doc_id long, text string"
        )
        queries = {"q1": ("stop", "alpha"), "q2": ("beta", "stop", "gamma")}
        stripped = {"q1": ("alpha",), "q2": ("beta", "gamma")}
        got = [tuple(r) for r in bm25.bm25_rank(df, queries, max_df_frac=0.9).collect()]
        want = [tuple(r) for r in bm25.bm25_rank(df, stripped).collect()]
        assert got == want


class TestKMVSketch:
    def test_error_within_theory(self, spark):
        """KMV with K=64 has stderr ~1/sqrt(63) ~ 12.6%; on the fixed
        corpus every source must land well inside 4 sigma, and the
        estimate must be exact-positive."""
        from petasearch_spark.operators.sketches import kmv_distinct_tokens

        rows = kmv_distinct_tokens(spark, SF_DIR).collect()
        assert rows, "every source has >= K distinct bigrams"
        for r in rows:
            assert r["kmv_estimate"] > 0
            assert abs(r["rel_error"]) < 0.5, r

    def test_merge_associativity(self, spark):
        """The K-minima of a union == K smallest of the concatenated
        minima lists — the property that makes the sketch one-pass
        mergeable at 100 TB (partial aggregation)."""
        import hashlib
        import random

        rng = random.Random(5)
        def h(x):
            return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

        a = sorted({h(rng.randrange(10**9)) for _ in range(500)})[:64]
        b = sorted({h(rng.randrange(10**9)) for _ in range(500)})[:64]
        union_direct = sorted(set(a) | set(b))[:64]
        # merging the two K-minima lists gives the same K-minima
        assert sorted(set(a + b))[:64] == union_direct


class TestPhraseSearch:
    def test_constructed_occurrences(self, spark):
        """Pin the position-intersection arithmetic: repeated and
        overlapping occurrences, phrase-prefix-only docs, and the
        phrase's own source doc."""
        rows = [
            # doc 1 is the phrase source (1 % 250 == 1): phrase = "a b c"
            (1, "a b c x a b c"),          # 2 clean occurrences
            (2, "a b c a b c a b c"),      # 3 back-to-back occurrences
            (3, "a a b c b"),              # 1 occurrence at offset 1
            (4, "a b x c a b"),            # prefix only -> no match
            (5, "c b a"),                  # all terms, wrong order
            (6, "a a a b b c"),            # terms present, never consecutive
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            (r["doc_id"]): r["n_matches"]
            for r in bm25.phrase_rank(docs).collect()
        }
        assert out == {1: 2, 2: 3, 3: 1}

    def test_overlapping_self_phrase(self, spark):
        """'a a a a' contains 'a a a' twice (overlap allowed) — position
        arithmetic, not substring count."""
        docs = spark.createDataFrame([(1, "a a a a")], ["doc_id", "text"])
        rows = bm25.phrase_rank(docs).collect()
        assert len(rows) == 1 and rows[0]["n_matches"] == 2

    def test_postings_broadcast_plan(self, spark):
        """The phrase probes must reach the postings via broadcast joins —
        the corpus-sized posting relation may never be the build side of a
        shuffle join for a standing-query probe."""
        df = bm25.phrase_search(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 3, plan


class TestPhraseProperty:
    def test_random_corpora_match_naive(self, spark):
        """phrase_rank vs a naive Python matcher on deterministic random
        word-soup corpora, including whitespace-noise and short docs."""
        import random

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(12)]  # small vocab -> real collisions
        for trial in range(3):
            rows = []
            for doc_id in range(60):
                n = rng.randint(0, 12)
                words = [rng.choice(vocab) for _ in range(n)]
                # whitespace noise: double spaces and tabs must not create
                # empty tokens
                sep = "  " if doc_id % 7 == 0 else ("\t" if doc_id % 11 == 0 else " ")
                rows.append((doc_id, sep.join(words)))
            docs = spark.createDataFrame(rows, ["doc_id", "text"])
            got = {
                (r["phrase_id"], r["doc_id"]): r["n_matches"]
                for r in bm25.phrase_rank(docs).collect()
            }
            # naive matcher
            toks = {d: t.split() for d, t in rows}
            expect = {}
            for pid, pt in toks.items():
                if pid % bm25.PHRASE_SRC_MOD != 1 or len(pt) < 3:
                    continue
                ph = pt[:3]
                for d, t in toks.items():
                    c = sum(1 for i in range(len(t) - 2) if t[i : i + 3] == ph)
                    if c:
                        expect[(pid, d)] = c
            assert got == expect, (trial, got, expect)


class TestQuantilesProperty:
    def test_random_groups_match_numpy(self, spark):
        """value_quantiles vs direct ceil-rank selection on sorted numpy
        arrays over random group sizes (1..200) and duplicated values."""
        import random

        import numpy as np

        from petasearch_spark.operators.events import QUANTILE_PCTS, value_quantiles

        rng = random.Random(13)
        rows = []
        groups = {}
        for g in range(8):
            n = rng.randint(1, 200)
            vals = [float(rng.randint(0, 30)) for _ in range(n)]  # heavy dups
            groups[f"g{g}"] = np.sort(np.array(vals))
            rows += [(f"g{g}", v) for v in vals]
        e = spark.createDataFrame(rows, ["event_type", "value"])
        out = {r["event_type"]: r for r in value_quantiles(e).collect()}
        assert set(out) == set(groups)
        for g, arr in groups.items():
            n = len(arr)
            assert out[g]["n_events"] == n
            for p in QUANTILE_PCTS:
                rank = (p * n + 99) // 100  # ceil(p*n/100), 1-based
                assert out[g][f"p{p}"] == arr[rank - 1], (g, p, n)


def test_approx_percentile_is_within_rank_error(spark):
    """The documented 100 TB path for quantiles is approx_percentile
    (t-digest); validate its rank error against the exact operator on the
    real events table: each approx value's rank must lie within
    n/accuracy of the exact target rank."""
    import bisect

    from petasearch_spark.operators.events import QUANTILE_PCTS
    from petasearch_spark.sources.tables import load_table

    accuracy = 1000
    e = load_table(spark, "events", "/root/testdata/sf0.01")
    approx = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            *[
                F.percentile_approx("value", p / 100.0, accuracy).alias(f"p{p}")
                for p in QUANTILE_PCTS
            ]
        )
        .collect()
    }
    values = {}
    for r in e.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in values.items():
        vals.sort()
        n = len(vals)
        for p in QUANTILE_PCTS:
            target = (p * n + 99) // 100
            got_rank = bisect.bisect_right(vals, approx[et][f"p{p}"])
            assert abs(got_rank - target) <= max(1, n // accuracy) + 1, (et, p, got_rank, target)
