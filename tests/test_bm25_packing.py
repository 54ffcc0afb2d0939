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
