"""Corpus curation invariants (operators/corpus.py) beyond the hash-parity
gate: sampling determinism and rate/weight math, decontamination's
train/eval separation."""

from __future__ import annotations

import pytest

from petasearch_spark.operators.corpus import (
    DECON_NGRAM,
    EVAL_MOD,
    corpus_sample_stratified,
    decontaminate_ngram_overlap,
)
from tests.conftest import SF_SMOKE


def test_sampling_deterministic_and_weighted(spark):
    a = corpus_sample_stratified(spark, SF_SMOKE).collect()
    b = corpus_sample_stratified(spark, SF_SMOKE).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]  # same draw every run
    assert len(a) > 0
    for r in a:
        n = int(r["source"][3:])
        assert r["rate_permille"] == 50 * (n % 10 + 1)
        assert r["weight"] == pytest.approx(1000.0 / r["rate_permille"], abs=1e-6)


def test_sampling_rate_is_roughly_honored(spark):
    rows = corpus_sample_stratified(spark, SF_SMOKE).collect()
    # expected keep fraction = mean(50*(n%10+1))/1000 = 0.275 over uniform sources
    assert 0.15 < len(rows) / 500 < 0.40


def test_decontamination_flags_only_train_docs(spark):
    rows = decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    assert len(rows) > 0  # guard: an empty result checks nothing
    for r in rows:
        assert r["doc_id"] % EVAL_MOD != 0  # eval docs are never flagged
        assert r["n_collisions"] >= 1 and r["n_eval_docs"] >= 1


def test_decontamination_matches_brute_force(spark):
    """Cross-check one flagged doc against a driver-side shingle set."""
    import re

    rows = decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }

    def shingles(text: str) -> set[str]:
        toks = [t for t in re.split(r"\s+", text) if t]
        return {
            " ".join(toks[i : i + DECON_NGRAM])
            for i in range(len(toks) - DECON_NGRAM + 1)
        }

    ev = {d: shingles(t) for d, t in docs.items() if d % EVAL_MOD == 0}
    got = rows[0]
    mine = shingles(docs[got["doc_id"]])
    hits = {d for d, s in ev.items() if mine & s}
    n_coll = len(mine & set().union(*(ev[d] for d in hits)))
    assert got["n_eval_docs"] == len(hits)
    assert got["n_collisions"] == n_coll


# ---- Bloom decontamination (round 3) --------------------------------------

def test_bloom_is_superset_of_exact_decontamination(spark):
    """One-sided error: every doc the exact n-gram join flags must be
    bloom-flagged with at least as many hits (a Bloom filter can never
    produce a false negative)."""
    from petasearch_spark.operators import corpus as C

    exact = {
        r["doc_id"]: r["n_collisions"]
        for r in C.decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
    }
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in C.decontaminate_bloom(spark, SF_SMOKE).collect()
    }
    assert exact, "fixture must contain contaminated docs"
    for d, n in exact.items():
        assert d in bloom and bloom[d] >= n, (d, n, bloom.get(d))


def test_bloom_false_positives_appear_when_saturated(spark):
    """Shrinking the filter to 64 bits saturates it: every probe hits,
    so every train doc with shingles gets flagged — demonstrating the
    false-positive (but never false-negative) direction."""
    from petasearch_spark.operators import corpus as C
    from petasearch_spark.operators.dedup import _shingle_hashes
    from petasearch_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orig = C.BLOOM_BITS
    try:
        C.BLOOM_BITS = 64
        flagged = {r["doc_id"] for r in C.decontaminate_bloom(spark, SF_SMOKE).collect()}
    finally:
        C.BLOOM_BITS = orig
    docs = load_table(spark, "documents", SF_SMOKE)
    train_with_shingles = {
        r["doc_id"]
        for r in _shingle_hashes(docs, n=C.DECON_NGRAM, col="h")
        .filter(F.col("doc_id") % C.EVAL_MOD != 0)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert flagged == train_with_shingles


class TestMixtureSample:
    def test_budgets_proportional_and_kept_mass_close(self, spark):
        from petasearch_spark.operators.corpus import mixture_sample

        rows = mixture_sample(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 500
        by_src = {}
        for r in rows:
            s = by_src.setdefault(r["source"], {"kept": 0, "budget": r["budget"]})
            if r["keep"]:
                s["kept"] += r["n_toks"]
        for s, d in by_src.items():
            if d["budget"] == 0:
                continue
            # exclusive-cum rule: kept mass reaches the budget and overshoots
            # by at most one document
            assert d["kept"] >= min(
                d["budget"], sum(r["n_toks"] for r in rows if r["source"] == s)
            )
            assert d["kept"] <= d["budget"] + max(
                r["n_toks"] for r in rows if r["source"] == s
            )

    def test_small_source_saturates(self, spark):
        """A source smaller than its budget is taken whole and flagged."""
        from pyspark.sql import functions as F

        from petasearch_spark.operators import corpus
        from petasearch_spark.sources.tables import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001").filter(
            # shrink src1 to 2 docs; weight(src1)=2 with a big corpus behind it
            (F.col("source") != "src1") | (F.col("doc_id") % 25 < 2)
        )
        import petasearch_spark.operators.corpus as c

        orig = c.load_table
        try:
            c.load_table = lambda spark, name, sf_dir, **kw: docs
            rows = corpus.mixture_sample(spark, "ignored").collect()
        finally:
            c.load_table = orig
        src1 = [r for r in rows if r["source"] == "src1"]
        assert src1 and all(r["saturated"] for r in src1)
        assert all(r["keep"] for r in src1)
