"""Alignment kernel tests: banded SW vs an independent full Smith-Waterman
(FIXTURES.md §3: property tests on random pairs), plus cascade filters."""

from __future__ import annotations

import random

import numpy as np
import pytest

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.scoring import BLOSUM62
from petasearch_spark.operators.align import (
    _encode,
    _kmer_positions,
    align_pair_kernel,
    banded_sw,
    ungapped_score,
)


def full_sw_score(q: str, t: str, gap_open=11, gap_extend=1) -> int:
    """Independent affine-gap Smith-Waterman (full matrix, score only)."""
    qc, tc = _encode(q), _encode(t)
    nq, nt = len(qc), len(tc)
    NEG = -(10**9)
    H = np.zeros((nt + 1, nq + 1), dtype=np.int64)
    E = np.full((nt + 1, nq + 1), NEG, dtype=np.int64)  # gap in target
    Fm = np.full((nt + 1, nq + 1), NEG, dtype=np.int64)  # gap in query
    best = 0
    for i in range(1, nt + 1):
        for j in range(1, nq + 1):
            E[i, j] = max(H[i, j - 1] - gap_open, E[i, j - 1] - gap_extend)
            Fm[i, j] = max(H[i - 1, j] - gap_open, Fm[i - 1, j] - gap_extend)
            s = BLOSUM62[tc[i - 1], qc[j - 1]] if tc[i - 1] >= 0 and qc[j - 1] >= 0 else -1
            H[i, j] = max(0, H[i - 1, j - 1] + s, E[i, j], Fm[i, j])
            best = max(best, H[i, j])
    return int(best)


def rand_seq(rng, n):
    return "".join(rng.choice(AMINO_ALPHABET) for _ in range(n))


def mutate(rng, s, n_sub=3, n_indel=1):
    s = list(s)
    for _ in range(n_sub):
        i = rng.randrange(len(s))
        s[i] = rng.choice(AMINO_ALPHABET)
    for _ in range(n_indel):
        i = rng.randrange(len(s))
        if rng.random() < 0.5:
            s.insert(i, rng.choice(AMINO_ALPHABET))
        else:
            del s[i]
    return "".join(s)


def test_identical_sequences_perfect_alignment():
    s = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKL"
    res = banded_sw(_encode(s), _encode(s), anchor_diag=0)
    assert res is not None
    assert res["backtrace"] == "M" * len(s)
    assert res["nident"] == len(s)
    assert res["mismatch"] == 0 and res["gapopen"] == 0
    assert res["qstart"] == 0 and res["qend"] == len(s)
    # score = sum of diagonal BLOSUM62 entries
    expect = sum(int(BLOSUM62[c, c]) for c in _encode(s))
    assert res["score"] == expect


def test_banded_matches_full_sw_on_related_pairs():
    rng = random.Random(17)
    for trial in range(25):
        q = rand_seq(rng, rng.randrange(30, 120))
        t = mutate(rng, q, n_sub=rng.randrange(0, 6), n_indel=rng.randrange(0, 3))
        full = full_sw_score(q, t)
        res = banded_sw(_encode(q), _encode(t), anchor_diag=0)
        got = res["score"] if res else 0
        # related pairs with ≤3 indels stay well inside a ±16 band
        assert got == full, (trial, q, t)


def test_banded_alignment_stats_consistent():
    rng = random.Random(5)
    for _ in range(10):
        q = rand_seq(rng, 60)
        t = mutate(rng, q, n_sub=4, n_indel=2)
        res = banded_sw(_encode(q), _encode(t), anchor_diag=0)
        assert res is not None
        bt = res["backtrace"]
        assert res["alnlen"] == len(bt)
        assert res["qend"] - res["qstart"] == bt.count("M") + bt.count("I")
        assert res["tend"] - res["tstart"] == bt.count("M") + bt.count("D")
        assert res["nident"] + res["mismatch"] == bt.count("M")


def test_ungapped_score_simple():
    q = _encode("ACDEFGHIK")
    sc, qs, qe = ungapped_score(q, q, 0)
    assert sc == sum(int(BLOSUM62[c, c]) for c in q)
    assert (qs, qe) == (0, 9)
    # disjoint: all mismatches -> score 0
    sc2, _, _ = ungapped_score(_encode("AAAA"), _encode("WWWW"), 0)
    assert sc2 <= 0 or sc2 == 0


def test_kmer_positions_rolling():
    codes = _encode("ACDEFGHIKLM")
    pos = _kmer_positions(codes, 9)
    # windows at 0,1,2; first-occurrence semantics
    from tests.test_kmer import encode_py

    assert pos[encode_py("ACDEFGHIK")] == 0
    assert pos[encode_py("CDEFGHIKL")] == 1
    assert pos[encode_py("DEFGHIKLM")] == 2
    # X interrupts
    posx = _kmer_positions(_encode("ACDEFGHIKXACDEFGHIK"), 9)
    assert posx[encode_py("ACDEFGHIK")] == 0


def test_cascade_diag_proximity_filter():
    # two matches 10 diagonals apart -> F5 drops the pair
    q = "ACDEFGHIKLMNPQRSTVWY"
    t = q
    res = align_pair_kernel(q, t, kmers=[1, 2], qpositions=[0, 1], k=9, db_residues=1000)
    # kmers 1,2 don't occur in t -> <2 diags -> None
    assert res is None


def test_cascade_end_to_end_pair():
    from tests.test_kmer import encode_py

    q = "ACDEFGHIKLMNPQRSTVWY"
    t = "WWWW" + q + "AAAA"
    kmers = [encode_py(q[i : i + 9]) for i in range(0, 4)]
    res = align_pair_kernel(q, t, kmers=kmers, qpositions=list(range(4)), k=9, db_residues=10_000)
    assert res is not None
    assert res["nident"] >= 20 * 0.9  # essentially the full query aligns
    assert res["evalue"] < 1e-3
    assert res["tstart"] == 4  # 0-based: alignment starts after WWWW
