"""Property-based tests (hypothesis) — FIXTURES.md §3: the alignment
kernel vs an independent full Smith-Waterman, k-mer encode/extract
round-trips, expansion invariants, and the masker's containment
properties. Pure-Python kernels only (no SparkSession) so hypothesis can
run hundreds of examples quickly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.scoring import BLOSUM62
from petasearch_spark.operators.align import (
    _encode,
    _kmer_positions,
    banded_sw,
    banded_sw_batch,
    ungapped_score,
)
from petasearch_spark.operators.masking import mask_seq
from petasearch_spark.operators.similar_kmers import expand_kmer_scored
from tests.test_align import full_sw_score
from tests.test_kmer import encode_py

residues = st.sampled_from(AMINO_ALPHABET)
seqs = st.text(alphabet=residues, min_size=1, max_size=80)


@st.composite
def related_pair(draw):
    """A sequence and a lightly mutated copy (subs + ≤2 indels)."""
    q = draw(st.text(alphabet=residues, min_size=20, max_size=80))
    t = list(q)
    for _ in range(draw(st.integers(0, 4))):
        i = draw(st.integers(0, len(t) - 1))
        t[i] = draw(residues)
    for _ in range(draw(st.integers(0, 2))):
        i = draw(st.integers(0, len(t) - 1))
        if draw(st.booleans()):
            t.insert(i, draw(residues))
        elif len(t) > 20:
            del t[i]
    return q, "".join(t)


@settings(max_examples=150, deadline=None)
@given(related_pair())
def test_banded_equals_full_sw_on_related_pairs(pair):
    q, t = pair
    got = banded_sw(_encode(q), _encode(t), anchor_diag=0)
    assert (got["score"] if got else 0) == full_sw_score(q, t)


@settings(max_examples=50, deadline=None)
@given(st.lists(related_pair(), min_size=2, max_size=6))
def test_batch_equals_single(pairs):
    """The pair-batched DP must agree with itself run one pair at a time
    (padding/masking across the batch cannot leak between pairs)."""
    qcs = [_encode(q) for q, _ in pairs]
    tcs = [_encode(t) for _, t in pairs]
    anchors = [0] * len(pairs)
    batch = banded_sw_batch(qcs, tcs, anchors)
    for qc, tc, got in zip(qcs, tcs, batch):
        single = banded_sw(qc, tc, anchor_diag=0)
        assert (got or {}) == (single or {})


@settings(max_examples=100, deadline=None)
@given(seqs)
def test_ungapped_self_score_is_diagonal_sum(s):
    qc = _encode(s)
    sc, qs_, qe = ungapped_score(qc, qc, 0)
    assert sc == sum(int(BLOSUM62[c, c]) for c in qc)
    assert (qs_, qe) == (0, len(s))


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.sampled_from(AMINO_ALPHABET + "X"), min_size=9, max_size=60))
def test_kmer_positions_match_bruteforce(s):
    codes = _encode(s)
    pos = _kmer_positions(codes, 9)
    brute = {}
    for i in range(len(s) - 8):
        win = s[i : i + 9]
        if "X" in win:
            continue
        code = encode_py(win)
        brute.setdefault(code, i)
    assert pos == brute


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=residues, min_size=9, max_size=9), st.integers(40, 170))
def test_expansion_invariants(kmer_str, threshold):
    from petasearch_spark.functions.scoring import KMER_SEED_MATRIX

    km = encode_py(kmer_str)
    out = expand_kmer_scored(km, 9, threshold=threshold, max_n=20)
    self_score = sum(int(KMER_SEED_MATRIX[c, c]) for c in _encode(kmer_str))
    scores = [s for _, s in out]
    # scores sorted descending, all >= threshold, none above self-score
    assert scores == sorted(scores, reverse=True)
    assert all(threshold <= s <= self_score for s in scores)
    # the exact k-mer is the top hit whenever anything qualifies
    if self_score >= threshold:
        assert out[0] == (km, self_score)
    # no duplicates
    assert len({c for c, _ in out}) == len(out)


@settings(max_examples=100, deadline=None)
@given(seqs)
def test_mask_preserves_length_and_only_masks(s):
    m = mask_seq(s)
    assert len(m) == len(s)
    # every position is either unchanged or X
    assert all(a == b or b == "X" for a, b in zip(s, m))


@settings(max_examples=40, deadline=None)
@given(seqs)
def test_profile_consensus_roundtrip_kernel(s):
    """A one-hot profile built from a sequence must yield that sequence
    back as its consensus (kernel-level check, no Spark)."""
    import numpy as np

    from petasearch_spark.operators.profile import AMINO_ALPHABET as ALPHA

    letters = np.array(list(ALPHA))
    idx = {c: i for i, c in enumerate(ALPHA)}
    m = np.full((len(s), len(ALPHA)), -1.0)
    for i, c in enumerate(s):
        m[i, idx[c]] = 2.0
    assert "".join(letters[np.argmax(m, axis=1)]) == s


def test_quantile_bucket_kernel_matches_duckdb_on_adversarial_floats():
    """Hypothesis fuzz of the streaming quantile precount's sign-aware
    decimal bucketing against DuckDB's ROUND-based bucketing — the layer
    where round-4/5 found two real divergences (sign counted as a digit;
    inexact float +0.5). Mixed signs, magnitudes across every digit
    regime, and near-half boundary constructions."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from petasearch_spark.operators.events import SKETCH_LEAD_DIGITS
    from petasearch_spark.streaming.stateful import quantile_bucket_counts

    con = duckdb.connect()

    def duck_hist(vals):
        rows = con.execute(
            f"""
            WITH cents AS (
                SELECT CAST(ROUND(v * 100, 0) AS BIGINT) AS c
                FROM (SELECT unnest(?::DOUBLE[]) AS v)
            )
            SELECT CASE WHEN c < 0 THEN -1 ELSE 1 END AS s,
                   LENGTH(CAST(ABS(c) AS VARCHAR)) AS d,
                   CASE WHEN LENGTH(CAST(ABS(c) AS VARCHAR)) <= {SKETCH_LEAD_DIGITS}
                        THEN ABS(c)
                        ELSE CAST(SUBSTR(CAST(ABS(c) AS VARCHAR), 1, {SKETCH_LEAD_DIGITS}) AS BIGINT)
                   END AS l,
                   COUNT(*) AS w
            FROM cents GROUP BY 1, 2, 3
            """,
            [vals],
        ).fetchall()
        return {(r[0], r[1], r[2]): r[3] for r in rows}

    finite = st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    )
    near_half = st.integers(min_value=-10**6, max_value=10**6).map(
        lambda n: (n + 0.5) / 100.0
    )
    ulp_prev = near_half.map(lambda x: float(__import__("numpy").nextafter(x, -1e18)))
    ulp_next = near_half.map(lambda x: float(__import__("numpy").nextafter(x, 1e18)))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(finite, near_half, ulp_prev, ulp_next), min_size=1, max_size=40))
    def check(vals):
        pdf = pd.DataFrame({"event_type": "x", "value": vals})
        got = {
            (int(r["s"]), int(r["d"]), int(r["l"])): int(r["w"])
            for _, r in quantile_bucket_counts(pdf).iterrows()
        }
        assert got == duck_hist(vals)

    check()
