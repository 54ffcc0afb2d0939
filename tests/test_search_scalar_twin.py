"""Independent end-to-end search twin (round-4: closes the carried
round-3 caveat that the full-cascade goldens are engine-generated).

A plain-Python re-implementation of the ENTIRE exact-mode cascade —
extraction -> one-representative index -> prefilter HAVING -> J3
diagonals -> F5 proximity -> F6 ungapped rescore -> banded affine-gap
local alignment -> F7/F8 Karlin-Altschul gating — with per-cell loops
and dicts, sharing NOTHING with the engine's implementation except the
pinned scoring CONSTANTS (BLOSUM62 and the Karlin-Altschul λ/K fits,
which are data, separately pinned by tests/test_parity_ops.py): the
engine uses a vectorized lazy-E band kernel, numpy window extraction and
a Spark plan; this twin is the textbook per-cell recurrence.

The twin must reproduce, on the committed FASTA corpus, the engine's
surviving (query, target) pair set and every pair's raw score, bit
score and e-value EXACTLY. Alignment-string cosmetics (backtrace path
among equal-score paths) are engine conventions pinned separately by
tests/test_golden_m8.py and the stats-consistency units.

Reference chain: comparekmertables -> blockalign
(/root/reference/src/sra/comparekmertables.cpp:473-619,
blockalign.cpp:61-481).
"""

from __future__ import annotations

import os

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.scoring import BLOSUM62, KA_GAPPED_11_1, KA_UNGAPPED
from petasearch_spark.plans.search import search
from petasearch_spark.sources.fasta import read_fasta
from tests.test_funnel_golden import read_fa_scalar, windows

DATA = os.path.join(os.path.dirname(__file__), "data")
K = 9
REQ = 2
BAND = 32
GAP_OPEN, GAP_EXT = 11, 1
MAX_EVALUE = 1000.0
DIAG_PROX = 4
NEG = float("-inf")


def codes(seq: str) -> list[int]:
    return [AMINO_ALPHABET.index(c) if c in AMINO_ALPHABET else -1 for c in seq]


def sub_score(tcode: int, qcode: int) -> int:
    return int(BLOSUM62[tcode, qcode]) if tcode >= 0 and qcode >= 0 else -1


def ungapped_best(qc: list[int], tc: list[int], diag: int) -> int:
    """Max-subarray (empty allowed) of per-position scores along `diag`."""
    t_lo = max(0, -diag)
    t_hi = min(len(tc), len(qc) - diag)
    best = cur = 0
    for t in range(t_lo, t_hi):
        cur = max(0, cur + sub_score(tc[t], qc[t + diag]))
        best = max(best, cur)
    return best


def banded_score(qc: list[int], tc: list[int], anchor: int, xdrop: int | None = None) -> int:
    """Textbook banded affine local alignment (score only): target rows,
    band slot b covers query index j = (anchor - BAND//2) + b + i.
    ``xdrop``: the reference's frontier rule — stop at the first row
    whose best cell falls more than xdrop below the running best (tested
    AFTER the best update, matching BlockAligner.cpp:60-93)."""
    half, B = BAND // 2, BAND + 1
    d_lo = anchor - half
    nq = len(qc)
    H_prev = [0.0] * B
    F_prev = [NEG] * B
    best = 0.0
    for i in range(len(tc)):
        H_row = [0.0] * B
        F_row = [NEG] * B
        E = NEG
        row_best = 0.0
        for b in range(B):
            j = d_lo + b + i
            F_row[b] = max(
                (H_prev[b + 1] - GAP_OPEN) if b + 1 < B else NEG,
                (F_prev[b + 1] - GAP_EXT) if b + 1 < B else NEG,
            )
            if b > 0:
                E = max(H_row[b - 1] - GAP_OPEN, E - GAP_EXT)
            if 0 <= j < nq:
                diag = H_prev[b] + sub_score(tc[i], qc[j])
                H_row[b] = max(0.0, diag, E, F_row[b])
                row_best = max(row_best, H_row[b])
            else:
                H_row[b] = 0.0
        best = max(best, row_best)
        if xdrop is not None and row_best < best - xdrop:
            break
        H_prev, F_prev = H_row, F_row
    return int(best)


def scalar_search(
    queries: list[str],
    targets: list[str],
    mask: bool = False,
    xdrop: int | None = None,
    expand_threshold: int | None = None,
    max_per_pos: int = 20,
) -> dict:
    """(q_idx, t_idx) -> (raw, bits, evalue) for every surviving pair.

    ``mask``: tantan-mask the queries (golden_tools.tantan_mask_scalar —
    the independent transliteration) before extraction; alignment still
    runs on the unmasked residues, as in the engine and the reference.
    ``expand_threshold``: T2 similar-k-mer expansion via
    golden_tools.brute_expand (the independent enumerator), exact row
    always kept, duplicates preserved (engine/reference behavior)."""
    from tests.golden_tools import brute_expand, decode_kmer, tantan_mask_scalar

    db_residues = sum(len(t) for t in targets)
    probe_seqs = [tantan_mask_scalar(q) if mask else q for q in queries]
    expand_memo: dict[str, list[str]] = {}

    def probe_rows(seq: str):
        for p in range(len(seq) - K + 1):
            w = seq[p : p + K]
            if not all(c in AMINO_ALPHABET for c in w):
                continue
            yield p, w
            if expand_threshold is not None:
                if w not in expand_memo:
                    wc = [AMINO_ALPHABET.index(c) for c in w]
                    expand_memo[w] = [
                        decode_kmer(code, K)
                        for code, _s in brute_expand(wc, expand_threshold, max_per_pos)
                    ]
                for s in expand_memo[w]:
                    yield p, s
    # J2 index: kmer -> representative target (longest, ties earliest)
    rep: dict[str, tuple[int, int]] = {}
    for tid, seq in enumerate(targets):
        for w in windows(seq):
            cand = (-len(seq), tid)
            if w not in rep or cand < rep[w]:
                rep[w] = cand
    index = {w: tid for w, (_n, tid) in rep.items()}
    # first valid k-mer position per target (the reference's lower_bound)
    tpos_first: list[dict[str, int]] = []
    for seq in targets:
        d: dict[str, int] = {}
        for p in range(len(seq) - K + 1):
            w = seq[p : p + K]
            if all(c in AMINO_ALPHABET for c in w) and w not in d:
                d[w] = p
        tpos_first.append(d)

    # prefilter: matched (qpos, kmer) rows per (query, rep target), HAVING > REQ
    pairs: dict[tuple[int, int], list[tuple[int, str]]] = {}
    for qid, seq in enumerate(probe_seqs):
        for p, w in probe_rows(seq):
            if w in index:
                pairs.setdefault((qid, index[w]), []).append((p, w))
    out: dict[tuple[int, int], tuple[int, float, float]] = {}
    for (qid, tid), matches in pairs.items():
        if len(matches) <= REQ:
            continue
        qc, tc = codes(queries[qid]), codes(targets[tid])
        diags = sorted(
            qp - tpos_first[tid][w] for qp, w in matches if w in tpos_first[tid]
        )
        if len(diags) < 2:
            continue
        if not any(b - a <= DIAG_PROX for a, b in zip(diags, diags[1:])):  # F5
            continue
        anchor = None
        for d in dict.fromkeys(diags):  # F6: first passing distinct diagonal
            if KA_UNGAPPED.evalue(ungapped_best(qc, tc, d), len(qc), db_residues) <= MAX_EVALUE:
                anchor = d
                break
        if anchor is None:
            continue
        raw = banded_score(qc, tc, anchor, xdrop=xdrop)
        if raw <= 0:  # F7
            continue
        ev = KA_GAPPED_11_1.evalue(raw, len(qc), db_residues)
        if ev > MAX_EVALUE:  # F8
            continue
        out[(qid, tid)] = (raw, KA_GAPPED_11_1.bit_score(raw), ev)
    return out


def _compare(engine: dict, twin: dict, min_pairs: int) -> None:
    assert set(engine) == set(twin), (
        f"pair-set drift: engine-only {set(engine) - set(twin)}, "
        f"twin-only {set(twin) - set(engine)}"
    )
    assert len(engine) >= min_pairs
    for pair, (raw, bits, ev) in twin.items():
        eraw, ebits, eev = engine[pair]
        assert eraw == raw, f"{pair}: raw {eraw} != twin {raw}"
        assert ebits == bits and eev == ev, f"{pair}: KA drift"


def test_exact_mode_search_matches_scalar_twin(spark):
    q_path = os.path.join(DATA, "golden_queries.fa")
    t_path = os.path.join(DATA, "golden_targets.fa")
    engine = {
        (r["query_id"], r["target_id"]): (r["raw"], r["bits"], r["evalue"])
        for r in search(
            read_fasta(spark, q_path), read_fasta(spark, t_path)
        ).collect()
    }
    _compare(engine, scalar_search(read_fa_scalar(q_path), read_fa_scalar(t_path)), 1)


def test_exact_mode_search_matches_scalar_twin_random_families(spark):
    """Broader band coverage than the committed corpus: 12 random
    queries, each with indel/substitution variants at random offsets (so
    anchors land off-center and gaps cross band slots), plus noise."""
    import random

    from petasearch_spark.sources.fasta import sequences_from_records

    rng = random.Random(20240814)
    AA = AMINO_ALPHABET

    def rand_seq(n):
        return "".join(rng.choice(AA) for _ in range(n))

    def mutate(s):
        out = list(s)
        for _ in range(rng.randint(1, 4)):  # substitutions
            i = rng.randrange(len(out))
            out[i] = rng.choice(AA)
        for _ in range(rng.randint(0, 2)):  # indels
            i = rng.randrange(1, len(out) - 1)
            if rng.random() < 0.5:
                del out[i]
            else:
                out.insert(i, rng.choice(AA))
        return "".join(out)

    queries = [rand_seq(rng.randint(40, 150)) for _ in range(12)]
    targets = []
    for qi, qs in enumerate(queries):
        for v in range(2):
            pad_l, pad_r = rand_seq(rng.randint(0, 25)), rand_seq(rng.randint(0, 25))
            targets.append(pad_l + mutate(qs) + pad_r)
    targets += [rand_seq(rng.randint(50, 160)) for _ in range(10)]
    q_df = sequences_from_records(spark, [(f"q{i}", s) for i, s in enumerate(queries)])
    t_df = sequences_from_records(spark, [(f"t{i}", s) for i, s in enumerate(targets)])
    engine = {
        (r["query_id"], r["target_id"]): (r["raw"], r["bits"], r["evalue"])
        for r in search(q_df, t_df).collect()
    }
    _compare(engine, scalar_search(queries, targets), 12)


def test_masked_xdrop_search_matches_scalar_twin(spark):
    """The gated protein_search_masked CONFIGURATION (tantan masking +
    the reference's x-drop termination), independently twinned: masking
    via the scalar tantan transliteration, x-drop as a per-row frontier
    in the textbook band."""
    q_path = os.path.join(DATA, "golden_queries.fa")
    t_path = os.path.join(DATA, "golden_targets.fa")
    engine = {
        (r["query_id"], r["target_id"]): (r["raw"], r["bits"], r["evalue"])
        for r in search(
            read_fasta(spark, q_path), read_fasta(spark, t_path), mask=True, xdrop=10
        ).collect()
    }
    twin = scalar_search(
        read_fa_scalar(q_path), read_fa_scalar(t_path), mask=True, xdrop=10
    )
    _compare(engine, twin, 1)


def test_expanded_search_matches_scalar_twin(spark):
    """The reference's default sensitivity mode (T2 expansion at
    --k-score 225), independently twinned via the brute-force
    enumerator; duplicates from re-included exact k-mers preserved."""
    q_path = os.path.join(DATA, "golden_queries.fa")
    t_path = os.path.join(DATA, "golden_targets.fa")
    engine = {
        (r["query_id"], r["target_id"]): (r["raw"], r["bits"], r["evalue"])
        for r in search(
            read_fasta(spark, q_path), read_fasta(spark, t_path), expand_similar=True
        ).collect()
    }
    twin = scalar_search(
        read_fa_scalar(q_path), read_fa_scalar(t_path), expand_threshold=225
    )
    _compare(engine, twin, 1)
