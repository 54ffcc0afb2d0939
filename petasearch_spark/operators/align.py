"""Gapped alignment stage (SURVEY §2: J3 + O4/O5 + F5-F8 + UDF 3).

Reference (`blockalign`, /root/reference/src/sra/blockalign.cpp): per
(target, query) pair surviving the prefilter —

1. re-derive target k-mer positions and compute ``diag = qpos - tpos``
   per matched k-mer (250-299; J3),
2. drop the pair unless ≥2 matches lie within 4 diagonals of each other
   (isWithinNDiagonals, 61-69, call 303; F5),
3. per distinct diagonal, ungapped rescore (DistanceCalculator::
   computeUngappedAlignment, lib/mmseqs/src/alignment/DistanceCalculator.h:94-149);
   accept at the first diagonal whose ungapped e-value passes (71-117; F6),
4. gapped x-drop block alignment anchored at that diagonal
   (BlockAligner::align, src/commons/BlockAligner.cpp:225-316) — here a
   banded affine-gap Smith-Waterman restricted to diagonals within
   ±band/2 of the anchor (band default 32 = the reference's block size,
   LocalParameters.h:146-147),
5. drop zero-length alignments (403-406; F7) and e-values above the
   threshold (411-414; F8), then swap to query-keyed output
   (Matcher::result_t::swapResult semantics, 435-440; P6).

Spark design: the kernel is a pure numpy function over one (qseq, tseq,
matches) row — no cross-row state — so it runs under ``mapInPandas``:
Arrow-batched, embarrassingly parallel, no shuffle beyond the one
groupBy that collects each pair's k-mer matches. Batches are kept small
(session.py caps arrow batch records) because rows carry whole sequences.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.scoring import BLOSUM62, KA_GAPPED_11_1, KA_UNGAPPED

#: defaults from /root/reference/src/workflow/petasearch.cpp:11-15 and
#: src/commons/LocalParameters.h:144-152
DEFAULT_EVALUE = 1000.0
DEFAULT_BAND = 32
DEFAULT_GAP_OPEN = 11
DEFAULT_GAP_EXTEND = 1
DIAG_PROXIMITY = 4  # hard-coded N=4, blockalign.cpp:61-69

_CODE = {c: i for i, c in enumerate(AMINO_ALPHABET)}


def _encode(seq: str) -> np.ndarray:
    """residue string -> int codes; invalid residues (X etc.) -> -1."""
    return np.array([_CODE.get(c, -1) for c in seq], dtype=np.int64)


def _kmer_positions(codes: np.ndarray, k: int) -> dict[int, int]:
    """kmer code -> FIRST position in the sequence (the reference's
    lower_bound lookup returns the first entry for the kmer,
    blockalign.cpp:282-287)."""
    out: dict[int, int] = {}
    n = len(codes)
    if n < k:
        return out
    a = len(AMINO_ALPHABET)
    code = 0
    valid = 0  # consecutive valid residues ending at i
    for i in range(n):
        c = codes[i]
        if c < 0:
            valid = 0
            code = 0
            continue
        code = (code * a + c) % (a ** k)
        valid += 1
        if valid >= k:
            pos = i - k + 1
            km = code % (a ** k)
            if km not in out:
                out[km] = pos
    return out


def ungapped_score(qc: np.ndarray, tc: np.ndarray, diag: int, matrix: np.ndarray = BLOSUM62) -> tuple[int, int, int]:
    """Best ungapped local score along `diag` (= qpos - tpos): max
    subarray of substitution scores (F6's rescore). Returns
    (score, qstart, qend_exclusive). Invalid residues score -1."""
    # overlap of q[i+diag] vs t[i]
    t_lo = max(0, -diag)
    t_hi = min(len(tc), len(qc) - diag)
    if t_hi <= t_lo:
        return 0, 0, 0
    ts = tc[t_lo:t_hi]
    qs = qc[t_lo + diag : t_hi + diag]
    ok = (ts >= 0) & (qs >= 0)
    s = np.where(ok, matrix[np.where(ok, ts, 0), np.where(ok, qs, 0)], -1).astype(np.int64)
    # Kadane with position tracking
    best = cur = 0
    best_s = best_e = cur_s = 0
    for i, v in enumerate(s):
        cur += int(v)
        if cur <= 0:
            cur = 0
            cur_s = i + 1
        elif cur > best:
            best = cur
            best_s, best_e = cur_s, i + 1
    return best, t_lo + diag + best_s, t_lo + diag + best_e


def banded_sw(
    qc: np.ndarray,
    tc: np.ndarray,
    anchor_diag: int,
    band: int = DEFAULT_BAND,
    gap_open: int = DEFAULT_GAP_OPEN,
    gap_extend: int = DEFAULT_GAP_EXTEND,
    matrix: np.ndarray = BLOSUM62,
):
    """Banded affine-gap local alignment around `anchor_diag`.

    Returns None or a dict with raw score, 0-based [qstart,qend) /
    [tstart,tend), backtrace (M/I/D relative to (query, target): M =
    aligned pair, I = target gap / query residue consumed, D = query gap).
    """
    half = band // 2
    d_lo, d_hi = anchor_diag - half, anchor_diag + half  # inclusive band of diagonals
    B = d_hi - d_lo + 1
    n_t, n_q = len(tc), len(qc)
    NEG = -(10 ** 9)

    H_prev = np.full(B, 0, dtype=np.int64)
    F_prev = np.full(B, NEG, dtype=np.int64)
    # pointers: 0 stop, 1 diag(M), 2 left(E: gap in target→'I'? see below), 3 up(F)
    ptr_H = np.zeros((n_t, B), dtype=np.uint8)
    ptr_E = np.zeros((n_t, B), dtype=np.uint8)  # 1 = extended (came from E)
    ptr_F = np.zeros((n_t, B), dtype=np.uint8)
    best = 0
    best_ij = None

    for i in range(n_t):
        H_row = np.zeros(B, dtype=np.int64)
        E = NEG
        F_row = np.full(B, NEG, dtype=np.int64)
        tci = tc[i]
        for b in range(B):
            j = i + d_lo + b  # query index
            if j < 0 or j >= n_q:
                H_row[b] = 0
                E = NEG
                continue
            # E: gap in query? moving j-1 -> j at same i means consuming a
            # query residue opposite a gap in the target ('I').
            e_open = H_row[b - 1] - gap_open if b > 0 else NEG
            e_ext = E - gap_extend
            E = max(e_open, e_ext)
            ptr_E[i, b] = 1 if e_ext > e_open else 0
            # F: consuming a target residue opposite a gap in query ('D');
            # i-1 -> i at same j is band index b+1 in the previous row.
            f_open = (H_prev[b + 1] - gap_open) if b + 1 < B else NEG
            f_ext = (F_prev[b + 1] - gap_extend) if b + 1 < B else NEG
            F_row[b] = max(f_open, f_ext)
            ptr_F[i, b] = 1 if f_ext > f_open else 0
            # H: diagonal move keeps the band index (same b, previous row)
            sub = matrix[tci, qc[j]] if (tci >= 0 and qc[j] >= 0) else -1
            diag_sc = H_prev[b] + sub
            h = max(0, diag_sc, E, F_row[b])
            H_row[b] = h
            if h == 0:
                ptr_H[i, b] = 0
            elif h == diag_sc:
                ptr_H[i, b] = 1
            elif h == E:
                ptr_H[i, b] = 2
            else:
                ptr_H[i, b] = 3
            if h > best:
                best = h
                best_ij = (i, b)
        H_prev = H_row
        F_prev = F_row

    if best <= 0 or best_ij is None:
        return None

    # backtrace
    i, b = best_ij
    bt: list[str] = []
    state = "H"
    while i >= 0:
        j = i + d_lo + b
        if state == "H":
            p = ptr_H[i, b]
            if p == 0:
                break
            if p == 1:
                bt.append("M")
                i -= 1  # diagonal move keeps the band index
            elif p == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            bt.append("I")
            ext = ptr_E[i, b]
            b -= 1
            state = "E" if ext else "H"
        else:  # F
            bt.append("D")
            ext = ptr_F[i, b]
            i -= 1
            b += 1
            state = "F" if ext else "H"
        if b < 0 or b >= B:
            break
    bt.reverse()
    if not bt:
        return None
    end_i, end_b = best_ij
    qend = end_i + d_lo + end_b + 1
    tend = end_i + 1
    n_m = bt.count("M")
    n_i = bt.count("I")
    n_d = bt.count("D")
    qstart = qend - n_m - n_i
    tstart = tend - n_m - n_d
    backtrace = "".join(bt)
    # stats (P7): identities, mismatches, gap opens
    nident = 0
    for off, op in _walk(backtrace):
        qi, ti = off
        if op == "M" and qc[qstart + qi] == tc[tstart + ti] and qc[qstart + qi] >= 0:
            nident += 1
    gapopen = _count_gap_opens(backtrace)
    alnlen = len(backtrace)
    mismatch = n_m - nident
    return {
        "score": int(best),
        "qstart": int(qstart),
        "qend": int(qend),
        "tstart": int(tstart),
        "tend": int(tend),
        "alnlen": int(alnlen),
        "nident": int(nident),
        "mismatch": int(mismatch),
        "gapopen": int(gapopen),
        "backtrace": backtrace,
    }


def _walk(backtrace: str):
    qi = ti = 0
    for op in backtrace:
        yield (qi, ti), op
        if op == "M":
            qi += 1
            ti += 1
        elif op == "I":
            qi += 1
        else:
            ti += 1


def _count_gap_opens(backtrace: str) -> int:
    opens = 0
    prev = "M"
    for op in backtrace:
        if op in "ID" and op != prev:
            opens += 1
        prev = op
    return opens


def align_pair_kernel(
    qseq: str,
    tseq: str,
    kmers: list[int],
    qpositions: list[int],
    k: int,
    db_residues: int,
    max_evalue: float = DEFAULT_EVALUE,
    band: int = DEFAULT_BAND,
    gap_open: int = DEFAULT_GAP_OPEN,
    gap_extend: int = DEFAULT_GAP_EXTEND,
):
    """Full per-pair cascade F5 -> F6 -> gapped -> F7/F8. Returns None or
    an alignment dict (adds bits/evalue/fident)."""
    qc, tc = _encode(qseq), _encode(tseq)
    tpos = _kmer_positions(tc, k)
    diags = []
    for km, qp in zip(kmers, qpositions):
        tp = tpos.get(int(km))
        if tp is None:
            # reference hard-errors here (blockalign.cpp:290-298); with J2
            # parity the kmer is always present. Skip defensively.
            continue
        diags.append(int(qp) - int(tp))
    if len(diags) < 2:
        return None
    diags.sort()
    # F5: ≥2 matches within 4 diagonals of each other
    darr = np.array(diags)
    if not (np.diff(darr) <= DIAG_PROXIMITY).any():
        return None
    # F6: ungapped rescore per distinct diagonal, first passing wins
    anchor = None
    for d in dict.fromkeys(diags):
        sc, _, _ = ungapped_score(qc, tc, d)
        ev = KA_UNGAPPED.evalue(sc, len(qc), db_residues)
        if ev <= max_evalue:
            anchor = d
            break
    if anchor is None:
        return None
    res = banded_sw(qc, tc, anchor, band=band, gap_open=gap_open, gap_extend=gap_extend)
    if res is None or res["alnlen"] == 0:  # F7
        return None
    res["bits"] = KA_GAPPED_11_1.bit_score(res["score"])
    res["evalue"] = KA_GAPPED_11_1.evalue(res["score"], len(qc), db_residues)
    res["fident"] = res["nident"] / res["alnlen"] if res["alnlen"] else 0.0
    if res["evalue"] > max_evalue:  # F8
        return None
    return res


ALIGN_SCHEMA = (
    "query_id long, target_id long, query_accession string, target_accession string, "
    "bits double, evalue double, raw int, fident double, alnlen int, mismatch int, "
    "gapopen int, nident int, qstart int, qend int, qlen int, tstart int, tend int, "
    "tlen int, backtrace string"
)


def align_pairs(
    prefilter_pairs: DataFrame,
    queries: DataFrame,
    targets: DataFrame,
    k: int = 9,
    max_evalue: float = DEFAULT_EVALUE,
    band: int = DEFAULT_BAND,
    gap_open: int = DEFAULT_GAP_OPEN,
    gap_extend: int = DEFAULT_GAP_EXTEND,
    db_residues: int | None = None,
) -> DataFrame:
    """prefilter_pairs(target_id, query_id, kmer, pos) + sequence tables ->
    alignments (FIXTURES.md §1 schema, 1-based coords, query-keyed).

    Plan shape: one groupBy to collect each pair's matches, two joins to
    fetch sequences (query side broadcast — it is the small side in the
    reference's design too, comparekmertables.cpp:387-391), then a
    mapInPandas over independent rows. No other shuffle.
    """
    if db_residues is None:
        db_residues = targets.agg(F.sum(F.length("sequence"))).collect()[0][0] or 1

    grouped = prefilter_pairs.groupBy("query_id", "target_id").agg(
        F.collect_list("kmer").alias("kmers"),
        F.collect_list("pos").alias("qpositions"),
    )
    q = queries.select(
        F.col("seq_id").alias("query_id"),
        F.col("accession").alias("query_accession"),
        F.col("sequence").alias("qseq"),
    )
    t = targets.select(
        F.col("seq_id").alias("target_id"),
        F.col("accession").alias("target_accession"),
        F.col("sequence").alias("tseq"),
    )
    rows = grouped.join(F.broadcast(q), "query_id").join(t, "target_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "query_id", "target_id", "query_accession", "target_accession",
            "bits", "evalue", "raw", "fident", "alnlen", "mismatch", "gapopen",
            "nident", "qstart", "qend", "qlen", "tstart", "tend", "tlen", "backtrace",
        ]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                res = align_pair_kernel(
                    r.qseq, r.tseq, r.kmers, r.qpositions, k, db_residues,
                    max_evalue=max_evalue, band=band,
                    gap_open=gap_open, gap_extend=gap_extend,
                )
                if res is None:
                    continue
                out.append(
                    (
                        r.query_id, r.target_id, r.query_accession, r.target_accession,
                        res["bits"], res["evalue"], res["score"], res["fident"],
                        res["alnlen"], res["mismatch"], res["gapopen"], res["nident"],
                        res["qstart"] + 1, res["qend"], len(r.qseq),
                        res["tstart"] + 1, res["tend"], len(r.tseq),
                        res["backtrace"],
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return rows.mapInPandas(run, schema=ALIGN_SCHEMA)
