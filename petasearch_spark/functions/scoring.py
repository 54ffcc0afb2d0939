"""Substitution matrix + Karlin-Altschul scoring.

The reference fits λ/K at runtime via the ALP library
(/root/reference/lib/mmseqs/src/alignment/EvalueComputation.h:49-153) for its
default BLOSUM62 / gap 11,1 configuration. We use the published NCBI BLAST
constants for the same configuration (public Karlin-Altschul parameter
tables), broadcast as plain Python floats:

* ungapped BLOSUM62:        λ = 0.3176, K = 0.134
* gapped  BLOSUM62 (11,1):  λ = 0.267,  K = 0.041

Formulae (EvalueComputation.h:18-46):
    bit(S)    = (λ·S − ln K) / ln 2
    evalue(S) = K · qLen · dbResidues · exp(−λ·S)
where dbResidues = total residue count of the target set
(SRADBReader::getAminoAcidDBSize, /root/reference/src/commons/SRADBReader.cpp:321-331).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from petasearch_spark.functions.kmer import AMINO_ALPHABET

# Standard NCBI BLOSUM62, rows/cols in NCBI order.
_NCBI_ORDER = "ARNDCQEGHILKMFPSTWYV"
_BLOSUM62_NCBI = [
    # A   R   N   D   C   Q   E   G   H   I   L   K   M   F   P   S   T   W   Y   V
    [4, -1, -2, -2, 0, -1, -1, 0, -2, -1, -1, -1, -1, -2, -1, 1, 0, -3, -2, 0],      # A
    [-1, 5, 0, -2, -3, 1, 0, -2, 0, -3, -2, 2, -1, -3, -2, -1, -1, -3, -2, -3],      # R
    [-2, 0, 6, 1, -3, 0, 0, 0, 1, -3, -3, 0, -2, -3, -2, 1, 0, -4, -2, -3],          # N
    [-2, -2, 1, 6, -3, 0, 2, -1, -1, -3, -4, -1, -3, -3, -1, 0, -1, -4, -3, -3],     # D
    [0, -3, -3, -3, 9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1],  # C
    [-1, 1, 0, 0, -3, 5, 2, -2, 0, -3, -2, 1, 0, -3, -1, 0, -1, -2, -1, -2],         # Q
    [-1, 0, 0, 2, -4, 2, 5, -2, 0, -3, -3, 1, -2, -3, -1, 0, -1, -3, -2, -2],        # E
    [0, -2, 0, -1, -3, -2, -2, 6, -2, -4, -4, -2, -3, -3, -2, 0, -2, -2, -3, -3],    # G
    [-2, 0, 1, -1, -3, 0, 0, -2, 8, -3, -3, -1, -2, -1, -2, -1, -2, -2, 2, -3],      # H
    [-1, -3, -3, -3, -1, -3, -3, -4, -3, 4, 2, -3, 1, 0, -3, -2, -1, -3, -1, 3],     # I
    [-1, -2, -3, -4, -1, -2, -3, -4, -3, 2, 4, -2, 2, 0, -3, -2, -1, -2, -1, 1],     # L
    [-1, 2, 0, -1, -3, 1, 1, -2, -1, -3, -2, 5, -1, -3, -1, 0, -1, -3, -2, -2],      # K
    [-1, -1, -2, -3, -1, 0, -2, -3, -2, 1, 2, -1, 5, 0, -2, -1, -1, -1, -1, 1],      # M
    [-2, -3, -3, -3, -2, -3, -3, -3, -1, 0, 0, -3, 0, 6, -4, -2, -2, 1, 3, -1],      # F
    [-1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4, 7, -1, -1, -4, -3, -2], # P
    [1, -1, 1, 0, -1, 0, 0, 0, -1, -2, -2, 0, -1, -2, -1, 4, 1, -3, -2, -2],         # S
    [0, -1, 0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1, 1, 5, -2, -2, 0],     # T
    [-3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1, 1, -4, -3, -2, 11, 2, -3],  # W
    [-2, -2, -2, -3, -2, -1, -2, -3, 2, -1, -1, -2, -1, 3, -3, -2, -2, 2, 7, -1],    # Y
    [0, -3, -3, -3, -1, -2, -2, -3, -3, 3, 1, -2, 1, -1, -2, -2, 0, -3, -1, 4],      # V
]


def _build_matrix(alphabet: str = AMINO_ALPHABET) -> np.ndarray:
    """BLOSUM62 as a |alphabet|×|alphabet| int matrix indexed by the
    engine's alphabet codes (index in AMINO_ALPHABET)."""
    idx = {c: i for i, c in enumerate(_NCBI_ORDER)}
    m = np.zeros((len(alphabet), len(alphabet)), dtype=np.int32)
    for i, a in enumerate(alphabet):
        for j, b in enumerate(alphabet):
            m[i, j] = _BLOSUM62_NCBI[idx[a]][idx[b]]
    return m


#: BLOSUM62 indexed by AMINO_ALPHABET codes. Small (20×20 int32) — shipped
#: to executors by closure capture; no broadcast variable needed.
BLOSUM62: np.ndarray = _build_matrix()


@dataclass(frozen=True)
class KarlinAltschul:
    """λ/K for one (matrix, gap) configuration."""

    lam: float
    k: float
    log_k: float

    def evalue(self, score: float, qlen: int, db_residues: int) -> float:
        return self.k * qlen * db_residues * math.exp(-self.lam * score)

    def bit_score(self, score: float) -> float:
        return (self.lam * score - self.log_k) / math.log(2)


#: published NCBI constants for BLOSUM62
KA_UNGAPPED = KarlinAltschul(lam=0.3176, k=0.134, log_k=math.log(0.134))
KA_GAPPED_11_1 = KarlinAltschul(lam=0.267, k=0.041, log_k=math.log(0.041))


# --- MMseqs-style scaled seed matrix (the similar-k-mer expansion scale) ---
#
# The reference builds its expansion matrix as
# ``SubstitutionMatrix(blosum62, bitFactor=8.0, scoreBias=-0.2)``
# (/root/reference/src/sra/comparekmertables.cpp:137): it re-estimates the
# matrix's own ungapped λ and background frequencies from the half-bit
# integer scores (SubstitutionMatrix.cpp:399-415, the classical Yu-Altschul
# inversion), converts to bits (BaseMatrix::generateSubMatrix,
# lib/mmseqs/src/commons/BaseMatrix.cpp:127 — entries become λ·s/ln2), then
# scales/rounds: ``round_half_away(8.0 · bits − 0.2)``
# (BaseMatrix.cpp:151-153). --k-score 225 (LocalParameters.h:150) is a
# threshold in THIS scale (≈ 3.74× the raw half-bit units for BLOSUM62).


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """C-style ``(short)(x<0 ? x-0.5 : x+0.5)`` — truncation toward zero
    after the half offset (BaseMatrix.cpp:152)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def estimate_lambda(matrix: np.ndarray) -> tuple[float, np.ndarray]:
    """Ungapped λ and background frequencies implied by an integer scoring
    matrix (Yu & Altschul's matrix inversion, the computation behind
    MMseqs' estimateLambdaAndBackground / ALP's calculate_lambda,
    SubstitutionMatrix.cpp:61-89): find λ>0 and p≥0, Σp=1 with
    Σ_j p_j·exp(λ·s_ij) = 1 for every i. For fixed λ solve the linear
    system for q = p·Σ; the root of Σq−1 in λ is unique on the branch
    where q stays positive — bisection from a bracket inside it."""
    S = matrix.astype(np.float64)
    ones = np.ones(S.shape[0])

    def q_of(lam: float) -> np.ndarray:
        return np.linalg.solve(np.exp(lam * S), ones)

    lo, hi = 0.15, 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if q_of(mid).sum() > 1.0:
            lo = mid
        else:
            hi = mid
    lam = 0.5 * (lo + hi)
    q = q_of(lam)
    if q.min() <= 0:
        raise ValueError("lambda estimation left the positive branch")
    return lam, q / q.sum()


SEED_BIT_FACTOR = 8.0
SEED_SCORE_BIAS = -0.2

#: λ ≈ 0.3240 for the half-bit BLOSUM62 (NCBI's published 0.3176 is for
#: the un-rounded log-odds; MMseqs estimates from the rounded integers,
#: and so do we), plus the implied background frequencies.
SEED_LAMBDA, SEED_PBACK = estimate_lambda(BLOSUM62)

#: the expansion-scale matrix: what --k-score 225 thresholds against.
KMER_SEED_MATRIX: np.ndarray = _round_half_away(
    SEED_BIT_FACTOR * SEED_LAMBDA * BLOSUM62 / math.log(2) + SEED_SCORE_BIAS
).astype(np.int32)


# --- nucleotide mode (the reference's DBTYPE_NUCLEOTIDES branch,
# /root/reference/src/sra/comparekmertables.cpp:129-143: alphabet of 5,
# match/mismatch scoring instead of BLOSUM) -----------------------------
NUCL_ALPHABET = "ACGT"  # N and anything else encode to -1 = invalid (F1)

#: blastn-style +2/-3 match/mismatch matrix over ACGT codes
NUCL_MATRIX: np.ndarray = np.where(np.eye(4, dtype=bool), 2, -3).astype(np.int32)

#: published NCBI megablast-family constants for +2/-3, gap 5/2
KA_NUCL_UNGAPPED = KarlinAltschul(lam=0.625, k=0.41, log_k=math.log(0.41))
KA_NUCL_GAPPED = KarlinAltschul(lam=0.625, k=0.41, log_k=math.log(0.41))


def bit_score_expr(raw: Column, ka: KarlinAltschul = KA_GAPPED_11_1) -> Column:
    """Column-expression bit score (EvalueComputation.h:18-20)."""
    return (F.lit(ka.lam) * raw - F.lit(ka.log_k)) / F.lit(math.log(2))


def evalue_expr(raw: Column, qlen: Column, db_residues: Column | int, ka: KarlinAltschul = KA_GAPPED_11_1) -> Column:
    """Column-expression e-value (EvalueComputation.h:36-46)."""
    dbr = F.lit(db_residues) if isinstance(db_residues, int) else db_residues
    return F.lit(ka.k) * qlen * dbr * F.exp(-F.lit(ka.lam) * raw)
