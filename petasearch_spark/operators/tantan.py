"""tantan repeat masking — the reference's ACTUAL T3 algorithm.

The reference masks query sequences with tantan (Frith 2011, NAR 39(4):e23)
before k-mer extraction (/root/reference/src/sra/comparekmertables.cpp:215-226).
This module implements the same probabilistic model with the reference's
exact invocation parameters, so masked output parity is by construction:

* ``maxRepeatOffset=50, repeatProb=0.005, repeatEndProb=0.05,
  repeatOffsetProbDecay=0.5, firstGapProb=0, otherGapProb=0``
  (comparekmertables.cpp:218-223) and ``minMaskProb=0.9``
  (--mask-prob default, lib/mmseqs/src/commons/Parameters.cpp:2257);
* the likelihood-ratio matrix is ``exp(lambda * S[x][y])`` with the
  public BLOSUM62 half-bit matrix and its precomputed lambda 0.34657
  (ProbabilityMatrix, lib/mmseqs/src/commons/BaseMatrix.h:83-95 —
  probMatrix[i][j]/(pBack[i]*pBack[j]) cancels back to the exponential;
  matrix data: the standard BLOSUM62 frequency table, half-bit scaled);
* masked residues become X (hardMaskTable maps every letter to the X
  code), which the engine's k-mer extraction then skips (F1).

Model (gap probabilities are zero, so the HMM has no indel states —
tantan.cpp:218-245 calcForwardTransitionAndEmissionProbs): one
background state and one repeat state per offset p in 1..50. A repeat
state at position i emits with likelihood ratio LR[seq[i]][seq[i-p]];
the background emits 1. The posterior P(repeat at i) comes from a
scaled forward-backward pass (tantan.cpp:369-398 calcRepeatProbs,
rescale every 16 positions); a residue is masked when the posterior
reaches 0.9. Per-position probabilities are stored in float32 exactly
as the reference does (``float *letterProbs``), including the
``1 - float(nonRepeatProb)`` rounding on the backward pass, so
threshold-edge cases bit-match.

Spark shape: pure per-sequence state, vectorized ACROSS the sequences
of each Arrow batch (state arrays are (batch, 50); the position loop
costs ~10 numpy ops per step for the whole batch). Runs under
mapInPandas — no shuffle, embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

import numpy as np

#: reference invocation constants (comparekmertables.cpp:218-223,
#: Parameters.cpp:2257)
MAX_REPEAT_OFFSET = 50
REPEAT_PROB = 0.005
REPEAT_END_PROB = 0.05
OFFSET_PROB_DECAY = 0.5
MIN_MASK_PROB = 0.9
SCALE_STEP = 16  # tantan.cpp:41 scaleStepSize

#: BLOSUM62 in half-bits with its precomputed lambda — the public
#: substitution-frequency data every BLOSUM62 implementation shares
#: (column order ACDEFGHIKLMNPQRSTVWYX; X rows/cols are -1).
TANTAN_LAMBDA = 0.34657
_B62_ORDER = "ACDEFGHIKLMNPQRSTVWYX"
_B62_HALFBIT = """
 3.9291 -0.4085 -1.7534 -0.8639 -2.2101  0.1596 -1.6251 -1.3218 -0.7340 -1.4646 -0.9353 -1.5307 -0.8143 -0.8040 -1.4135  1.1158 -0.0454 -0.1894 -2.5269 -1.7640 -1.0000
-0.4085  8.5821 -3.4600 -3.6125 -2.3755 -2.5004 -2.9878 -1.2277 -3.0363 -1.2775 -1.4198 -2.6598 -2.7952 -2.9019 -3.3892 -0.8750 -0.8667 -0.8077 -2.3041 -2.4071 -1.0000
-1.7534 -3.4600  5.7742  1.5103 -3.4839 -1.3135 -1.1189 -3.1212 -0.7018 -3.6057 -3.0585  1.2717 -1.4801 -0.3134 -1.6058 -0.2610 -1.0507 -3.1426 -4.2143 -3.0650 -1.0000
-0.8639 -3.6125  1.5103  4.9028 -3.1924 -2.1102 -0.1177 -3.1944  0.7753 -2.8465 -1.9980 -0.2680 -1.1162  1.8546 -0.1154 -0.1469 -0.8633 -2.4423 -2.8354 -2.0205 -1.0000
-2.2101 -2.3755 -3.4839 -3.1924  6.0461 -3.1074 -1.2342 -0.1609 -3.0787  0.4148  0.0126 -2.9940 -3.5973 -3.1644 -2.7863 -2.3690 -2.1076 -0.8490  0.9176  2.9391 -1.0000
 0.1596 -2.5004 -1.3135 -2.1102 -3.1074  5.5633 -2.0409 -3.7249 -1.5280 -3.6270 -2.6766 -0.4228 -2.1335 -1.7852 -2.3041 -0.2925 -1.5754 -3.1387 -2.4915 -3.0398 -1.0000
-1.6251 -2.9878 -1.1189 -0.1177 -1.2342 -2.0409  7.5111 -3.2316 -0.7210 -2.7867 -1.5513  0.5785 -2.1609  0.4480 -0.2499 -0.8816 -1.6859 -3.1175 -2.3422  1.6926 -1.0000
-1.3218 -1.2277 -3.1212 -3.1944 -0.1609 -3.7249 -3.2316  3.9985 -2.6701  1.5216  1.1268 -3.2170 -2.7567 -2.7696 -2.9902 -2.3482 -0.7176  2.5470 -2.5805 -1.3314 -1.0000
-0.7340 -3.0363 -0.7018  0.7753 -3.0787 -1.5280 -0.7210 -2.6701  4.5046 -2.4468 -1.3547 -0.1790 -1.0136  1.2726  2.1087 -0.2034 -0.6696 -2.2624 -2.9564 -1.8200 -1.0000
-1.4646 -1.2775 -3.6057 -2.8465  0.4148 -3.6270 -2.7867  1.5216 -2.4468  3.8494  1.9918 -3.3789 -2.8601 -2.1339 -2.1546 -2.4426 -1.1975  0.7884 -1.6319 -1.0621 -1.0000
-0.9353 -1.4198 -3.0585 -1.9980  0.0126 -2.6766 -1.5513  1.1268 -1.3547  1.9918  5.3926 -2.1509 -2.4764 -0.4210 -1.3671 -1.4809 -0.6663  0.6872 -1.4248 -0.9949 -1.0000
-1.5307 -2.6598  1.2717 -0.2680 -2.9940 -0.4228  0.5785 -3.2170 -0.1790 -3.3789 -2.1509  5.6532 -2.0004  0.0017 -0.4398  0.6009 -0.0461 -2.8763 -3.6959 -2.0818 -1.0000
-0.8143 -2.7952 -1.4801 -1.1162 -3.5973 -2.1335 -2.1609 -2.7567 -1.0136 -2.8601 -2.4764 -2.0004  7.3646 -1.2819 -2.1086 -0.8090 -1.0753 -2.3487 -3.6542 -2.9198 -1.0000
-0.8040 -2.9019 -0.3134  1.8546 -3.1644 -1.7852  0.4480 -2.7696  1.2726 -2.1339 -0.4210  0.0017 -1.2819  5.2851  0.9828 -0.1011 -0.6753 -2.1984 -1.9465 -1.4211 -1.0000
-1.4135 -3.3892 -1.6058 -0.1154 -2.7863 -2.3041 -0.2499 -2.9902  2.1087 -2.1546 -1.3671 -0.4398 -2.1086  0.9828  5.4735 -0.7648 -1.1223 -2.5026 -2.6794 -1.6939 -1.0000
 1.1158 -0.8750 -0.2610 -0.1469 -2.3690 -0.2925 -0.8816 -2.3482 -0.2034 -2.4426 -1.4809  0.6009 -0.8090 -0.1011 -0.7648  3.8844  1.3811 -1.6462 -2.7519 -1.6858 -1.0000
-0.0454 -0.8667 -1.0507 -0.8633 -2.1076 -1.5754 -1.6859 -0.7176 -0.6696 -1.1975 -0.6663 -0.0461 -1.0753 -0.6753 -1.1223  1.3811  4.5453 -0.0555 -2.4289 -1.6060 -1.0000
-0.1894 -0.8077 -3.1426 -2.4423 -0.8490 -3.1387 -3.1175  2.5470 -2.2624  0.7884  0.6872 -2.8763 -2.3487 -2.1984 -2.5026 -1.6462 -0.0555  3.7689 -2.8343 -1.2075 -1.0000
-2.5269 -2.3041 -4.2143 -2.8354  0.9176 -2.4915 -2.3422 -2.5805 -2.9564 -1.6319 -1.4248 -3.6959 -3.6542 -1.9465 -2.6794 -2.7519 -2.4289 -2.8343 10.5040  2.1542 -1.0000
-1.7640 -2.4071 -3.0650 -2.0205  2.9391 -3.0398  1.6926 -1.3314 -1.8200 -1.0621 -0.9949 -2.0818 -2.9198 -1.4211 -1.6939 -1.6858 -1.6060 -1.2075  2.1542  6.5950 -1.0000
-1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000 -1.0000
"""

X_CODE = len(_B62_ORDER) - 1  # 20


def _likelihood_ratios() -> np.ndarray:
    s = np.array([[float(v) for v in ln.split()] for ln in _B62_HALFBIT.strip().splitlines()])
    return np.exp(TANTAN_LAMBDA * s)


_LR = _likelihood_ratios()

_CODE_LUT = np.full(128, X_CODE, dtype=np.int64)  # unknown letters -> X
for _i, _c in enumerate(_B62_ORDER):
    _CODE_LUT[ord(_c)] = _i


def _encode_x(seq: str) -> np.ndarray:
    b = np.frombuffer(seq.encode("ascii", "replace"), dtype=np.uint8)
    return _CODE_LUT[b & 0x7F]


# derived transition constants (tantan.cpp:97-121)
_B2B = 1.0 - REPEAT_PROB
_F2B = REPEAT_END_PROB
_F2F0 = 1.0 - REPEAT_END_PROB
_B2F_FIRST = REPEAT_PROB * (1.0 - OFFSET_PROB_DECAY) / (
    1.0 - OFFSET_PROB_DECAY ** MAX_REPEAT_OFFSET
)
_B2F = _B2F_FIRST * OFFSET_PROB_DECAY ** np.arange(MAX_REPEAT_OFFSET, dtype=np.float64)


def repeat_probs_batch(seqs: list[str]) -> list[np.ndarray]:
    """Per-sequence float32 posterior repeat probabilities — the scaled
    forward-backward of tantan.cpp:369-398 (gapless path), vectorized
    across the batch. Returns one (len(seq),) float32 array per input."""
    B = len(seqs)
    if B == 0:
        return []
    # NULL sequences have no residues (len 0) — len(None) crashed the
    # whole masking task on a corpus with NULL-text docs (round-6 fuzz);
    # the encode loop below already skips falsy entries
    lens = np.fromiter((0 if s is None else len(s) for s in seqs), dtype=np.int64, count=B)
    L = max(1, int(lens.max()))
    P = MAX_REPEAT_OFFSET
    codes = np.full((B, L), X_CODE, dtype=np.int64)
    for i, s in enumerate(seqs):
        if s:
            codes[i, : lens[i]] = _encode_x(s)

    bg = np.ones(B, dtype=np.float64)
    fg = np.zeros((B, P), dtype=np.float64)
    letter = np.zeros((B, L), dtype=np.float32)
    n_scales = (L + SCALE_STEP - 1) // SCALE_STEP
    scales = np.ones((B, n_scales), dtype=np.float64)

    # forward: transition+emission, rescale every 16 positions, record
    # the background probability per position (tantan.cpp:302-326,369-378)
    for idx in range(L):
        active = idx < lens
        m = min(idx, P)
        if m > 0:
            prev = codes[:, idx - m : idx][:, ::-1]  # offsets 1..m
            lrv = _LR[codes[:, idx][:, None], prev]
            from_f = fg[:, :m].sum(axis=1)
            newf = (bg[:, None] * _B2F[:m] + fg[:, :m] * _F2F0) * lrv
            fg[:, :m] = np.where(active[:, None], newf, fg[:, :m])
        else:
            from_f = np.zeros(B)
        bg = np.where(active, bg * _B2B + from_f * _F2B, bg)
        if idx % SCALE_STEP == SCALE_STEP - 1:
            s = np.where(active & (bg > 0), 1.0 / np.where(bg > 0, bg, 1.0), 1.0)
            scales[:, idx // SCALE_STEP] = s
            bg = bg * s
            fg = fg * s[:, None]
        letter[:, idx] = np.where(active, bg, 0.0).astype(np.float32)

    z = bg * _B2B + fg.sum(axis=1) * _F2B  # forwardTotal, tantan.cpp:131-137

    # backward (tantan.cpp:140-144,328-345,380-395): posterior at idx uses
    # the forward-recorded letter prob and the backward background BEFORE
    # this position's rescale/emission; the 1 - float(nonRepeat) rounding
    # mirrors the reference's float letterProbs exactly.
    bg = np.full(B, _B2B, dtype=np.float64)
    fg = np.full((B, P), _F2B, dtype=np.float64)
    out = np.zeros((B, L), dtype=np.float32)
    for idx in range(L - 1, -1, -1):
        active = idx < lens
        non_rep = letter[:, idx].astype(np.float64) * bg / z
        out[:, idx] = np.where(
            active, np.float32(1.0) - non_rep.astype(np.float32), 0.0
        )
        if idx % SCALE_STEP == SCALE_STEP - 1:
            s = scales[:, idx // SCALE_STEP]
            bg = bg * s
            fg = fg * s[:, None]
        m = min(idx, P)
        if m > 0:
            prev = codes[:, idx - m : idx][:, ::-1]
            lrv = _LR[codes[:, idx][:, None], prev]
            f = fg[:, :m] * lrv
            to_f = (f * _B2F[:m]).sum(axis=1)
            newf = (_F2B * bg)[:, None] + _F2F0 * f
            fg[:, :m] = np.where(active[:, None], newf, fg[:, :m])
        else:
            to_f = np.zeros(B)
        bg = np.where(active, _B2B * bg + to_f, bg)

    return [out[i, : lens[i]].copy() for i in range(B)]


def tantan_mask_batch(seqs: list[str], min_mask_prob: float = MIN_MASK_PROB) -> list[str]:
    """Mask residues whose posterior repeat probability reaches
    `min_mask_prob` (maskProbableLetters, tantan.cpp:475-491): letters
    become X, the engine's k-mer extraction then skips them (F1)."""
    probs = repeat_probs_batch(seqs)
    out = []
    for s, p in zip(seqs, probs):
        if len(s) == 0 or not (p >= min_mask_prob).any():
            out.append(s)
            continue
        b = np.frombuffer(s.encode("ascii", "replace"), dtype=np.uint8).copy()
        b[p >= min_mask_prob] = ord("X")
        out.append(b.tobytes().decode("ascii"))
    return out
