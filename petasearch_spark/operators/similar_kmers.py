"""Similar-k-mer expansion (SURVEY §2.3 T2) — the reference's sensitivity
mechanism: for every query k-mer, also probe the index with the
highest-scoring *similar* k-mers under the substitution matrix.

Reference (/root/reference): FixedKmerGenerator::generateKmerList
(src/commons/FixedKmerGenerator.cpp:288-343) splits the k-mer into 2/3-mer
chunks, looks each chunk up in a precomputed ExtendedSubstitutionMatrix
(all 20^c substitutions of the chunk, sorted by score;
lib/mmseqs/src/prefiltering/ExtendedSubstitutionMatrix.h:13), and lazily
merges the per-chunk sorted lists with top-N heaps (131-286), emitting up
to ``--max-kmer-per-pos`` = 20 k-mers per query position with total score
≥ ``--k-score`` (LocalParameters.h:150-152; defaults 225 in MMseqs'
scaled-matrix units — here the threshold is in RAW BLOSUM62 units, default
chosen to match the reference's expansion breadth).

Spark design: expansion is a pure function of the k-mer VALUE, so we
expand each DISTINCT k-mer once (a pandas UDF over the distinct-kmer
DataFrame — typically orders of magnitude smaller than the kmer stream)
and join the expansion back to (query_id, pos) rows. The chunk score
vectors are numpy broadcasts of BLOSUM62 rows — nothing is precomputed or
shipped; each Arrow batch rebuilds 3×8000-entry vectors per kmer in
microseconds.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.scoring import BLOSUM62

DEFAULT_KMER_THRESHOLD = 38  # raw BLOSUM62 total-score threshold
DEFAULT_MAX_PER_POS = 20  # --max-kmer-per-pos, LocalParameters.h:152

_A = len(AMINO_ALPHABET)


def _decode(kmer: int, k: int) -> list[int]:
    codes = []
    for _ in range(k):
        codes.append(kmer % _A)
        kmer //= _A
    return codes[::-1]


def _chunk_sizes(k: int) -> list[int]:
    """Split k into chunks of ≤3 residues (reference uses 2/3-mer tables)."""
    sizes = []
    rest = k
    while rest > 0:
        c = 3 if rest >= 3 else rest
        sizes.append(c)
        rest -= c
    return sizes


def _chunk_scores(codes: list[int], matrix: np.ndarray) -> np.ndarray:
    """Score vector of ALL 20^len(codes) substitute chunks vs `codes`,
    indexed by the chunk's positional encoding. Pure numpy broadcast."""
    v = matrix[codes[0]]
    for c in codes[1:]:
        v = (v[:, None] + matrix[c][None, :]).reshape(-1)
    return v


def expand_kmer_scored(
    kmer: int,
    k: int,
    threshold: int = DEFAULT_KMER_THRESHOLD,
    max_n: int = DEFAULT_MAX_PER_POS,
    matrix: np.ndarray = BLOSUM62,
) -> list[tuple[int, int]]:
    """Top-`max_n` (k-mer, score) by substitution score vs `kmer`, score ≥
    `threshold`, exact k-mer first (it is its own best substitute).
    Lazy best-first merge over per-chunk sorted score lists — the same
    algorithm as the reference's top-N heaps, exact by construction."""
    codes = _decode(kmer, k)
    sizes = _chunk_sizes(k)
    chunks = []
    off = 0
    for s in sizes:
        chunks.append(codes[off : off + s])
        off += s
    vecs = [_chunk_scores(c, matrix) for c in chunks]
    orders = [np.argsort(-v, kind="stable") for v in vecs]
    sorted_scores = [v[o] for v, o in zip(vecs, orders)]
    g = len(vecs)
    # multipliers to recompose the full kmer code from chunk codes
    mults = []
    m = 1
    for s in reversed(sizes):
        mults.append(m)
        m *= _A ** s
    mults = mults[::-1]

    start = tuple([0] * g)
    best0 = sum(float(ss[0]) for ss in sorted_scores)
    heap = [(-best0, start)]
    seen = {start}
    out: list[tuple[int, int]] = []
    while heap and len(out) < max_n:
        neg, idx = heapq.heappop(heap)
        score = -neg
        if score < threshold:
            break
        code = 0
        for j in range(g):
            code += int(orders[j][idx[j]]) * mults[j]
        out.append((code, int(score)))
        for j in range(g):
            if idx[j] + 1 < len(sorted_scores[j]):
                nxt = idx[:j] + (idx[j] + 1,) + idx[j + 1 :]
                if nxt not in seen:
                    seen.add(nxt)
                    ns = score - float(sorted_scores[j][idx[j]]) + float(sorted_scores[j][idx[j] + 1])
                    heapq.heappush(heap, (-ns, nxt))
    return out


def expand_kmer(
    kmer: int,
    k: int,
    threshold: int = DEFAULT_KMER_THRESHOLD,
    max_n: int = DEFAULT_MAX_PER_POS,
    matrix: np.ndarray = BLOSUM62,
) -> list[int]:
    """Codes-only view of :func:`expand_kmer_scored`."""
    return [c for c, _ in expand_kmer_scored(kmer, k, threshold, max_n, matrix)]


#: composition-bias correction (T4) parameters
BIAS_WINDOW = 21  # local window (centered) for per-position composition
BIAS_SLACK = 8  # how far below the nominal threshold the expansion digs


def composition_bias_kmer(
    queries: DataFrame, k: int = 9, matrix: np.ndarray = BLOSUM62
) -> DataFrame:
    """T4 (comparekmertables.cpp:196-253): per-(query, pos) k-mer-window
    bias. bias[i] = round(mean substitution score of residue i against its
    local window) — positive in compositionally biased (self-similar)
    regions; the per-k-mer value is the sum over the window's k positions
    and is ADDED to the expansion threshold at that position, so biased
    regions demand stronger similar-k-mer scores (the reference subtracts
    the correction from the match score — same cascade, same monotone
    effect). Returns (query_id, pos, kbias)."""
    from petasearch_spark.operators.align import _encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        half = BIAS_WINDOW // 2
        for pdf in batches:
            qids, poss, kbs = [], [], []
            for qid, seq in zip(pdf["seq_id"], pdf["sequence"]):
                qc = _encode(seq)
                n = len(qc)
                if n < k:
                    continue
                ok = qc >= 0
                qs = np.where(ok, qc, 0)
                # windowed residue counts via one-hot cumsum (fully vectorized)
                A = matrix.shape[0]
                onehot = np.zeros((n + 1, A), dtype=np.int64)
                onehot[np.arange(1, n + 1), qs] = ok
                csum = np.cumsum(onehot, axis=0)
                lo = np.maximum(0, np.arange(n) - half)
                hi = np.minimum(n, np.arange(n) + half + 1)
                wc = csum[hi] - csum[lo]  # (n, A) valid-residue counts per window
                nw = wc.sum(axis=1)
                rowsc = matrix[qs]  # (n, A): score of residue i vs each letter
                tot = np.einsum("ij,ij->i", rowsc, wc) - matrix[qs, qs]  # exclude self
                denom = np.maximum(1, nw - 1)
                bias = np.where(ok & (nw > 1), tot / denom, 0.0)
                kb = np.convolve(np.round(bias), np.ones(k), mode="valid")  # sum per k-window
                for p in range(n - k + 1):
                    qids.append(qid)
                    poss.append(p)
                    kbs.append(int(max(-BIAS_SLACK, kb[p])))
            yield pd.DataFrame({"query_id": qids, "pos": poss, "kbias": kbs})

    return queries.mapInPandas(run, schema="query_id long, pos int, kbias int")


def expand_query_kmers(
    query_kmers: DataFrame,
    k: int = 9,
    threshold: int = DEFAULT_KMER_THRESHOLD,
    max_per_pos: int = DEFAULT_MAX_PER_POS,
    bias: DataFrame | None = None,
) -> DataFrame:
    """query_kmers(query_id, kmer, pos) -> the same schema with up to
    `max_per_pos` rows per input row (exact + similar k-mers).

    Plan: expand DISTINCT kmers once (pandas UDF), then an inner join back
    on the original kmer — the expansion table is small and broadcast-able.
    With `bias` (T4, from :func:`composition_bias_kmer`), the expansion
    digs BIAS_SLACK below the nominal threshold and each occurrence keeps
    only similar k-mers scoring ≥ threshold + its positional bias.
    """
    distinct = query_kmers.select("kmer").distinct()
    floor = threshold - BIAS_SLACK if bias is not None else threshold

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kmers = []
            sims = []
            scores = []
            for km in pdf["kmer"]:
                for s, sc in expand_kmer_scored(int(km), k, floor, max_per_pos):
                    kmers.append(km)
                    sims.append(s)
                    scores.append(sc)
            yield pd.DataFrame({"kmer": kmers, "sim_kmer": sims, "score": scores})

    expansion = distinct.mapInPandas(run, schema="kmer long, sim_kmer long, score int")
    joined = query_kmers.join(F.broadcast(expansion), "kmer", "inner")
    if bias is not None:
        joined = joined.join(bias, ["query_id", "pos"], "left").filter(
            F.col("score") >= threshold + F.coalesce(F.col("kbias"), F.lit(0))
        )
    return joined.select("query_id", F.col("sim_kmer").alias("kmer"), "pos")
