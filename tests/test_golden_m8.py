"""End-to-end golden regression — the reference's own test strategy
(SURVEY §5: run the workflow on a small committed FASTA corpus and diff
the m8 output). Any change to extraction, expansion, prefilter,
alignment, scoring, or formatting that shifts the output fails here.

Regenerate (after an INTENDED semantic change only) with the snippet in
tests/data/golden_expected.m8's git history; rows compare sorted, since
our global result order is already deterministic but file order need not
be."""

from __future__ import annotations

import os

from petasearch_spark.plans.search import search
from petasearch_spark.sources.fasta import read_fasta
from petasearch_spark.sources.m8 import to_m8

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_golden_m8(spark):
    q = read_fasta(spark, os.path.join(DATA, "golden_queries.fa"))
    t = read_fasta(spark, os.path.join(DATA, "golden_targets.fa"))
    # threshold in seed-matrix units (≈3.74× raw half-bit; 131 ≈ the old
    # raw 35) — regenerated when expansion was calibrated to --k-score scale
    res = search(q, t, expand_similar=True, kmer_threshold=131)
    got = sorted(
        "\t".join(str(v) for v in r) for r in to_m8(res, with_lengths=True).collect()
    )
    with open(os.path.join(DATA, "golden_expected.m8")) as fh:
        want = sorted(line.rstrip("\n") for line in fh if line.strip())
    assert got == want
