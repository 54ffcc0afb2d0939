"""HMM-profile query support (SURVEY §2.2 P5).

Reference: profile queries are searched via their consensus sequence —
`Sequence::extractProfileConsensus` at
/root/reference/src/sra/blockalign.cpp:313-323 and
convertsraalignments.cpp:232; the rest of the pipeline then treats the
consensus like a plain sequence.

Here a profile is a first-class column: ``array<array<float>>`` of
per-position scores over the 20-letter alphabet (a PSSM row per
position). Consensus extraction is argmax per position — a pure
vectorized kernel under mapInPandas — after which `plans.search.search`
runs unchanged. No external HMM library involved; parsing HMMER/MMseqs
profile FILE formats is out of scope (the reference receives profiles as
pre-built DB records too)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from petasearch_spark.functions.kmer import AMINO_ALPHABET


def profile_consensus(profiles: DataFrame) -> DataFrame:
    """profiles(seq_id, accession, header, profile array<array<float>>) ->
    sequences(seq_id, accession, header, sequence) where sequence[i] is the
    alphabet letter with the highest profile score at position i (ties ->
    lowest residue code, matching a stable argmax)."""
    letters = np.array(list(AMINO_ALPHABET))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cons = []
            for prof in pdf["profile"]:
                m = np.array([np.asarray(row, dtype=np.float64) for row in prof])
                if m.size == 0:
                    cons.append("")
                    continue
                cons.append("".join(letters[np.argmax(m, axis=1)]))
            out = pdf[["seq_id", "accession", "header"]].copy()
            out["sequence"] = cons
            yield out

    return profiles.mapInPandas(
        run, schema="seq_id long, accession string, header string, sequence string"
    )


def search_profiles(profiles: DataFrame, targets: DataFrame, **kwargs) -> DataFrame:
    """Profile-vs-sequence search: consensus extraction, then the standard
    pipeline (index -> prefilter -> alignment) unchanged."""
    from petasearch_spark.plans.search import search

    return search(profile_consensus(profiles), targets, **kwargs)
