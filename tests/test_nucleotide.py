"""Nucleotide-mode search (the reference's DBTYPE_NUCLEOTIDES branch)."""

from __future__ import annotations

from petasearch_spark.plans.search import search
from petasearch_spark.sources.fasta import sequences_from_records


def test_dna_search_end_to_end(spark):
    core = "ATGGCGTACGATCGATTACGGCTA"  # 24 nt, diverse
    q = sequences_from_records(spark, [("q0", core)])
    t = sequences_from_records(
        spark,
        [
            ("t0 exact", "TTTT" + core + "GGGG"),
            ("t1 unrelated", "CCCCCCCCCCCCCCCCCCCCCCCC"),
            ("t2 with-n", "NNNN" + core[:8] + "NNNN"),  # too short / N-broken
        ],
    )
    res = search(q, t, alphabet="nucl").collect()
    assert {r["target_id"] for r in res} == {0}
    r = res[0]
    assert r["nident"] == len(core) and r["mismatch"] == 0
    assert r["raw"] == 2 * len(core)  # +2 per match
    assert r["tstart"] == 5 and r["tend"] == 4 + len(core)


def test_dna_mutated_target(spark):
    core = "ATGGCGTACGATCGATTACGGCTAGGATC"
    mut = core[:12] + "T" + core[13:]  # one substitution mid-sequence
    q = sequences_from_records(spark, [("q0", core)])
    t = sequences_from_records(spark, [("t0 mut", mut)])
    res = search(q, t, alphabet="nucl").collect()
    assert len(res) == 1
    # one mismatch somewhere, everything else identical
    assert res[0]["mismatch"] <= 1
    assert res[0]["nident"] >= len(core) - 2
