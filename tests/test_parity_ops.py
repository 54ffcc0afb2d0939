"""P2 pack/unpack bit-identity, P6 swap, and the max_seqs engine limit."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from petasearch_spark.functions.kmer import AMINO_ALPHABET
from petasearch_spark.functions.pack5 import pack5, unpack5


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.sampled_from(AMINO_ALPHABET + "X"), max_size=100))
def test_pack5_roundtrip(s):
    assert unpack5(pack5(s), len(s)) == s


def test_pack5_word_layout():
    # 3 residues/uint16, 5 bits each, high->low; last word flagged 0x8000
    data = pack5("ACD")
    assert len(data) == 2
    word = int.from_bytes(data, "little")
    assert word & 0x8000
    assert (word >> 10) & 0x1F == ord("A") & 0x1F
    assert (word >> 5) & 0x1F == ord("C") & 0x1F
    assert word & 0x1F == ord("D") & 0x1F
    # 4 residues -> 2 words, only the LAST flagged
    d2 = pack5("ACDE")
    assert len(d2) == 4
    w0 = int.from_bytes(d2[:2], "little")
    w1 = int.from_bytes(d2[2:], "little")
    assert not (w0 & 0x8000) and (w1 & 0x8000)


def test_swap_alignments(spark):
    from petasearch_spark.plans.search import search
    from petasearch_spark.sources.fasta import sequences_from_records
    from petasearch_spark.sources.m8 import swap_alignments

    q = sequences_from_records(spark, [("q0", "ACDEFGHIKLMNPQRSTVWY")])
    t = sequences_from_records(spark, [("t0", "WWWWACDEFGHIKLMNPQRSTVWYAAAA")])
    ali = search(q, t)
    sw = swap_alignments(ali, query_db_residues=20).collect()[0]
    orig = ali.collect()[0]
    assert sw["query_id"] == orig["target_id"] and sw["target_id"] == orig["query_id"]
    assert sw["qstart"] == orig["tstart"] and sw["tend"] == orig["qend"]
    assert sw["qlen"] == orig["tlen"]
    assert sw["backtrace"] == orig["backtrace"].replace("I", "d").replace("D", "I").replace("d", "D")
    assert sw["evalue"] > 0


def test_max_seqs_limits_hits_per_query(spark):
    from petasearch_spark.plans.search import search
    from petasearch_spark.sources.fasta import sequences_from_records

    core = "ACDEFGHIKLMNPQRSTVWY"
    q = sequences_from_records(spark, [("q0", core)])
    # three targets embedding the same core at different lengths -> J2 note:
    # each kmer maps to ONE representative, so build targets with distinct cores
    t = sequences_from_records(
        spark,
        [
            ("t0", core),
            ("t1", "W" + core + "W"),
            ("t2", "HH" + core + "HH"),
        ],
    )
    # J2 maps every core kmer to the longest target only; to get multi-hits
    # per query, search each target separately and union
    from petasearch_spark.plans.search import search_multi_target

    singles = [
        sequences_from_records(spark, [(f"t{i}", s)])
        for i, s in [(0, core), (1, "W" + core + "W"), (2, "HH" + core + "HH")]
    ]
    all_hits = search_multi_target(q, singles)
    assert all_hits.count() == 3
    # round-6: max_seqs on the multi-target fan-out is GLOBAL — one
    # top-k over the union of all target DBs, not 1 per DB (see
    # test_search_e2e.py::test_multi_target_max_seqs_is_global_not_per_db)
    limited = search_multi_target(q, singles, max_seqs=1)
    assert limited.count() == 1
    one = search(q, sequences_from_records(spark, [("t0", core)]), max_seqs=1)
    assert one.count() == 1
