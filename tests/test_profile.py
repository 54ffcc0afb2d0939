from pyspark.sql import functions as F

def test_profile_search_end_to_end(spark):
    from petasearch_spark.operators.profile import profile_consensus, search_profiles
    from petasearch_spark.sources.fasta import sequences_from_records
    from petasearch_spark.functions.kmer import AMINO_ALPHABET

    target_seq = "ACDEFGHIKLMNPQRSTVWY"
    idx = {c: i for i, c in enumerate(AMINO_ALPHABET)}
    prof = [[2.0 if j == idx[c] else -1.0 for j in range(len(AMINO_ALPHABET))] for c in target_seq]
    profiles = spark.createDataFrame(
        [(0, "p0", "p0 profile", prof)],
        "seq_id long, accession string, header string, profile array<array<float>>",
    )
    cons = profile_consensus(profiles).collect()[0]
    assert cons["sequence"] == target_seq
    targets = sequences_from_records(
        spark, [("t0 hit", "WWWW" + target_seq + "AAAA"), ("t1 miss", "GGGGGGGGGGGG")]
    )
    res = search_profiles(profiles, targets).collect()
    assert len(res) == 1 and res[0]["target_id"] == 0 and res[0]["nident"] == 20


def test_profile_vs_profile_search(spark):
    """Both sides consensus-reduced: a query profile must find the target
    PROFILE whose argmax consensus matches, and ignore one whose PSSM
    argmax differs everywhere."""
    from petasearch_spark.functions.kmer import AMINO_ALPHABET
    from petasearch_spark.operators.profile import search_profiles_vs_profiles

    idx = {c: i for i, c in enumerate(AMINO_ALPHABET)}

    def pssm(seq):
        return [[2.0 if j == idx[c] else -1.0 for j in range(len(AMINO_ALPHABET))] for c in seq]

    core = "ACDEFGHIKLMNPQRSTVWY"
    qprof = spark.createDataFrame(
        [(0, "q0", "q0", pssm(core))],
        "seq_id long, accession string, header string, profile array<array<float>>",
    )
    tprof = spark.createDataFrame(
        [
            (0, "t_hit", "t_hit", pssm("WWWW" + core + "AAAA")),
            (1, "t_miss", "t_miss", pssm("GGGGYYYYGGGGYYYYGGGG")),
        ],
        "seq_id long, accession string, header string, profile array<array<float>>",
    )
    res = search_profiles_vs_profiles(qprof, tprof).collect()
    assert len(res) == 1
    assert res[0]["target_accession"] == "t_hit" and res[0]["nident"] == 20
