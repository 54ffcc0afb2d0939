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
