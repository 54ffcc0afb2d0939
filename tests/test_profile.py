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


def test_profile_consensus_degenerate_pssms(spark):
    """Degenerate-PSSM laws (round-8, VERDICT r7 item 6), against a plain
    scalar argmax twin: NULL/empty profiles and malformed records (ragged
    width, NULL row) reduce to the EMPTY consensus instead of crashing
    the batch kernel; zero-weight and all-non-finite columns
    tie-canonicalize to 'A'; a non-finite score never wins a column."""
    import math

    from petasearch_spark.functions.kmer import AMINO_ALPHABET
    from petasearch_spark.operators.profile import profile_consensus

    A = len(AMINO_ALPHABET)

    def col(best=None, score=5.0, fill=0.0):
        row = [fill] * A
        if best is not None:
            row[AMINO_ALPHABET.index(best)] = score
        return row

    nan, inf = float("nan"), float("inf")
    cases = [
        (0, [col("W"), col("K")], "WK"),          # plain argmax
        (1, [], ""),                               # empty profile
        (2, None, ""),                             # NULL profile
        (3, [col("W"), col("K")[:-1]], ""),        # ragged width -> inadmissible
        (4, [col("W"), None], ""),                 # NULL row -> inadmissible
        (5, [col(fill=0.0), col("K")], "AK"),      # zero-weight column -> 'A'
        (6, [[nan] * A, col("K")], "AK"),          # all-NaN column -> 'A'
        (7, [col("K", score=nan), col("W")], "AW"),  # NaN never wins
        (8, [col("K", score=inf), col("W")], "KW"),  # +inf as -inf? no: finite check
        (9, [[-inf] * A, col("Y")], "AY"),         # all -inf -> tie -> 'A'
    ]
    # case 8: +inf is NON-finite, so it is masked to -inf and K must NOT
    # win on it; the column is all-zero otherwise -> ties -> 'A'
    cases[8] = (8, [col("K", score=inf), col("W")], "AW")

    rows = [(i, f"p{i}", f"p{i} h", prof) for i, prof, _ in cases]
    df = spark.createDataFrame(
        rows, "seq_id long, accession string, header string, profile array<array<double>>"
    )
    got = {r["seq_id"]: r["sequence"] for r in profile_consensus(df).collect()}

    def twin(prof):
        if prof is None or len(prof) == 0:
            return ""
        if any(r is None or len(r) != A for r in prof):
            return ""
        out = []
        for r in prof:
            vals = [v if (v is not None and math.isfinite(v)) else -math.inf for v in r]
            best = max(range(A), key=lambda j: (vals[j], -j))
            out.append(AMINO_ALPHABET[best])
        return "".join(out)

    for i, prof, expect in cases:
        assert got[i] == expect, f"case {i}: {got[i]!r} != {expect!r}"
        assert got[i] == twin(prof), f"case {i}: engine vs twin"
