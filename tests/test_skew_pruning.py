"""Salted-join equivalence and parquet index partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from petasearch_spark.operators.skew import key_histogram, salted_join

# pid-unique managed-table names: the /tmp warehouse is shared across
# processes, so a concurrent session using the same fixed names can drop
# a table out from under this test (round-4 full-suite flake class)
_P = f"_{os.getpid()}"


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 7
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("rv"))
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salt=8).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_key_histogram_finds_hot_key(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") % 5 != 0, F.lit(42)).otherwise(F.col("id")).alias("k")
    )
    top = key_histogram(df, "k", top=1).collect()[0]
    assert top["k"] == 42 and top["share"] > 0.7


def test_kmer_index_write_prunes_on_range(spark, tmp_path):
    """The range-partitioned sorted index must let a kmer-range filter
    reach the parquet scan (row-group/file pruning at scale)."""
    from petasearch_spark.operators.kmer_index import build_kmer_index, write_kmer_index
    from petasearch_spark.sources.fasta import sequences_from_records

    import random

    rng = random.Random(3)
    seqs = sequences_from_records(
        spark,
        [
            (f"s{i}", "".join(rng.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(200)))
            for i in range(20)
        ],
    )
    path = str(tmp_path / "idx")
    write_kmer_index(build_kmer_index(seqs), path, num_ranges=8)
    # multiple range files written
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 4
    idx = spark.read.parquet(path)
    lo = idx.agg(F.expr("percentile_approx(kmer, 0.5)")).collect()[0][0]
    q = idx.filter(F.col("kmer") > lo)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(kmer" in plan  # filter pushed to the scan
    assert q.count() > 0


def test_bucketed_index_join_has_no_index_shuffle(spark, tmp_path):
    """Bucketed index x bucketed probe: the prefilter equi-join must run
    bucket-local - no Exchange above either scan."""
    import random

    from petasearch_spark.operators.kmer_index import (
        build_kmer_index,
        extract_query_kmers,
        write_kmer_index_bucketed,
        write_query_kmers_bucketed,
    )
    from petasearch_spark.sources.fasta import sequences_from_records

    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (f"idx_b{_P}", f"qk_b{_P}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    rng = random.Random(11)
    seqs = sequences_from_records(
        spark,
        [
            (f"s{i}", "".join(rng.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(120)))
            for i in range(30)
        ],
    )
    write_kmer_index_bucketed(build_kmer_index(seqs), f"idx_b{_P}", num_buckets=8)
    write_query_kmers_bucketed(
        extract_query_kmers(seqs.filter("seq_id < 3")), f"qk_b{_P}", num_buckets=8
    )
    idx = spark.table(f"idx_b{_P}")
    qk = spark.table(f"qk_b{_P}")
    # hint merge: at real scale neither side broadcasts; the point is the
    # SMJ over co-bucketed scans needs NO shuffle on either side
    joined = qk.hint("merge").join(idx.withColumnRenamed("seq_id", "target_id"), "kmer")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS idx_b")
    spark.sql("DROP TABLE IF EXISTS qk_b")


def test_sharded_index_probe_prunes_partitions(spark, tmp_path):
    """Round-9 interactive layout: a small query's probe against the
    sharded index must scan ONLY the shards its k-mers hash to — the
    executed FileSourceScan's partition count equals |distinct query
    shards|, not num_shards — and the pruned probe's prefilter output
    must equal the unpruned one's exactly."""
    import random
    import re

    from petasearch_spark.operators.kmer_index import (
        build_kmer_index,
        extract_query_kmers,
        read_kmer_index_pruned,
        write_kmer_index_sharded,
    )
    from petasearch_spark.operators.prefilter import prefilter
    from petasearch_spark.sources.fasta import sequences_from_records

    rng = random.Random(9)
    seqs = sequences_from_records(
        spark,
        [
            (f"s{i}", "".join(rng.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(120)))
            for i in range(60)
        ],
    )
    path = str(tmp_path / "sharded_idx")
    write_kmer_index_sharded(build_kmer_index(seqs), path, num_shards=64)

    # one query (the interactive shape): ~112 kmers -> <= 64 shards, and
    # with 112 draws over 64 bins a few bins are empty w.h.p.
    qk = extract_query_kmers(seqs.filter(F.col("seq_id") == 0)).persist()
    n_shards_hit = qk.selectExpr("pmod(kmer, 64) as s").distinct().count()
    pruned = read_kmer_index_pruned(spark, path, qk)

    # the scan must carry a PARTITION filter (directory pruning), not a
    # post-scan data filter — INSET on the kshard partition column
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[kshard#\d+ INSET", plan), (
        f"no kshard partition filter in plan:\n{plan[:2000]}"
    )
    assert "DataFilters: []" in plan  # nothing left to filter row-side
    assert n_shards_hit < 64  # the query leaves shards untouched

    # behavioral pin of the pruning arithmetic: a SINGLE-kmer probe reads
    # exactly one shard's rows — strictly a sliver of the index
    one = qk.limit(1).persist()
    one_shard = read_kmer_index_pruned(spark, path, one)
    expected = (
        spark.read.parquet(path)
        .filter(F.col("kshard") == one.selectExpr("pmod(kmer, 64) as s").head()["s"])
        .count()
    )
    total = spark.read.parquet(path).count()
    assert one_shard.count() == expected < total / 8
    one.unpersist()

    # value equality vs the unpruned probe
    full = build_kmer_index(seqs)
    a = prefilter(qk, pruned).select("query_id", "target_id", "kmer", "pos")
    b = prefilter(qk, full).select("query_id", "target_id", "kmer", "pos")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0  # self-hit guarantees rows
    qk.unpersist()


def test_sharded_index_empty_query_and_meta(spark, tmp_path):
    """Empty query k-mer set -> empty pruned scan (no crash); the shard
    count rides the _meta sidecar, not a directory listing."""
    from petasearch_spark.operators.kmer_index import (
        build_kmer_index,
        extract_query_kmers,
        read_kmer_index_pruned,
        write_kmer_index_sharded,
    )
    from petasearch_spark.sources.fasta import sequences_from_records

    seqs = sequences_from_records(spark, [("s0", "ACDEFGHIKLMNPQRSTVWY" * 3)])
    path = str(tmp_path / "tiny_idx")
    write_kmer_index_sharded(build_kmer_index(seqs), path, num_shards=16)
    # the sidecar lives INSIDE the dataset dir (underscore-hidden from
    # the data scan) so a publish-by-rename moves data+meta atomically
    assert spark.read.parquet(path + "/_ps_meta").head()["num_shards"] == 16
    # a sub-k sequence yields no kmers
    empty_qk = extract_query_kmers(sequences_from_records(spark, [("q0", "ACD")]))
    assert read_kmer_index_pruned(spark, path, empty_qk).count() == 0


def test_sequence_store_pruned_fetch(spark, tmp_path):
    """Round-10 fetch-side twin: reading the sharded sequence store with
    a candidate-id list must (a) return exactly those sequences, (b)
    carry an INSET partition filter on sshard (directory pruning) plus a
    pushed seq_id filter, and (c) return 0 rows for an empty candidate
    list (no crash)."""
    import random
    import re

    from petasearch_spark.operators.kmer_index import (
        read_sequence_store_meta,
        read_sequence_store_pruned,
        write_sequence_store_sharded,
    )
    from petasearch_spark.sources.fasta import sequences_from_records

    rng = random.Random(10)
    seqs = sequences_from_records(
        spark,
        [
            (f"s{i}", "".join(rng.choice("ACDEFGHIKLMNPQRSTVWY") for _ in range(40)))
            for i in range(50)
        ],
    )
    path = str(tmp_path / "seq_store")
    write_sequence_store_sharded(seqs, path, num_shards=16)

    meta = read_sequence_store_meta(spark, path)
    assert meta["num_shards"] == 16
    assert meta["db_residues"] == 50 * 40  # corpus total, not a sample

    ids = [3, 19, 36]  # 3 and 19 collide on shard 3 (dedup matters); 36 -> 4
    got = read_sequence_store_pruned(spark, path, ids)
    assert sorted(r["seq_id"] for r in got.collect()) == ids
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*sshard#\d+ IN", plan), plan[:2000]
    assert "seq_id" in plan.split("PushedFilters")[1][:200], plan[:2000]

    assert read_sequence_store_pruned(spark, path, []).count() == 0


def test_sharded_search_end_to_end_matches_batch_and_prunes_fetch(spark):
    """VERDICT r9 item 3: the interactive sharded SEARCH must (a) equal
    the batch flagship protein_search row-for-row (same queries, same
    corpus — the pruned index scan, pruned sequence fetch, and
    sidecar-carried db_residues change the I/O, never the values), and
    (b) execute with BOTH prunes visible in the plan: kshard INSET on
    the index scan, sshard INSET on the sequence fetch, and exactly ONE
    MapInPandas stage (the alignment kernel — the query-k-mer extraction
    is persisted and served from cache, VERDICT r9 item 4)."""
    import re

    from petasearch_spark.operators.doc_search import (
        protein_search,
        protein_search_sharded,
    )

    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    sharded = protein_search_sharded(spark, sf)
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[kshard#\d+ INSET", plan), plan[:3000]
    assert re.search(r"PartitionFilters: \[[^\]]*sshard#\d+ IN", plan), plan[:3000]
    # VERDICT r9 item 4: the query-k-mer extraction feeds the probe from
    # CACHE (InMemoryTableScan over (query_id, kmer, pos)) — one
    # mapInPandas execution per batch, not one per consumer (the
    # MapInPandas text still appearing deeper in the string is the
    # cached relation's build plan, printed but not re-executed); the
    # prefilter pairs are likewise served from cache to both the
    # candidate-id collect and the align lineage — since round 11 in the
    # GROUPED form (prefilter_grouped: per-pair k-mer lists, the fused
    # aggregation that replaced the member-row count window)
    assert re.search(r"InMemoryTableScan \[query_id#\d+L?, kmer#\d+L?, pos#\d+\]", plan), plan[:3000]
    assert re.search(
        r"InMemoryTableScan \[query_id#\d+L?, target_id#\d+L?, kmers#\d+, qpositions#\d+",
        plan,
    ), plan[:3000]

    got = [tuple(r) for r in sharded.collect()]
    spark.catalog.clearCache()
    want = [tuple(r) for r in protein_search(spark, sf).collect()]
    assert got == want and len(got) > 0
    spark.catalog.clearCache()


def test_sharded_layout_publish_is_race_free(spark, tmp_path, monkeypatch):
    """ADVICE r9: the old staging overwrote a shared path in place (a
    reader racing the rewrite could pair new shards with old meta).
    Pins the new protocol: (a) a missing in-directory meta sidecar fails
    LOUDLY (mid-write reader), never a silent mis-prune; (b) a rebuild
    while a complete layout is published discards its own copy and
    leaves the published inode untouched; (c) no pid-tmp debris
    survives either way."""
    import glob

    import pytest as _pytest

    from petasearch_spark.operators import doc_search
    from petasearch_spark.operators.kmer_index import read_sequence_store_meta

    # (a) loud failure on missing sidecar
    bare = tmp_path / "no_meta_store"
    bare.mkdir()
    with _pytest.raises(Exception) as exc:
        read_sequence_store_meta(spark, str(bare))
    assert "PATH_NOT_FOUND" in str(exc.value) or "_ps_meta" in str(exc.value)

    # route the content-keyed root into the test tmpdir
    root = str(tmp_path / "layout_root")
    monkeypatch.setattr(doc_search, "_sharded_index_path", lambda sf: root)
    sf = "/root/testdata/sf0.001"

    published = doc_search._ensure_sharded_layout(spark, sf)
    assert published == root
    ino_before = os.stat(root).st_ino
    idx_files_before = sorted(glob.glob(os.path.join(root, "index", "**", "*.parquet"), recursive=True))

    # (b) explicit rebuild against a live layout: full write happens in a
    # pid sibling, rename loses, published dir untouched
    doc_search.protein_prefilter_sharded_build(spark, sf)
    assert os.stat(root).st_ino == ino_before
    assert sorted(glob.glob(os.path.join(root, "index", "**", "*.parquet"), recursive=True)) == idx_files_before

    # (c) no .build debris from the losing rename
    assert glob.glob(root + ".build*") == []


def test_sharded_layout_refuses_mismatched_probe_params(spark, tmp_path):
    """Round-10 review finding: a probe with a different k or alphabet
    than the layout was built with would join on incompatible kmer
    codes and return EMPTY results with exit 0. The sidecar now records
    build parameters and the cascade refuses loudly."""
    import pytest as _pytest

    from petasearch_spark.functions.kmer import AMINO_ALPHABET
    from petasearch_spark.operators.kmer_index import write_sharded_layout
    from petasearch_spark.plans.search import search_sharded_layout
    from petasearch_spark.sources.fasta import sequences_from_records

    seqs = sequences_from_records(spark, [("s0", "ACDEFGHIKLMNPQRSTVWY" * 2)])
    root = str(tmp_path / "k7_layout")
    write_sharded_layout(seqs, root, num_shards=4, k=7, alphabet=AMINO_ALPHABET)

    with _pytest.raises(ValueError, match="k=7"):
        search_sharded_layout(seqs, root)  # default probe k=9
    # matching parameters pass (and still find the self-hit)
    assert search_sharded_layout(seqs, root, k=7).count() > 0
