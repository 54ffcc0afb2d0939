"""Salted-join equivalence and parquet index partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from petasearch_spark.operators.skew import key_histogram, salted_join


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
