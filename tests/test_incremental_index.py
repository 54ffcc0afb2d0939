"""Incremental index maintenance: merge_kmer_index_delta must (a) produce
exactly the index a full rebuild would, and (b) never shuffle the base
index (bucket-local full-outer merge)."""

from __future__ import annotations

import pyspark.sql.functions as F

from petasearch_spark.operators.doc_search import derived_sequences
from petasearch_spark.operators.kmer_index import (
    build_kmer_index,
    merge_kmer_index_delta,
    write_kmer_index_bucketed,
)
from petasearch_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _seqs(spark):
    docs = load_table(spark, "documents", SF_DIR, widen_scan=True)
    return derived_sequences(docs).drop("source")


def test_merge_equals_full_rebuild(spark):
    seqs = _seqs(spark).persist()
    base_seqs = seqs.filter(F.col("seq_id") % 3 != 0)
    delta_seqs = seqs.filter(F.col("seq_id") % 3 == 0)

    write_kmer_index_bucketed(build_kmer_index(base_seqs), "t_inc_base")
    merged = merge_kmer_index_delta(
        "t_inc_base", delta_seqs, "t_inc_out", delta_table="t_inc_delta"
    )
    expect = {
        (r["kmer"], r["seq_id"], r["seq_len"]) for r in build_kmer_index(seqs).collect()
    }
    got = {(r["kmer"], r["seq_id"], r["seq_len"]) for r in merged.collect()}
    assert got == expect
    # collisions actually happened (otherwise the J2 rule is untested)
    base_k = {r["kmer"] for r in spark.table("t_inc_base").select("kmer").collect()}
    delta_k = {r["kmer"] for r in spark.table("t_inc_delta").select("kmer").collect()}
    assert base_k & delta_k, "delta must overlap base kmers for a meaningful merge"


def test_merge_join_is_bucket_local(spark):
    seqs = _seqs(spark)
    write_kmer_index_bucketed(build_kmer_index(seqs.filter(F.col("seq_id") % 3 != 0)), "t_inc_base2")
    write_kmer_index_bucketed(build_kmer_index(seqs.filter(F.col("seq_id") % 3 == 0)), "t_inc_delta2")
    base = spark.table("t_inc_base2").alias("b")
    delta = spark.table("t_inc_delta2").alias("d")
    plan = (
        base.join(delta, "kmer", "full_outer")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
