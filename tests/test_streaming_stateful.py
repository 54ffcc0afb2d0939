"""Stateful streaming: prove the state store does cross-batch work (the
oracle parity test alone would also pass for a single-batch run)."""

from __future__ import annotations

from pyspark.sql import functions as F

from petasearch_spark.streaming.stateful import docs_stream_dedup, events_stream_user_totals

SF_DIR = "/root/testdata/sf0.001"


def test_user_totals_state_carries_across_batches(spark):
    final = events_stream_user_totals(spark, SF_DIR)
    rows = final.collect()
    assert len(rows) > 0
    # the raw sink holds one emission per (user, micro-batch); users whose
    # events split across both halves must have TWO emissions with
    # strictly increasing running counts — i.e. state actually carried.
    emitted = spark.table("events_stream_user_totals_sink")
    per_user = (
        emitted.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_emit"), F.max("n_events").alias("mx"), F.min("n_events").alias("mn"))
        .collect()
    )
    multi = [r for r in per_user if r["n_emit"] >= 2]
    assert multi, "no user spanned both micro-batches - state never exercised"
    assert all(r["mx"] > r["mn"] for r in multi)
    # final totals = batch aggregate
    batch = {
        (r["user_id"]): (r["n"], float(r["tv"]))
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0).alias("tv"),
        )
        .collect()
    }
    for r in rows:
        n, tv = batch[r["user_id"]]
        assert r["n_events"] == n and r["total_value"] == tv


def test_docs_stream_dedup_matches_batch(spark):
    got = {r["source"]: r["n_unique_docs"] for r in docs_stream_dedup(spark, SF_DIR).collect()}
    want = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert got == want
