"""Streaming kill/recover e2e beyond curate-stream (round-6 VERDICT
item 4): the exactly-once claims of the stateful and foreachBatch
streams rested on Spark defaults, unexercised — no test killed a query
mid-run and restarted it from its checkpoint.

Two failure windows are forced DETERMINISTICALLY (no sleeps, no races),
one per stream family:

1. **Stateful (applyInPandasWithState user totals)**: the foreachBatch
   sink raises on its first attempt at the second file's batch — AFTER
   writing partial output, BEFORE the checkpoint commit. Restarting from
   the same checkpoint must REPLAY that batch against the RECOVERED
   batch-1 state: final totals equal the batch aggregate exactly (state
   neither reset — undercount — nor double-applied — overcount), and the
   poisoned partial output is overwritten, not duplicated.

2. **foreachBatch ANN probe**: same write-then-crash window on the probe
   sink. The production writer (ann_stream.make_probe_batch_writer)
   writes an idempotent per-batch ``b=<id>`` dir, so the replay is a
   no-op rewrite — the recovered union equals the batch cosine_topk
   answer with NO duplicate (query, neighbor) rows. (A plain
   mode("append") sink — what ann_stream shipped before round 7 — holds
   the replayed batch twice; this test is the regression home.)

Also proves the RESTART path (clean stop -> new files -> resume from
checkpoint) processes only new offsets: the batch-1 output dirs carry
the same content after recovery.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from petasearch_spark.operators.similarity import cosine_topk
from petasearch_spark.streaming.ann_stream import (
    make_probe_batch_writer,
    read_probe_sink,
)
from petasearch_spark.streaming.stateful import latest_user_totals, user_totals_stream

SF_DIR = "/root/testdata/sf0.001"


def _write_halves(spark, src: str, split_col: str, cols, out: str) -> tuple[str, str]:
    df = spark.read.parquet(src).select(*cols)
    paths = []
    for i in range(2):
        half = F.coalesce(F.pmod(F.col(split_col), F.lit(2)), F.lit(0)) == i
        p = os.path.join(out, f"half{i}")
        df.filter(half).coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    return tuple(paths)


def _publish(half_dir: str, landing: str, name: str) -> None:
    os.makedirs(landing, exist_ok=True)
    part = next(f for f in sorted(os.listdir(half_dir)) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(half_dir, part), os.path.join(landing, name))


class _Poison(RuntimeError):
    pass


def _run(stream_writer, ckpt: str) -> Exception | None:
    q = stream_writer.option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    try:
        q.awaitTermination()
        return None
    except Exception as exc:  # noqa: BLE001 — the injected crash surfaces here
        return exc


def test_stateful_user_totals_kill_recover(spark, tmp_path):
    h0, h1 = _write_halves(
        spark, f"{SF_DIR}/events.parquet", "event_id", ["event_id", "user_id", "value"],
        str(tmp_path / "halves"),
    )
    landing, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    marker = tmp_path / "poisoned_once"

    def write_batch(df, batch_id: int) -> None:
        # idempotent per-batch dir (the curate-stream bronze contract)
        df.write.mode("overwrite").parquet(os.path.join(sink, f"b={batch_id}"))

    def poisoned_write(df, batch_id: int) -> None:
        write_batch(df, batch_id)
        if batch_id >= 1 and not marker.exists():
            marker.touch()
            # crash in the window AFTER the sink write, BEFORE the
            # checkpoint commit — the replay-on-restart window
            raise _Poison("injected crash after sink write")

    def stream():
        return user_totals_stream(
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
            .select("user_id", "value")
        )

    # pass 1: only half0 — clean availableNow run, batch 0 commits
    _publish(h0, landing, "f0.parquet")
    assert _run(stream().writeStream.outputMode("update").foreachBatch(write_batch), ckpt) is None
    b0_rows = sorted(map(tuple, spark.read.parquet(os.path.join(sink, "b=0")).collect()))
    assert b0_rows, "batch 0 emitted nothing"

    # pass 2: half1 arrives; first attempt crashes after writing b=1
    _publish(h1, landing, "f1.parquet")
    exc = _run(stream().writeStream.outputMode("update").foreachBatch(poisoned_write), ckpt)
    assert exc is not None and "injected crash" in str(exc)
    assert marker.exists() and os.path.isdir(os.path.join(sink, "b=1"))

    # pass 3: restart from the SAME checkpoint, unpoisoned — the failed
    # batch replays against the recovered batch-0 state
    assert _run(stream().writeStream.outputMode("update").foreachBatch(write_batch), ckpt) is None

    # batch-0 output untouched by recovery (no offset re-read)
    assert sorted(map(tuple, spark.read.parquet(os.path.join(sink, "b=0")).collect())) == b0_rows

    emitted = spark.read.option("recursiveFileLookup", "true").parquet(sink)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in latest_user_totals(emitted).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            # the op's isfinite rule (round-7): NaN AND +-Inf excluded
            .filter(
                F.col("value").isNotNull()
                & ~F.isnan("value")
                & (F.abs("value") != F.lit(float("inf")))
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0).alias(
                    "total_value"
                ),
            )
            .collect()
        )
    }
    assert got == want, "recovered totals diverge from the batch aggregate"


def test_ann_probe_replay_is_idempotent(spark, tmp_path):
    from petasearch_spark.operators.similarity import N_QUERIES, _as_double
    from petasearch_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # stage the two query halves directly from the frame
    halves_dir = str(tmp_path / "halves")
    paths = []
    for i in range(2):
        half = F.pmod(F.col("query_id"), F.lit(2)) == i
        p = os.path.join(halves_dir, f"half{i}")
        queries.filter(half).coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    landing, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    marker = tmp_path / "poisoned_once"

    run_batch = make_probe_batch_writer(sink, lambda batch, _p: cosine_topk(batch, emb))

    def poisoned(df, batch_id: int) -> None:
        run_batch(df, batch_id)
        if batch_id >= 1 and not marker.exists():
            marker.touch()
            raise _Poison("injected crash after sink write")

    def stream():
        return (
            spark.readStream.schema("query_id long, qv array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

    _publish(paths[0], landing, "q0.parquet")
    assert _run(stream().writeStream.foreachBatch(run_batch), ckpt) is None
    _publish(paths[1], landing, "q1.parquet")
    exc = _run(stream().writeStream.foreachBatch(poisoned), ckpt)
    assert exc is not None and "injected crash" in str(exc)
    # restart from the same checkpoint: the failed batch replays into its
    # own b=<id> dir — a no-op rewrite, never a second copy
    assert _run(stream().writeStream.foreachBatch(run_batch), ckpt) is None

    got = read_probe_sink(spark, sink)
    assert got.count() == got.select("query_id", "neighbor_id").distinct().count(), (
        "replayed batch duplicated probe rows — the sink is not idempotent"
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cos"], 6), r["rk"])
        for r in cosine_topk(queries, emb).collect()
    )
    have = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cos"], 6), r["rk"])
        for r in got.collect()
    )
    assert have == want, "recovered probe union diverges from the batch answer"


def test_dropduplicates_state_kill_recover(spark, tmp_path):
    """Third state family: streaming dropDuplicates (the docs_stream_dedup
    core). The dedup state store must survive the restart — a key seen in
    committed batch 0 must NOT be re-emitted when the crashed batch
    replays, and keys first seen in the crashed batch must be emitted
    exactly once. Final per-source distinct counts equal the batch
    COUNT(DISTINCT md5(text))."""
    h0, h1 = _write_halves(
        spark, f"{SF_DIR}/documents.parquet", "doc_id", ["doc_id", "source", "text"],
        str(tmp_path / "halves"),
    )
    landing, ckpt, sink = (
        str(tmp_path / "landing"), str(tmp_path / "ckpt"), str(tmp_path / "sink")
    )
    marker = tmp_path / "poisoned_once"

    def write_batch(df, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(sink, f"b={batch_id}"))

    def poisoned(df, batch_id: int) -> None:
        write_batch(df, batch_id)
        if batch_id >= 1 and not marker.exists():
            marker.touch()
            raise _Poison("injected crash after sink write")

    def stream():
        return (
            spark.readStream.schema("doc_id long, source string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
            .select("source", F.md5("text").alias("content_hash"))
            .dropDuplicates(["source", "content_hash"])
        )

    _publish(h0, landing, "d0.parquet")
    assert _run(stream().writeStream.outputMode("append").foreachBatch(write_batch), ckpt) is None
    _publish(h1, landing, "d1.parquet")
    exc = _run(stream().writeStream.outputMode("append").foreachBatch(poisoned), ckpt)
    assert exc is not None and "injected crash" in str(exc)
    assert _run(stream().writeStream.outputMode("append").foreachBatch(write_batch), ckpt) is None

    emitted = spark.read.option("recursiveFileLookup", "true").parquet(sink)
    # state survived: every (source, hash) emitted exactly once across
    # batch 0 + the replayed batch
    assert emitted.count() == emitted.distinct().count(), (
        "dedup state lost on recovery — a committed key re-emitted"
    )
    got = {
        r["source"]: r["n"]
        for r in emitted.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r["source"]: r["n"]
        for r in (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .groupBy("source")
            .agg(F.countDistinct(F.md5("text")).alias("n"))
            .collect()
        )
    }
    assert got == want, "recovered dedup counts diverge from the batch distinct"
