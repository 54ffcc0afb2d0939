"""Incremental / streaming curate — the continuous form of the curate
CLI (round-5 VERDICT item 8): a landing zone keeps receiving JSONL dump
files, and each run must pay parse cost ONLY for files it has not seen,
while the corpus-global funnel stages (near-dup LSH, decontamination,
stratified sampling) recompute over the accumulated corpus exactly when
it changed.

Architecture — two barriers compose, each covering the failure modes of
its own phase:

1. **Ingest (streaming, incremental).** ``readStream.text`` over the
   dump dir with ``Trigger.AvailableNow`` — Spark's file-source
   checkpoint is the ingest barrier: a file is parsed exactly once
   across runs, no matter how many times the process is killed and
   restarted. Each micro-batch lands in an idempotent per-batch BRONZE
   partition (``bronze/documents.parquet/batch=<id>``, overwrite mode —
   a replayed batch overwrites its own directory, so at-least-once
   delivery becomes exactly-once storage) next to a per-batch
   accounting row (``bronze/acct/batch=<id>``: line/quarantine counts,
   which cannot be recomputed later without re-parsing).
2. **Curation (batch, resumable).** The bronze store is handed to the
   existing ``_curate`` machinery as an ordinary parquet input. Its
   ``--resume`` markers + input fingerprint are the curation barrier:
   new bronze batches change the fingerprint and force the
   staging-onward recompute; an unchanged bronze resumes every stage as
   a no-op. Nothing here re-implements the funnel — stream and batch
   curate CANNOT drift because they are the same code.

The parse expression is :func:`petasearch_spark.sources.jsonl.
parse_jsonl_lines`, shared verbatim with the batch reader.

Scale shape: parsing is stateless per line (no shuffle before the
bronze write); bronze is append-only partitioned parquet, so the
landing-zone -> bronze hop is exactly the Kafka->bronze pattern of a
production lakehouse, and the funnel reads bronze columnar with the
``batch`` partition column pruned away by projection.
"""

from __future__ import annotations

from collections.abc import Callable

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from petasearch_spark.functions.localframe import literal_df


def curate_stream(spark: SparkSession, input_dir: str, out_dir: str) -> dict:
    """Process NEW dump files from ``input_dir``, then (re)curate.

    Returns the batch-curate accounting report plus streaming keys:
    ``stream_batches`` (micro-batches this run), ``n_quarantined`` /
    ``n_input_lines`` recomputed from the per-batch bronze accounting
    (the parquet-input curate path cannot see line-level quarantine).
    """
    from petasearch_spark.cli import _curate_report
    from petasearch_spark.sources.jsonl import parse_jsonl_lines

    bronze = os.path.join(out_dir, "bronze")
    bronze_docs = os.path.join(bronze, "documents.parquet")
    bronze_acct = os.path.join(bronze, "acct")
    checkpoint = os.path.join(out_dir, "_ingest_checkpoint")
    os.makedirs(bronze, exist_ok=True)

    parsed = parse_jsonl_lines(
        spark.readStream.option("maxFilesPerTrigger", 4)
        # landing zones arrive as per-delivery subdirs (day1/, day2/...);
        # the file source must see new files anywhere under the root
        .option("recursiveFileLookup", "true")
        .text(input_dir)
    )
    n_batches = 0

    def sink(batch, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        batch = batch.persist()
        try:
            acct = batch.agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("_malformed").isNotNull().cast("long")).alias("n_bad"),
            ).collect()[0]
            # idempotent per-batch landing: a replayed batch id overwrites
            # its OWN partition — at-least-once delivery, exactly-once store
            batch.filter(F.col("_malformed").isNull()).drop("_malformed").write.mode(
                "overwrite"
            ).option("compression", "zstd").parquet(
                os.path.join(bronze_docs, f"batch={int(batch_id)}")
            )
            literal_df(
                spark,
                [(int(batch_id), int(acct["n_lines"] or 0), int(acct["n_bad"] or 0))],
                "batch_id long, n_lines long, n_quarantined long",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(bronze_acct, f"batch={int(batch_id)}")
            )
        finally:
            batch.unpersist()

    q = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if not os.path.isdir(bronze_docs):
        raise ValueError(
            f"curate-stream: no dump files found under {input_dir} and no prior bronze store"
        )

    # batch tail: compaction + funnel via the existing resume machinery —
    # the bronze fingerprint decides whether anything recomputes
    report = _curate_report(spark, bronze, out_dir, resume=True)
    report["input"] = input_dir
    report["stream_batches"] = n_batches
    totals = (
        spark.read.parquet(bronze_acct)
        .agg(F.sum("n_lines").alias("l"), F.sum("n_quarantined").alias("q"))
        .collect()[0]
    )
    # the parquet-input curate path reports quarantine as 0 (bronze holds
    # only parsed rows); restore the true line accounting from the
    # per-batch sidecars so input = quarantined + dropped + staged holds
    report["n_input_lines"] = int(totals["l"] or 0)
    report["n_quarantined"] = int(totals["q"] or 0)
    return report


def main(argv: list[str]) -> int:
    from petasearch_spark.session import get_spark

    input_dir, out_dir = argv
    print(json.dumps(curate_stream(get_spark("petasearch-curate-stream"), input_dir, out_dir)))
    return 0


def curate_stream_follow(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    poll_interval_s: float = 2.0,
    idle_polls: int = 2,
    max_polls: int | None = 20,
    on_poll: Callable[[int, dict], None] | None = None,
) -> dict:
    """Continuous curate-stream (round-6 VERDICT item 8): keep draining
    the landing zone until it goes quiet.

    Design decision — a LOOP of ``availableNow`` drains over the SAME
    ingest checkpoint, not a ``processingTime`` trigger: the two are
    equivalent at the checkpoint contract (the file source's offset log
    decides what is new, exactly once, across any number of drains OR
    process restarts), but a long-lived processingTime query would race
    the batch curation tail against its own next micro-batch on the
    bronze store. The drain loop serializes them for free: each
    iteration is ingest-to-quiescence, then one curation pass exactly
    when bronze changed (the resume fingerprint makes the no-change
    pass a marker-check no-op). Killing the process anywhere in the
    loop loses nothing — the next invocation (follow or one-shot)
    resumes from the same checkpoint and markers.

    Stops after ``idle_polls`` consecutive drains with zero new
    micro-batches (the landing zone is quiet), or ``max_polls`` total
    (a service sets this to None and runs until idle never happens; the
    CLI default keeps smoke runs bounded). ``max_polls`` below 1 is
    rejected up front: at least one drain must run or the report would
    carry only follow_* keys and break the CLI JSON shape (ADVICE r7).

    ``on_poll(poll_index, report)``, when given, fires after every drain
    — a service's metrics/heartbeat hook, and the deterministic way to
    test landing zones that grow between drains (the old test hooked
    the global ``time.sleep``, which any background thread may also
    call, making the delivery timing racy on a loaded host). A hook
    exception must NOT abort the loop it exists to observe (ADVICE r8):
    it is caught, and surfaced as ``follow_hook_errors`` entries
    ``[poll_index, repr(exc)]`` on the returned report.

    Returns the LAST report plus follow accounting: total polls, total
    new batches seen, per-poll batch counts, and any hook errors.
    """
    import time

    if max_polls is not None and max_polls < 1:
        raise ValueError(f"max_polls must be >= 1 or None (forever), got {max_polls}")
    polls: list[int] = []
    hook_errors: list[list] = []
    report: dict = {}
    idle = 0
    while max_polls is None or len(polls) < max_polls:
        report = curate_stream(spark, input_dir, out_dir)
        polls.append(int(report["stream_batches"]))
        idle = idle + 1 if report["stream_batches"] == 0 else 0
        if on_poll is not None:
            try:
                on_poll(len(polls) - 1, report)
            except Exception as exc:  # noqa: BLE001 — observer must not kill the service
                hook_errors.append([len(polls) - 1, repr(exc)])
        if idle >= idle_polls:
            break
        if poll_interval_s > 0:
            time.sleep(poll_interval_s)
    report["follow_polls"] = len(polls)
    report["follow_batches_per_poll"] = polls
    report["follow_total_batches"] = sum(polls)
    if hook_errors:
        report["follow_hook_errors"] = hook_errors
    return report
