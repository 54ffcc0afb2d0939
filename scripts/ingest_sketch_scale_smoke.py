"""Scale smoke: JSONL ingest, the HLL sketch and mixture sampling on a
corpus ~40x the bench documents table (200k docs / 200k dump lines).

* ``read_jsonl_docs`` — a 200k-line dump with ~1% planted malformed
  lines: every input line must be accounted for (clean + quarantined ==
  written), doc ids must be content-stable, and the zstd-parquet
  recompression must round-trip; the ingested table then feeds
  dedup_exact unchanged (ingest output == pipeline input).
* ``hll_distinct_tokens`` core — per-source register build over the
  smoke corpus; the estimate must land within the 4-sigma HLL bound
  (sigma = 1.04/sqrt(64) = 13%) of the exact distinct count for EVERY
  source, and the whole pass is two shuffles (distinct + register agg)
  regardless of corpus size.
* ``mixture_sample`` — run unchanged on the smoke corpus PLUS a
  starved source (one source shrunk to a handful of docs): per-source
  kept token mass must reach min(budget, available) and overshoot by
  at most one document; the starved source must saturate.

    python scripts/ingest_sketch_scale_smoke.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.registry import REGISTRY
from petasearch_spark.session import get_spark

from dedup_scale_smoke import synth_documents  # noqa: E402

MALFORMED_MOD = 100  # ~1% of dump lines are truncated JSON


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("ingest_sketch_scale_smoke")
    out: dict[str, object] = {"n_docs": n_docs}

    tmp = tempfile.mkdtemp(prefix="ingest_smoke_")
    try:
        docs = synth_documents(spark, n_docs)

        # --- JSONL ingest: dump -> read -> quarantine -> recompress ---
        t0 = time.time()
        dump = os.path.join(tmp, "dump.jsonl")
        line = F.to_json(
            F.struct(
                F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
                "text",
                "lang",
                "source",
            )
        )
        # truncate every MALFORMED_MOD-th line mid-JSON
        broken = F.when(
            F.col("doc_id") % MALFORMED_MOD == 7, F.substring(line, 1, 20)
        ).otherwise(line)
        docs.select(broken.alias("value")).write.mode("overwrite").text(dump)
        out["dump_write_s"] = round(time.time() - t0, 1)

        from petasearch_spark.sources.jsonl import (
            read_jsonl_docs,
            split_malformed,
            write_documents,
        )

        t0 = time.time()
        clean, bad = split_malformed(read_jsonl_docs(spark, dump))
        n_bad = bad.count()
        n_clean = clean.count()
        out["ingest_s"] = round(time.time() - t0, 1)
        out["n_clean"], out["n_bad"] = n_clean, n_bad
        assert n_clean + n_bad == n_docs, (n_clean, n_bad)
        assert n_bad == sum(1 for i in range(n_docs) if i % MALFORMED_MOD == 7)

        t0 = time.time()
        ingested = os.path.join(tmp, "ingested")
        write_documents(clean, ingested)
        back = spark.read.parquet(ingested)
        assert back.count() == n_clean
        out["recompress_s"] = round(time.time() - t0, 1)

        # ingest output feeds the registered dedup unchanged: documents
        # shape minus url (dedup_exact reads doc_id/text)
        t0 = time.time()
        ddir = os.path.join(tmp, "docs_table")
        docs.write.mode("overwrite").parquet(os.path.join(ddir, "documents.parquet"))
        out["dedup_on_ingest_rows"] = REGISTRY["dedup_exact"][0](spark, ddir).count()
        out["dedup_on_ingest_s"] = round(time.time() - t0, 1)

        # --- HLL at scale: 4-sigma accuracy per source ---
        t0 = time.time()
        hll = REGISTRY["hll_distinct_tokens"][0](spark, ddir).collect()
        out["hll_s"] = round(time.time() - t0, 1)
        out["hll_sources"] = len(hll)
        worst = max(abs(r["rel_error"]) for r in hll)
        out["hll_worst_rel_error"] = worst
        assert worst < 0.52, worst  # 4 sigma at m=64

        # --- mixture sampling at scale, with a starved source ---
        t0 = time.time()
        starved = docs.filter(
            (F.col("source") != "src3") | (F.col("doc_id") % 1000 == 3)
        )
        sdir = os.path.join(tmp, "starved")
        starved.write.mode("overwrite").parquet(
            os.path.join(sdir, "documents.parquet")
        )
        mix = REGISTRY["mixture_sample"][0](spark, sdir)
        agg = (
            mix.groupBy("source", "budget", "saturated")
            .agg(
                F.sum(F.when(F.col("keep"), F.col("n_toks")).otherwise(0)).alias(
                    "kept_toks"
                ),
                F.sum("n_toks").alias("avail_toks"),
                F.max(F.when(F.col("keep"), F.col("n_toks")).otherwise(0)).alias(
                    "max_kept_doc"
                ),
            )
            .collect()
        )
        out["mixture_s"] = round(time.time() - t0, 1)
        sat = [r for r in agg if r["saturated"]]
        assert any(r["source"] == "src3" for r in sat), "starved source must saturate"
        for r in agg:
            target = min(r["budget"], r["avail_toks"])
            assert r["kept_toks"] >= target, (r["source"], r["kept_toks"], target)
            assert r["kept_toks"] <= r["budget"] + r["max_kept_doc"] or r["saturated"]
        out["mixture_saturated"] = [r["source"] for r in sat]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    quantile_sketch_smoke(spark, out)

    print(json.dumps(out))


def quantile_sketch_smoke(spark, out: dict, n_events: int = 5_000_000) -> None:
    """events_quantile_sketch on 5M events with CONTINUOUS values (~2M
    distinct cents — the regime the exact histogram formulation cannot
    survive at 100 TB): sketch state must stay bounded by the bucket
    grammar (<= ~900 per decade per group), every estimate must sit
    within half a bucket width of the exact ceil-rank quantile, and the
    whole pass is one map-side-combined shuffle + a window over buckets
    (vs the exact operator's window over millions of distinct values)."""
    from petasearch_spark.operators.events import QUANTILE_PCTS, quantile_sketch, value_quantiles

    # Weyl-style multiplicative scramble -> ~uniform cents in [0, 2e6):
    # ~1.85M distinct values over 5M rows, 5 groups
    ev = spark.range(n_events).select(
        F.concat(F.lit("t"), (F.col("id") % 5)).alias("event_type"),
        (((F.col("id") * 2654435761) % 2_000_000) / 100.0).alias("value"),
    )
    ev = ev.persist()
    ev.count()
    t0 = time.time()
    est = {r["event_type"]: r for r in quantile_sketch(ev).collect()}
    out["qsketch_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    exact = {r["event_type"]: r for r in value_quantiles(ev).collect()}
    out["qexact_s"] = round(time.time() - t0, 1)
    ev.unpersist()
    assert set(est) == set(exact) and len(est) == 5
    # state bound: values span [0, $20k) -> 4 decades above the exact
    # range + 1000 exact buckets; growing n_events CANNOT grow this
    max_buckets = max(r["n_buckets"] for r in est.values())
    assert max_buckets <= 1000 + 4 * 900, max_buckets
    out["qsketch_max_buckets"] = max_buckets
    worst_rel = 0.0
    for g, r in est.items():
        for p in QUANTILE_PCTS:
            cents = round(exact[g][f"p{p}"] * 100)
            width = 1 if cents < 1000 else 10 ** (len(str(cents)) - 3)
            err_x2 = abs(round(r[f"p{p}_est"] * 200) - 2 * cents)
            assert err_x2 <= width, (g, p, exact[g][f"p{p}"], r[f"p{p}_est"])
            worst_rel = max(worst_rel, err_x2 / (2 * cents))
    out["qsketch_worst_rel_error"] = round(worst_rel, 6)


if __name__ == "__main__":
    main()
