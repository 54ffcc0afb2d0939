"""Scale smoke for the round-3 surface: block dedup, PII scrub, Bloom
decontamination, CM heavy hitters and perceptual-hash image dedup on the
200k-doc synthetic corpus (40x the bench documents table), plus the
Z-order layout on 5M synthetic events (50x bench).

Each section runs the REGISTERED query functions (or their DataFrame
cores) unchanged on generated parquet and asserts the property that must
survive scale:

* dedup_blocks   — the corpus-wide boilerplate prefix block dedups to ONE
                   surviving copy; per-doc n_kept <= n_blocks everywhere.
* pii (full)     — the redaction expressions over ALL docs (the registry
                   query is doc_id-limited for gate output size).
* bloom          — filter sized to the eval set (~10 bits/element, the
                   standard m/n rule); still a superset of the exact join.
* cm             — estimates never below exact at a 200k-doc token stream.
* phash          — near-dup image pairs recovered from the injected
                   text near-dups that land on image media ids.
* zorder         — a user-point filter touches a small fraction of
                   z-ordered files where a time-sorted layout touches all.

    python scripts/round3_scale_smoke.py [n_docs] [n_events]
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
from petasearch_spark.sources.tables import load_table

from dedup_scale_smoke import synth_documents  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark("round3_scale_smoke")
    out: dict[str, object] = {"n_docs": n_docs, "n_events": n_events}

    tmp = tempfile.mkdtemp(prefix="r3_smoke_")
    try:
        t0 = time.time()
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out["generate_s"] = round(time.time() - t0, 1)

        # --- block-level dedup: boilerplate collapses to one copy ---
        t0 = time.time()
        blocks = REGISTRY["dedup_blocks"][0](spark, tmp)
        agg = blocks.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_blocks").alias("nb"),
            F.sum("n_kept").alias("nk"),
            F.max(F.col("n_kept") - F.col("n_blocks")).alias("max_excess"),
        ).collect()[0]
        out["dedup_blocks_s"] = round(time.time() - t0, 1)
        out["blocks_total"] = agg["nb"]
        out["blocks_kept"] = agg["nk"]
        assert agg["docs"] == n_docs
        assert agg["max_excess"] <= 0  # kept never exceeds present
        # every doc shares the boilerplate prefix block -> massive removal
        assert agg["nk"] < agg["nb"], "expected cross-doc block dedup"

        # --- PII scrub over the FULL corpus (column exprs only) ---
        from petasearch_spark.operators import text as T

        t0 = time.time()
        docs = load_table(spark, "documents", tmp, widen_scan=True)
        clean = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), T.PII_EMAIL_RE, "<EMAIL>"),
                T.PII_IPV4_RE,
                "<IP>",
            ),
            T.PII_PHONE_RE,
            "<PHONE>",
        )
        n = docs.select(F.sum(F.length(clean)).alias("c")).collect()[0]["c"]
        out["pii_full_scan_s"] = round(time.time() - t0, 1)
        assert n > 0

        # --- Bloom decontamination, filter sized to the eval set ---
        from petasearch_spark.operators import corpus as C
        from petasearch_spark.operators.dedup import _shingle_hashes

        eval_shingles = (
            _shingle_hashes(docs, n=C.DECON_NGRAM, col="h")
            .filter(F.col("doc_id") % C.EVAL_MOD == 0)
            .count()
        )
        target_bits = 1 << max(20, (10 * eval_shingles).bit_length())
        orig_bits = C.BLOOM_BITS
        try:
            C.BLOOM_BITS = target_bits
            out["bloom_bits"] = target_bits
            t0 = time.time()
            bloom = {
                r["doc_id"]: r["n_bloom_hits"]
                for r in REGISTRY["decontaminate_bloom"][0](spark, tmp).collect()
            }
            out["bloom_s"] = round(time.time() - t0, 1)
        finally:
            C.BLOOM_BITS = orig_bits
        t0 = time.time()
        exact = {
            r["doc_id"]: r["n_collisions"]
            for r in REGISTRY["decontaminate_ngram_overlap"][0](spark, tmp).collect()
        }
        out["exact_decon_s"] = round(time.time() - t0, 1)
        assert exact, "injected cross-split dups must exist"
        for d, k in exact.items():
            assert bloom.get(d, 0) >= k, (d, k, bloom.get(d))
        out["bloom_flagged"] = len(bloom)
        out["exact_flagged"] = len(exact)

        # --- Count-Min: one-sided error on the 200k-doc stream ---
        t0 = time.time()
        cm = REGISTRY["cm_heavy_hitters"][0](spark, tmp).collect()
        out["cm_s"] = round(time.time() - t0, 1)
        assert all(r["cm_estimate"] >= r["exact_cnt"] for r in cm)
        out["cm_max_over"] = max(r["overestimate"] for r in cm)

        # --- perceptual-hash image dedup at ~n_docs/3 images ---
        t0 = time.time()
        ph = REGISTRY["image_phash_dedup"][0](spark, tmp)
        stats = ph.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("n_neardups") > 0).cast("int")).alias("with_dups"),
        ).collect()[0]
        out["phash_s"] = round(time.time() - t0, 1)
        out["phash_images"] = stats["n"]
        out["phash_with_neardups"] = stats["with_dups"]
        assert stats["n"] >= n_docs // 3
        assert stats["with_dups"] > 0, "injected near-dups should collide"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- Z-order layout on synthetic events ---
    from petasearch_spark.operators import layout as L

    ev = (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 5000).alias("user_id"),
            F.timestamp_seconds(F.lit(1704067200) + (F.col("id") * 37) % (90 * 86400)).alias("ts"),
        )
    )
    n_files = 64
    t0 = time.time()
    keyed = L.with_zvalue(ev)
    boxes = (
        keyed.repartitionByRange(n_files, "zval")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("ubits").alias("ulo"), F.max("ubits").alias("uhi"))
        .collect()
    )
    out["zorder_s"] = round(time.time() - t0, 1)
    probes = [0, 63, 127, 200, 255]
    touched = sum(1 for b in boxes for u in probes if b["ulo"] <= u <= b["uhi"])
    out["zorder_touch_frac"] = round(touched / (len(boxes) * len(probes)), 4)
    assert out["zorder_touch_frac"] < 0.5  # time-sort would be 1.0

    pivot_smoke(spark, n_events, out)

    print(json.dumps(out))




def pivot_smoke(spark, n_events: int, out: dict) -> None:
    """PIVOT/unpivot at stream scale: the daily crosstab over n_events
    synthetic rows must conserve counts exactly (sum of all wide cells ==
    n_events; the unpivot melt reproduces the non-zero cells)."""
    import tempfile

    from petasearch_spark.operators.events import PIVOT_TYPES

    tmp = tempfile.mkdtemp(prefix="pivot_smoke_")
    try:
        tmap = F.array(*[F.lit(t) for t in PIVOT_TYPES])
        ev = spark.range(n_events).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1704067200) + (F.col("id") * 37) % (90 * 86400)).alias("ts"),
            (F.col("id") % 5000).alias("user_id"),
            F.element_at(tmap, (F.col("id") % 5 + 1).cast("int")).alias("event_type"),
            (F.col("id") % 997).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )
        ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        t0 = time.time()
        wide = REGISTRY["events_type_pivot"][0](spark, tmp).collect()
        out["pivot_s"] = round(time.time() - t0, 1)
        out["pivot_days"] = len(wide)
        total = sum(sum(r[f"n_{t}"] for t in PIVOT_TYPES) for r in wide)
        assert total == n_events, (total, n_events)
        t0 = time.time()
        melted = REGISTRY["events_type_unpivot"][0](spark, tmp).collect()
        out["unpivot_s"] = round(time.time() - t0, 1)
        nonzero = sum(1 for r in wide for t in PIVOT_TYPES if r[f"n_{t}"] > 0)
        assert len(melted) == nonzero
        assert sum(r["n_events"] for r in melted) == n_events
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
