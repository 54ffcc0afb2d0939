"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall-clock seconds.

Materialization uses the noop sink — full execution, no driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from petasearch_spark.operators import doc_search  # noqa: E402
from petasearch_spark.registry import REGISTRY  # noqa: E402
from petasearch_spark.session import get_spark  # noqa: E402

#: bench-only entries: the bucketed prefilter's ONE-TIME layout build and
#: its STEADY-STATE bucket-local join, timed separately (the combined
#: registry query conflated the amortized write with the per-batch join
#: cost — round-2 VERDICT item 7)
BENCH_ONLY = {
    "protein_prefilter_bucketed_build": doc_search.protein_prefilter_bucketed_build,
    "protein_prefilter_bucketed_query": doc_search.protein_prefilter_bucketed_query,
    "protein_search_index_build": doc_search.protein_search_index_build,
    "protein_search_prebuilt": doc_search.protein_search_prebuilt,
    "search_multi_target": doc_search.protein_search_multi_target,
}

#: The driver's bench capture keeps only the LAST 2000 bytes of output and
#: parses the final line — BENCH_r03's 73-entry JSON line exceeded that and
#: the whole per-query record was lost (parsed: null). The emitted line must
#: therefore stay under the buffer; MAX_LINE leaves headroom for timing-digit
#: variance. Five redundant-plan twins were dropped from the BENCH list to
#: fit (each remains registry+oracle-parity covered; surviving twin noted):
#:   events_value_quantiles   -> events_value_outliers (superset: quantiles+MAD)
#:   kmv_distinct_tokens      -> hll_distinct_tokens (same one-scan sketch agg)
#:   decontaminate_minhash    -> dedup_minhash_lsh (same banding machinery)
#:   ann_pq_topk              -> ann_ivfpq_topk (superset: ADC + IVF bucketing)
#:   embedding_quantize_int8  -> embedding_profile (same zero-shuffle column map)
#: The round-4 selection pair stays out for the same reason:
#:   dsir_importance_sample / lang_classifier_nb -> unigram_logprob_score
#:   (same cost class: gram explode + broadcast model join + per-doc agg;
#:   adding both would push the 1-decimal fallback line past the buffer)
MAX_LINE = 1900

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q18_large_orders",
    "top_suppliers_per_nation",
    "running_order_totals",
    "events_hourly",
    "events_sessionize",
    "events_session_window",
    "events_json_stats",
    "events_rollup",
    "clean_purchase_days",
    "events_asof_join",
    "events_proximity_pairs",
    "events_conversion_funnel",
    "events_retention_cohorts",
    "doc_shingle_index",
    "doc_prefilter",
    "protein_prefilter",
    "protein_prefilter_bucketed_build",
    "protein_prefilter_bucketed_query",
    "protein_search",
    "protein_search_index_build",
    "protein_search_prebuilt",
    "protein_search_expanded",
    "protein_ungapped",
    "protein_expand_prefilter",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans",
    "ann_ivfpq_topk",
    "semdedup_clusters",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "image_stats",
    "video_frame_sample",
    "corpus_sample_stratified",
    "decontaminate_ngram_overlap",
    "corpus_curation_funnel",
    "sequence_packing",
    "bm25_search",
    "phrase_search",
    "text_quality_stats",
    "doc_chunk_overlap",
    "doc_fingerprint",
    "tfidf_top_terms",
    "doc_cluster_tfidf",
    "unigram_logprob_score",
    "pii_redaction",
    "dedup_blocks",
    "quality_weighted_sample",
    "events_zorder_layout",
    "cm_heavy_hitters",
    "image_phash_dedup",
    "decontaminate_bloom",
    "events_anomaly_daily",
    "events_value_outliers",
    "embedding_profile",
    "table_profile",
    "hll_distinct_tokens",
    "mixture_sample",
    "events_type_pivot",
    "search_multi_target",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("petasearch_bench")
    # JVM/codegen warmup so the first timed query isn't charged for session
    # startup (a real deployment's session is long-lived): a decimal agg
    # (whole-stage codegen), a parquet footer read, and one Arrow batch
    # through mapInPandas (spawns the Python worker pool the kernels use)
    spark.range(1_000_000).selectExpr(
        "sum(cast(id as decimal(18,4))) as s", "count(1) as c"
    ).collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def _warm(batches):
        for pdf in batches:
            yield pdf

    spark.range(1_000).mapInPandas(_warm, schema="id long").count()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = BENCH_ONLY[name] if name in BENCH_ONLY else REGISTRY[name][0]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        # untimed: release the query's own persist() blocks so the shared
        # session doesn't accumulate 60 queries' caches (GC pressure was
        # the dominant run-to-run variance in earlier bench records)
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 2)
    # stop the session BEFORE printing so no late JVM/py4j shutdown chatter
    # can land after the JSON line — it must be the final line of output
    spark.stop()
    def encode(ts: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": ts,
                "sf": sf,
            },
            separators=(",", ":"),
        )

    line = encode(timings)
    if len(line) > MAX_LINE:
        # degrade precision rather than lose the record to tail truncation;
        # the integer step keeps even pathological 1000+s-per-entry runs
        # under the buffer (69 entries x <= 6 digits)
        line = encode({k: round(v, 1) for k, v in timings.items()})
    if len(line) > MAX_LINE:
        line = encode({k: int(round(v)) for k, v in timings.items()})
    assert len(line) <= 1990, (
        f"bench JSON line is {len(line)} chars; the driver's tail capture "
        f"holds 2000 — trim BENCH_QUERIES (see MAX_LINE note)"
    )
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
