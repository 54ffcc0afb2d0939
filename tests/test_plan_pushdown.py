"""Physical-plan properties the 100 TB story depends on: filters reach
the parquet scans (PushedFilters) and scans read only the projected
columns (ReadSchema pruning). Representative queries, exact plan-string
assertions."""

from __future__ import annotations

import re

from petasearch_spark.registry import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    # Earlier tests may have materialized persisted fragments (e.g. the
    # embedding projection in embedding_neardup); the cache manager would
    # then substitute InMemoryRelation for the scans under inspection and
    # the printed FileScan (inside the cached plan) shows no pushdown.
    # These assertions are about the fresh-scan plan, so clear the cache.
    spark.catalog.clearCache()
    fn, _ = REGISTRY[name]
    return fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def scans(plan: str) -> list[str]:
    """One line per FileScan with its PushedFilters/ReadSchema blobs."""
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln or "PushedFilters" in ln]


def test_q3_filters_pushed_to_scans(spark):
    """q3 filters on mktsegment and two date bounds — each must appear as
    a pushed parquet filter, not a post-scan Filter only."""
    plan = plan_of(spark, "q3_shipping_priority")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joined = "; ".join(pushed)
    assert "EqualTo(c_mktsegment" in joined, joined
    assert "LessThan(o_orderdate" in joined, joined
    assert "GreaterThan(l_shipdate" in joined, joined


def test_events_hourly_scan_prunes_props(spark):
    """events_hourly touches ts/event_type/user_id/value — the scan must
    NOT read the wide JSON props column."""
    plan = plan_of(spark, "events_hourly")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "props" not in s, s
        assert "ts" in s and "event_type" in s


def test_ann_ivf_centroid_scan_pushes_id_filter(spark):
    """The IVF centroid branch reads vec_id < 16 — pushed to parquet so a
    100 TB corpus never scans for its 16 coarse centroids."""
    plan = plan_of(spark, "ann_ivf_topk")
    pushed = "; ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "LessThan(vec_id,16)" in pushed.replace(" ", ""), pushed


def test_doc_queries_prune_text_free_columns(spark):
    """doc_shingle_index needs doc_id/n_chars/source/text only — embedding
    or timestamp columns must not be read."""
    plan = plan_of(spark, "doc_shingle_index")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    read_cols = set()
    for s in schemas:
        read_cols |= {c.split(":")[0] for c in s.split(",") if c}
    assert "text" in read_cols
    assert read_cols <= {"doc_id", "n_chars", "source", "text", "lang"}, read_cols


def test_bm25_scan_prunes_to_doc_id_and_text(spark):
    """The BM25 posting build touches only doc_id/text — the documents
    scan must not read lang/source/n_chars."""
    plan = plan_of(spark, "bm25_search")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "lang" not in s and "source" not in s, s


def test_ivfpq_corpus_scan_prunes_label(spark):
    """IVF-PQ reads vec_id/embedding; the label column must be pruned
    from every embeddings scan."""
    plan = plan_of(spark, "ann_ivfpq_topk")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "label" not in s, s


def test_sequence_packing_scan_prunes_to_doc_id_and_text(spark):
    plan = plan_of(spark, "sequence_packing")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "lang" not in s and "source" not in s, s


def test_pii_redaction_prunes_and_pushes(spark):
    """pii_redaction reads only (doc_id, text) and its doc_id < 200 gate
    must reach the parquet scan."""
    plan = plan_of(spark, "pii_redaction")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "lang" not in s and "source" not in s, s
    pushed = "; ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "LessThan(doc_id,200)" in pushed.replace(" ", ""), pushed


def test_quality_weighted_sample_is_shuffle_free(spark):
    """The Bernoulli keep is a stateless filter: no Exchange anywhere
    except the final presentation sort."""
    plan = plan_of(spark, "quality_weighted_sample")
    body = plan.split("Sort", 1)[-1]  # everything below the output sort
    assert "Exchange hashpartitioning" not in body, body


def test_dedup_blocks_single_hash_shuffle_key(spark):
    """Winner agg and join-back both partition on the block hash — the
    plan must contain hash Exchanges only on bh/doc_id keys, and the
    block slicing itself (explode) must sit directly over the scan with
    no Exchange in between."""
    plan = plan_of(spark, "dedup_blocks")
    # every hash Exchange is on bh or on doc_id (final regroup) — never
    # on the raw block string
    for m in re.findall(r"Exchange hashpartitioning\(([^,]+)", plan):
        key = m.strip()
        assert key.startswith("bh") or key.startswith("doc_id"), key


def test_zorder_layout_single_aggregation_shuffle(spark):
    """events_zorder_layout = scan -> project(z) -> partial agg ->
    exchange(cell) -> final agg: exactly one hash Exchange."""
    plan = plan_of(spark, "events_zorder_layout")
    hashex = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    keys = {m.strip() for m in hashex}
    assert all(k.startswith("cell") for k in keys), keys


def test_hll_scan_prunes_to_source_and_text(spark):
    """The HLL sketch needs only (source, text); doc_id/lang/n_chars
    must not be read."""
    plan = plan_of(spark, "hll_distinct_tokens")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "n_chars" not in s and "lang" not in s, s
        assert "text" in s and "source" in s


def test_mixture_sample_scan_prunes_and_single_corpus_window(spark):
    """mixture_sample reads (doc_id, source, text) only, and the doc-level
    running sum is ONE window partitioned by source (never a global
    single-partition window)."""
    plan = plan_of(spark, "mixture_sample")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "n_chars" not in s and "lang" not in s, s
    # every Window operator must carry a partition spec (no global window)
    for ln in plan.splitlines():
        if re.search(r"\bWindow\b", ln) and "windowspecdefinition" in ln:
            assert "specifiedwindowframe" in ln
            assert re.search(r"windowspecdefinition\(source", ln), ln


def test_decontaminate_bloom_probe_side_has_no_shuffle(spark):
    """The Bloom probe is K broadcast joins: above the corpus-shingle
    branch there must be NO Exchange until the final per-doc count."""
    plan = plan_of(spark, "decontaminate_bloom")
    # count Exchanges that hash-partition on (doc_id, h) — the old
    # regrouping shuffle; the new plan has none
    assert not re.search(r"Exchange hashpartitioning\(doc_id[^)]*,\s*h#", plan), plan


def test_decontaminate_semantic_single_narrow_pass(spark):
    """The semantic decontamination claim: the eval matrix rides inside
    the kernel closure, so there is NO join and no Exchange below the
    final-sort pair — one corpus scan feeding the Arrow eval, then only
    the sort_via_exchange hash+range pair of the global orderBy (round
    11: the hash exchange keeps the RangePartitioner sampling job from
    re-running the kernel — functions/ordering.py)."""
    plan = plan_of(spark, "decontaminate_semantic")
    assert "Join" not in plan, plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    # exactly the final-sort pair: one hash exchange on the sort key
    # feeding one rangepartitioning — nothing else shuffles
    assert sum("rangepartitioning" in ln for ln in exchanges) == 1, plan
    assert sum("hashpartitioning(vec_id" in ln for ln in exchanges) == 1, plan
    assert all(
        "rangepartitioning" in ln or "hashpartitioning(vec_id" in ln
        for ln in exchanges
    ), plan
    # the corpus scan reads only (vec_id, embedding)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        "vec_id" in s and "embedding" in s for s in schemas
    ), plan


def test_profile_vs_profile_prefilter_broadcasts_query_side(spark):
    """Both-sides-consensus prefilter must keep the J1 law: the query
    k-mer side is broadcast; the index side never shuffles into a
    sort-merge join."""
    plan = plan_of(spark, "profile_vs_profile_prefilter")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_prefilter_funnel_counters_share_one_derivation(spark):
    """The funnel's five counters cross-join 1-row aggregates; every join
    in the plan must be a Broadcast*Join of those scalar frames (no
    sort-merge anywhere)."""
    plan = plan_of(spark, "protein_prefilter_funnel")
    assert "SortMergeJoin" not in plan, plan


def test_bpe_pair_count_single_shuffle_and_pruned_scan(spark):
    """Each BPE training round is one pair-count aggregation; over the
    (already word-collapsed) vocabulary the per-round plan must carry
    exactly the two aggregation Exchanges (word groupBy + pair groupBy)
    plus the top-1 sort — and the documents scan must read text alone."""
    from pyspark.sql import functions as F

    from petasearch_spark.operators.text import _initial_vocab, _pair_counts
    from petasearch_spark.sources.tables import load_table

    spark.catalog.clearCache()
    docs = load_table(spark, "documents", SF_DIR, widen_scan=True)
    # the PRODUCTION round-1 lineage: _train_bpe_core's per-round plan is
    # exactly _pair_counts(_initial_vocab(...)) + the top-1 sort
    counted = (
        _pair_counts(_initial_vocab(docs))
        .orderBy(F.desc("cnt"), "a", "b")
        .limit(1)
    )
    plan = counted._jdf.queryExecution().executedPlan().toString()
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange == 2, plan
    for ln in scans(plan):
        if "FileScan parquet" in ln:
            assert "text" in ln and "doc_id" not in ln, ln


def test_dsir_plan_broadcast_model_and_take_ordered(spark):
    """dsir_importance_sample: data-volume shuffles are ONLY the model
    reduction (b) and the per-doc partial sums (doc_id); the model comes
    back as a broadcast join; top-K is TakeOrdered, never a global sort
    exchange; scans never read n_chars."""
    plan = plan_of(spark, "dsir_importance_sample")
    hashex = [m.strip() for m in re.findall(r"Exchange hashpartitioning\(([^,#]+)", plan)]
    assert sorted(set(hashex)) == ["b", "doc_id"], hashex
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "n_chars" not in plan


def test_nb_plan_broadcast_pivoted_model(spark):
    """lang_classifier_nb: one pivoted-model broadcast join (no per-class
    row fan-out), shuffles only on b / doc_id / the tiny confusion keys."""
    plan = plan_of(spark, "lang_classifier_nb")
    hashex = [m.strip() for m in re.findall(r"Exchange hashpartitioning\(([^,#]+)", plan)]
    assert sorted(set(hashex)) == ["b", "doc_id", "lang"], hashex
    assert plan.count("BroadcastHashJoin") == 1
    assert "n_chars" not in plan and "source" not in plan


def test_span_removal_plan_shuffles_only_on_wh_and_doc(spark):
    """dedup_span_removal: data shuffles only on the 8-byte window hash
    (dup counting) and doc_id (removed-set agg / rebuild join / final
    sort); scans read nothing beyond (doc_id, text)."""
    plan = plan_of(spark, "dedup_span_removal")
    hashex = [m.strip() for m in re.findall(r"Exchange hashpartitioning\(([^,#]+)", plan)]
    assert sorted(set(hashex)) == ["doc_id", "wh"], hashex
    for ln in scans(plan):
        if "FileScan parquet" in ln:
            assert "text" in ln and "lang" not in ln and "n_chars" not in ln, ln


def test_ann_filtered_topk_label_predicate_reaches_scan(spark):
    """ann_filtered_topk: the label IN-filter must be pushed into the
    parquet scan (pre-filter, exact) — never applied after the cosine
    join as a recall-lossy post-filter."""
    plan = plan_of(spark, "ann_filtered_topk")
    scan_lines = [ln for ln in scans(plan) if "FileScan parquet" in ln and "label" in ln]
    # the scan itself carries the IN-predicate (DataFilters/PushedFilters)
    assert any("IN (2,5,7)" in ln or "In(label" in ln for ln in scan_lines), plan


def test_sax_motifs_plan_user_array_form(spark):
    """events_sax_motifs: hash shuffles only on user_id (day sums +
    series collect) and word (count agg) — never a rank-range self-join
    reshuffle; top-K is TakeOrdered; scans read only (ts, user_id,
    value)."""
    plan = plan_of(spark, "events_sax_motifs")
    hashex = [m.strip() for m in re.findall(r"Exchange hashpartitioning\(([^,#]+)", plan)]
    assert sorted(set(hashex)) == ["user_id", "word"], hashex
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    for ln in scans(plan):
        if "FileScan parquet" in ln:
            assert "value" in ln and "event_type" not in ln and "props" not in ln, ln


def test_quantile_sketch_plan_one_data_shuffle_and_pruned_scan(spark):
    """events_quantile_sketch: the ONLY Exchange that sees data volume is
    the map-side-combined bucket aggregation on (event_type, d, l); the
    window reshuffle afterwards moves bucket rows only (hash on
    event_type alone). The scan reads just (event_type, value)."""
    plan = plan_of(spark, "events_quantile_sketch")
    hashex = [m.strip() for m in re.findall(r"Exchange hashpartitioning\(([^,#]+)", plan)]
    assert sorted(set(hashex)) == ["event_type"], hashex
    # partial_count before the first exchange = map-side combine on buckets
    assert "partial_count" in plan, plan
    body = plan.split("ReadSchema")[1]
    assert "event_type" in body and "value" in body
    assert "props" not in body and "user_id" not in body, body


def test_ann_ivf_filtered_probe_prunes_buckets_and_pushes_label(spark):
    """ann_ivf_filtered_topk's probe: the index scan must show BOTH the
    nprobe bucket selection as PARTITION pruning (bucket is the
    partitioning column of the materialized index) and the label
    IN-predicate as a parquet PushedFilter inside those directories —
    pre-filtering at the storage layer, never a post-filter. (The
    registered query localCheckpoints its result, which hides the probe
    plan, so this pins the probe DataFrame directly.)"""
    import os
    import tempfile

    from petasearch_spark.operators.ivf import (
        N_CENTROIDS,
        N_QUERIES,
        probe_ivf_index,
        write_ivf_index,
    )
    from pyspark.sql import functions as F

    from petasearch_spark.operators.similarity import ANN_FILTER_LABELS, _as_double
    from petasearch_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    cent = [
        (r["vec_id"], r["v"])
        for r in emb.filter(F.col("vec_id") < N_CENTROIDS).select("vec_id", "v").collect()
    ]
    with tempfile.TemporaryDirectory(prefix="ivf_lbl_pin_") as tmp:
        idx = os.path.join(tmp, "idx")
        write_ivf_index(emb, idx, cent, extra_cols=("label",))
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        persisted = []
        probe = probe_ivf_index(
            spark, idx, q, cent,
            scan_filter=F.col("label").isin(*ANN_FILTER_LABELS),
            _persisted=persisted,
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        try:
            idx_scans = [
                ln for ln in plan.splitlines()
                if "FileScan parquet" in ln or "PartitionFilters" in ln
                or "PushedFilters" in ln or "Location" in ln
            ]
            joined = "\n".join(idx_scans)
            assert "bucket" in joined and "PartitionFilters" in joined, plan
            assert "In(label" in plan or "label IN" in plan, plan
            # and it still returns real results
            assert probe.count() > 0
        finally:
            for p in persisted:
                p.unpersist()
