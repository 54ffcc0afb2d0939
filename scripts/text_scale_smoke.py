"""Scale smoke: the text/retrieval/packing surface on a corpus ~40x the
bench documents table.

Reuses dedup_scale_smoke's distributed synthetic corpus (200k docs,
30k-word vocabulary, injected near-dup pairs, corpus-wide boilerplate
prefix) and runs the REGISTERED query functions unchanged plus the
DataFrame-level cores:

* ``sequence_packing`` — asserts exact token conservation and the
  ceil(total/CTX) pack count (the two-phase prefix sum must agree with
  arithmetic at any size);
* ``bm25_search`` core (``bm25_rank``) with smoke-vocabulary queries,
  including boilerplate terms with df == n_docs (idf -> ~0, the
  worst-case posting length);
* ``decontaminate_minhash`` — recall over the injected near-dup pairs
  that cross the train/eval split;
* ``unigram_logprob_score`` / ``gopher_quality`` / ``dup_span_coverage``
  row counts (per-doc outputs must stay linear).

    python scripts/text_scale_smoke.py [n_docs]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.operators.bm25 import bm25_rank
from petasearch_spark.operators.corpus import CTX_LEN, EVAL_MOD
from petasearch_spark.operators.portable import tokens
from petasearch_spark.registry import REGISTRY
from petasearch_spark.session import get_spark
from petasearch_spark.sources.tables import load_table

from dedup_scale_smoke import DUP_STRIDE, synth_documents  # noqa: E402

SMOKE_QUERIES = {
    "q_boiler": ("common", "boilerplate", "header"),  # df == n_docs terms
    "q_rare": ("w123", "w4567"),
    "q_mixed": ("shared", "w42"),
}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("text_scale_smoke")
    out: dict[str, object] = {"n_docs": n_docs}

    tmp = tempfile.mkdtemp(prefix="text_smoke_")
    try:
        t0 = time.time()
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out["generate_s"] = round(time.time() - t0, 1)

        # --- sequence packing: conservation at scale ---
        t0 = time.time()
        packs = REGISTRY["sequence_packing"][0](spark, tmp)
        agg = packs.agg(
            F.count(F.lit(1)).alias("n_packs"), F.sum("fill_tokens").alias("filled")
        ).collect()[0]
        out["sequence_packing_s"] = round(time.time() - t0, 1)
        total_tokens = (
            load_table(spark, "documents", tmp)
            .select(F.sum(F.size(tokens(F.col("text")))).alias("t"))
            .collect()[0]["t"]
        )
        assert agg["filled"] == total_tokens, (agg["filled"], total_tokens)
        assert agg["n_packs"] == math.ceil(total_tokens / CTX_LEN)
        out["n_packs"] = agg["n_packs"]

        # --- BM25 with worst-case (corpus-wide) posting lists ---
        t0 = time.time()
        docs = load_table(spark, "documents", tmp, widen_scan=True)
        hits = bm25_rank(docs, SMOKE_QUERIES).collect()
        out["bm25_full_s"] = round(time.time() - t0, 1)
        out["bm25_hits"] = len(hits)
        assert {h["query_id"] for h in hits} == set(SMOKE_QUERIES)
        # stopword pruning (max_df_frac): the df == n_docs boilerplate
        # terms carry no idf signal; dropping them restores output-bounded
        # candidate generation
        t0 = time.time()
        pruned = bm25_rank(docs, SMOKE_QUERIES, max_df_frac=0.5).collect()
        out["bm25_pruned_s"] = round(time.time() - t0, 1)
        out["bm25_pruned_hits"] = len(pruned)

        # --- fuzzy decontamination: recall on injected cross-split dups ---
        injected_cross = {
            (a, b) if a % EVAL_MOD != 0 else (b, a)
            for k in range(n_docs // DUP_STRIDE)
            for a, b in [(k * DUP_STRIDE, k * DUP_STRIDE + 1)]
            if b < n_docs and (a % EVAL_MOD == 0) != (b % EVAL_MOD == 0)
        }
        t0 = time.time()
        found = {
            (r["doc_id"], r["eval_id"])
            for r in REGISTRY["decontaminate_minhash"][0](spark, tmp).collect()
        }
        out["decontaminate_minhash_s"] = round(time.time() - t0, 1)
        out["decon_injected_cross"] = len(injected_cross)
        out["decon_recall"] = round(len(found & injected_cross) / max(len(injected_cross), 1), 4)

        # --- per-doc quality families stay linear ---
        for name in ("unigram_logprob_score", "gopher_quality", "dup_span_coverage", "doc_chunk_overlap"):
            t0 = time.time()
            out[f"{name}_rows"] = REGISTRY[name][0](spark, tmp).count()
            out[f"{name}_s"] = round(time.time() - t0, 1)

        # --- distributed BPE tokenizer training at scale ---
        from petasearch_spark.operators.text import train_bpe

        t0 = time.time()
        rules = [tuple(r) for r in train_bpe(spark, docs, 6).collect()]
        out["bpe_train_s"] = round(time.time() - t0, 1)
        out["bpe_rules"] = [f"{r[1]}+{r[2]}" for r in rules]
        assert len(rules) == 6, rules
        counts = [r[4] for r in rules]
        # merging can only remove or split existing adjacencies, so the
        # best-pair count is non-increasing round over round
        assert counts == sorted(counts, reverse=True), counts
        # run-to-run determinism (tie-breaks are total)
        assert [tuple(r) for r in train_bpe(spark, docs, 6).collect()] == rules

        # --- the full curation composition at scale ---
        t0 = time.time()
        funnel = REGISTRY["corpus_curation_funnel"][0](spark, tmp)
        import pyspark.sql.functions as SF

        kept = funnel.agg(
            SF.count(SF.lit(1)).alias("n"), SF.sum(SF.col("kept").cast("int")).alias("k")
        ).collect()[0]
        out["curation_funnel_s"] = round(time.time() - t0, 1)
        out["curation_rows"] = kept["n"]
        out["curation_kept"] = kept["k"]
        assert kept["n"] == n_docs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
