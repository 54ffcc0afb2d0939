"""Round-5 scale smoke: exact duplicated-span REMOVAL at >= 1M docs with
an independent plain-Python exactness spot-check, and BPE corpus ENCODING
with a cross-operator conservation assertion.

Reuses dedup_scale_smoke's distributed synthetic corpus. Its duplicated
spans at SPAN_W=8 come from two injected populations:

* every (k*50, k*50+1) near-dup pair shares 59/60 words in order — long
  runs of duplicated windows, canonical protection on the lower doc_id;
* the 7-token boilerplate prefix + the doc's first word: ~n/30k docs
  share each first word, so window (prefix, w_first) is duplicated
  across all of them — the hot-key population.

Assertions:

* every injected dup doc (doc_id % 50 == 1) is rewritten;
* EXACTNESS: for a deterministic doc sample (dup docs, their canonical
  partners, hot-prefix docs, corpus edges), a plain-Python twin
  recomputes the removal rule from corpus-wide window stats (collected
  only for the sample's window hashes — a bounded set) and must match
  the engine's (n_toks, n_removed, kept_hash) cell-exactly, including
  docs the engine must NOT rewrite;
* bpe_encode_corpus conserves tokens against bpe_fertility: both train
  the same rules, so sum(encode.n_tokens) == sum(fertility.bpe_tokens)
  and the word counts agree; max token id <= |alphabet| + n_merges.

    python scripts/round5_scale_smoke.py [n_docs_span] [n_docs_bpe]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.operators.portable import tokens
from petasearch_spark.operators.quality import SPAN_W, _windows, dedup_span_removal
from petasearch_spark.operators.text import N_BPE_MERGES, bpe_fertility, encode_corpus
from petasearch_spark.registry import REGISTRY
from petasearch_spark.session import get_spark
from petasearch_spark.sources.tables import load_table

from dedup_scale_smoke import DUP_STRIDE, synth_documents  # noqa: E402


def py_hash64(s: str) -> int:
    """Plain-Python twin of portable.hash64 (first 15 md5 hex -> BIGINT)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def spot_check_span_removal(spark, tmp: str, n: int, out_df) -> int:
    """Independent removal-rule recomputation for a deterministic doc
    sample; returns the number of docs checked. Corpus-wide window stats
    are fetched ONLY for the sample's window hashes (a few hundred keys,
    broadcast-joined), so the check is bounded regardless of n."""
    sample_ids = sorted(
        {0, 1, 50, 51, 100, 101, n // 2, n // 2 + 1, n - 2, n - 1} & set(range(n))
    )
    docs = load_table(spark, "documents", tmp, widen_scan=True)
    sample = {
        r["doc_id"]: r["text"].split()
        for r in docs.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    wins_by_doc = {
        d: [
            (i, py_hash64(" ".join(ts[i : i + SPAN_W])))
            for i in range(len(ts) - SPAN_W + 1)
        ]
        for d, ts in sample.items()
    }
    whs = sorted({h for ws in wins_by_doc.values() for _, h in ws})
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    wins = toks.select(
        "doc_id", F.posexplode(_windows(F.col("ts"), SPAN_W)).alias("idx", "wh")
    )
    whdf = spark.createDataFrame([(h,) for h in whs], "wh long")
    occ = {
        r["wh"]: (r["n_occ"], (r["canon"]["doc_id"], r["canon"]["idx"]))
        for r in wins.join(F.broadcast(whdf), "wh")
        .groupBy("wh")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "idx")).alias("canon"),
        )
        .collect()
    }
    got = {
        r["doc_id"]: (r["n_toks"], r["n_removed"], r["kept_hash"])
        for r in out_df.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    for d, ts in sample.items():
        removed: set[int] = set()
        protected: set[int] = set()
        for i, h in wins_by_doc[d]:
            n_occ, canon = occ[h]
            if n_occ >= 2:
                ps = set(range(i + 1, i + SPAN_W + 1))
                (protected if canon == (d, i) else removed).update(ps)
        removed -= protected
        if removed:
            kept = " ".join(t for j, t in enumerate(ts, start=1) if j not in removed)
            want = (len(ts), len(removed), py_hash64(kept))
            assert got.get(d) == want, (d, got.get(d), want)
        else:
            assert d not in got, (d, got.get(d))
    return len(sample)


def main() -> None:
    n_span = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_bpe = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("round5_scale_smoke")
    out: dict[str, object] = {"n_docs_span": n_span, "n_docs_bpe": n_bpe}

    tmp = tempfile.mkdtemp(prefix="round5_smoke_")
    try:
        t0 = time.time()
        synth_documents(spark, n_span).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out["generate_s"] = round(time.time() - t0, 1)

        # --- span removal at n_span ---
        t0 = time.time()
        removed = dedup_span_removal(spark, tmp).persist()
        out["span_removal_rows"] = removed.count()
        out["span_removal_s"] = round(time.time() - t0, 1)
        n_dup = (n_span - 2) // DUP_STRIDE + 1  # ids 1, 51, ... < n_span
        got_dup = removed.filter(
            (F.col("doc_id") % DUP_STRIDE == 1) & (F.col("n_removed") > 0)
        ).count()
        out["dup_docs_rewritten"] = f"{got_dup}/{n_dup}"
        assert got_dup == n_dup, (got_dup, n_dup)
        out["span_spotcheck_docs"] = spot_check_span_removal(spark, tmp, n_span, removed)
        removed.unpersist()

        # --- BPE encode at n_bpe: conservation vs fertility ---
        if n_bpe != n_span:
            shutil.rmtree(os.path.join(tmp, "documents.parquet"))
            synth_documents(spark, n_bpe).write.mode("overwrite").parquet(
                os.path.join(tmp, "documents.parquet")
            )
        t0 = time.time()
        enc = encode_corpus(
            spark, load_table(spark, "documents", tmp, widen_scan=True), N_BPE_MERGES
        )
        agg = enc.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_tokens").alias("toks"),
        ).collect()[0]
        out["bpe_encode_s"] = round(time.time() - t0, 1)
        out["bpe_encode_docs"] = agg["docs"]
        t0 = time.time()
        fert = bpe_fertility(spark, tmp).collect()
        out["bpe_fertility_s"] = round(time.time() - t0, 1)
        assert agg["toks"] == sum(r["bpe_tokens"] for r in fert), (
            agg["toks"],
            sum(r["bpe_tokens"] for r in fert),
        )
        assert agg["words"] == sum(r["n_words"] for r in fert)
        max_id = enc.select(
            F.max(
                F.array_max(
                    F.transform(F.split("token_ids", " "), lambda x: x.cast("int"))
                )
            )
        ).collect()[0][0]
        out["bpe_max_token_id"] = max_id
        assert max_id <= 26 + N_BPE_MERGES, max_id

        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
