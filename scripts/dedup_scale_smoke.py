"""Scale smoke: the dedup/curation pipeline on a corpus ~40x the bench
documents table.

Synthesizes N documents DISTRIBUTIVELY (deterministic per-partition RNG,
no driver-side data) with KNOWN injected near-duplicates (every 50th doc
pair shares 59/60 words in order), writes them as a documents.parquet the
registry queries read natively, then runs the REGISTERED query functions
unchanged: exact dedup, MinHash-LSH, Jaccard pairs, connected-component
clusters, and train/eval decontamination. Verifies that LSH recovers the
injected pairs (recall) and prints one JSON line of stage wall-clocks.

This is the would-it-scale probe for the curation surface: the shingle
kernel is an embarrassingly-parallel map, candidate generation is one
equi-join on 8-byte keys whose output is bounded by real collisions (a
realistic 30k-word vocabulary keeps non-dup shingles unique), and every
verify step touches only candidate pairs — cost is linear in corpus
size, executor count is the scaling knob.

    python scripts/dedup_scale_smoke.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.registry import REGISTRY
from petasearch_spark.session import get_spark

WORDS_PER_DOC = 60
VOCAB = 30_000
DUP_STRIDE = 50  # doc_id % DUP_STRIDE == 1 duplicates doc_id - 1
#: every doc gets this templated boilerplate prefix — its 3-gram shingles
#: have df == n_docs, the hot-shingle scenario the MAX_SHINGLE_DF candidate
#: cap exists for (an uncapped self-join would try ~n² pairs on them)
HOT_PREFIX = "common boilerplate header shared by every document"


def synth_documents(spark, n: int):
    """n deterministic word-soup docs; every (k*STRIDE, k*STRIDE+1) pair is
    a near-dup differing in exactly one word position. All docs share the
    HOT_PREFIX boilerplate (injected corpus-wide hot shingles)."""
    base = spark.range(n).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            texts = []
            for doc_id in ids:
                is_dup = doc_id % DUP_STRIDE == 1
                seed = int(doc_id - 1) if is_dup else int(doc_id)
                rng = np.random.RandomState(seed)
                words = rng.randint(0, VOCAB, WORDS_PER_DOC)
                if is_dup:  # mutate one deterministic position
                    pos = int(doc_id) % WORDS_PER_DOC
                    words[pos] = (words[pos] + 1) % VOCAB
                texts.append(HOT_PREFIX + " " + " ".join(f"w{w}" for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": "en",
                    "source": [f"src{int(i) % 20}" for i in ids],
                }
            )

    docs = base.mapInPandas(gen, "doc_id long, text string, lang string, source string")
    return docs.withColumn("n_chars", F.length("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("dedup_scale_smoke")
    out: dict[str, object] = {"n_docs": n_docs}

    tmp = tempfile.mkdtemp(prefix="dedup_smoke_")
    try:
        t0 = time.time()
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out["generate_s"] = round(time.time() - t0, 1)

        injected = {
            (k * DUP_STRIDE, k * DUP_STRIDE + 1)
            for k in range(n_docs // DUP_STRIDE)
            if k * DUP_STRIDE + 1 < n_docs
        }
        out["injected_pairs"] = len(injected)

        for name in (
            "dedup_exact",
            "dedup_minhash_lsh",
            "dedup_jaccard_pairs",
            "dedup_clusters",
            "decontaminate_ngram_overlap",
        ):
            t0 = time.time()
            df = REGISTRY[name][0](spark, tmp)
            if name in ("dedup_minhash_lsh", "dedup_jaccard_pairs"):
                found = {(r["doc_a"], r["doc_b"]) for r in df.collect()}
                out[f"{name}_recall"] = round(
                    len(found & injected) / max(len(injected), 1), 4
                )
                out[f"{name}_pairs"] = len(found)
            else:
                out[f"{name}_rows"] = df.count()
            out[f"{name}_s"] = round(time.time() - t0, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
