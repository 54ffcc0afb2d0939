"""Scale smoke: the data-selection pair (DSIR + NB classifier) on a
corpus ~40x the bench documents table.

Synthesizes n docs across 5 languages whose vocabularies are 80%
lang-banded / 20% shared, so class separability is REAL at scale (the
sf tables' lang labels are uncorrelated with text — fine for oracle
parity, useless for measuring whether the model actually concentrates
mass). Asserts:

* ``lang_classifier_nb`` — confusion matrix sums to n_docs and is
  diagonal-dominant (accuracy >= 0.9: the 20% shared band keeps it
  below 1.0, the 80% band far above prior-only 0.2);
* ``dsir_importance_sample`` — the top-K is saturated by the target
  ('en') slice, since en grams are ~5x more likely under the target
  model than under the raw mixture;
* both finish in linear time (timings printed for BASELINE notes).

    python scripts/selection_scale_smoke.py [n_docs]
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

from petasearch_spark.operators.selection import (
    DSIR_TARGET_LANG,
    DSIR_TOP_K,
    dsir_importance_sample,
    lang_classifier_nb,
)
from petasearch_spark.session import get_spark

LANGS = ["de", "en", "es", "fr", "zh"]
WORDS_PER_DOC = 60
BAND = 400  #: lang-specific vocabulary band width
SHARED = 400  #: shared vocabulary band width


def synth_documents(spark, n: int):
    """n deterministic docs, lang = LANGS[doc_id % 5]; each word comes
    from the lang band with p=0.8, the shared band with p=0.2."""
    base = spark.range(n).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            texts, langs = [], []
            for doc_id in ids:
                li = int(doc_id) % len(LANGS)
                rng = np.random.RandomState(int(doc_id))
                shared = rng.random_sample(WORDS_PER_DOC) < 0.2
                w = rng.randint(0, BAND, WORDS_PER_DOC) + (li + 1) * 10_000
                w[shared] = rng.randint(0, SHARED, int(shared.sum()))
                texts.append(" ".join(f"w{x}" for x in w))
                langs.append(LANGS[li])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": langs,
                    "source": [f"src{int(i) % 20}" for i in ids],
                }
            )

    docs = base.mapInPandas(gen, "doc_id long, text string, lang string, source string")
    return docs.withColumn("n_chars", F.length("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("selection_scale_smoke")
    out: dict[str, object] = {"n_docs": n_docs}

    tmp = tempfile.mkdtemp(prefix="selection_smoke_")
    try:
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )

        t0 = time.time()
        conf = lang_classifier_nb(spark, tmp).collect()
        out["nb_seconds"] = round(time.time() - t0, 2)
        total = sum(r["n_docs"] for r in conf)
        correct = sum(r["n_docs"] for r in conf if r["lang"] == r["pred_lang"])
        out["nb_total_docs"] = total
        out["nb_accuracy"] = round(correct / total, 4)
        assert total == n_docs, (total, n_docs)
        assert correct / total >= 0.9, f"NB accuracy {correct/total} < 0.9 on banded vocab"

        t0 = time.time()
        top = dsir_importance_sample(spark, tmp).collect()
        out["dsir_seconds"] = round(time.time() - t0, 2)
        n_target = sum(1 for r in top if r["lang"] == DSIR_TARGET_LANG)
        out["dsir_topk_target_frac"] = round(n_target / len(top), 4)
        assert len(top) == DSIR_TOP_K, len(top)
        assert n_target / len(top) >= 0.95, (
            f"only {n_target}/{len(top)} top-K docs are '{DSIR_TARGET_LANG}'"
        )

        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
