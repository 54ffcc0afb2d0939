"""Scale smoke: the `curate` CLI end-to-end at 200k documents.

Dumps dedup_scale_smoke's synthetic corpus (near-dup pairs, corpus-wide
boilerplate) to JSONL with planted malformed AND null-field lines, then
runs the real CLI handler — ingest/quarantine, canonical staging, the
composed funnel, curated store, packing — and asserts the printed
accounting exactly: every input line lands in exactly one of
quarantined / dropped / staged, kept == curated rows, and
n_packs == ceil(kept_tokens / ctx).

    python scripts/curate_scale_smoke.py [n_docs]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dedup_scale_smoke import synth_documents  # noqa: E402
from petasearch_spark.cli import _curate
from petasearch_spark.session import get_spark

MALFORMED_MOD = 1000  # 1 truncated line per 1000
NULLFIELD_MOD = 1500  # 1 parsed-but-id-less line per 1500


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("curate_scale_smoke")
    tmp = tempfile.mkdtemp(prefix="curate_smoke_")
    try:
        docs = synth_documents(spark, n_docs)
        line = F.to_json(
            F.struct(
                F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
                "text",
                "lang",
                "source",
            )
        )
        value = (
            F.when(F.col("doc_id") % MALFORMED_MOD == 7, F.substring(line, 1, 15))
            .when(F.col("doc_id") % NULLFIELD_MOD == 11, F.lit('{"lang": "en"}'))
            .otherwise(line)
        )
        dump = os.path.join(tmp, "dump.jsonl")
        t0 = time.time()
        docs.select(value.alias("value")).write.mode("overwrite").text(dump)
        dump_s = round(time.time() - t0, 1)
        n_bad = docs.filter(F.col("doc_id") % MALFORMED_MOD == 7).count()
        n_null = docs.filter(
            (F.col("doc_id") % NULLFIELD_MOD == 11) & (F.col("doc_id") % MALFORMED_MOD != 7)
        ).count()

        out_dir = os.path.join(tmp, "out")
        t0 = time.time()
        rc = _curate(spark, dump, out_dir)
        total_s = round(time.time() - t0, 1)
        assert rc == 0
        # _curate prints its own report; recompute the essentials from disk
        fun = spark.read.parquet(os.path.join(out_dir, "funnel.parquet"))
        staged = spark.read.parquet(os.path.join(out_dir, "staging", "documents.parquet"))
        kept = spark.read.parquet(os.path.join(out_dir, "curated", "documents.parquet"))
        packs = spark.read.parquet(os.path.join(out_dir, "packs.parquet"))

        n_staged = staged.count()
        assert n_staged == n_docs - n_bad - n_null, (n_staged, n_docs, n_bad, n_null)
        assert fun.count() == n_staged
        n_kept = kept.count()
        assert n_kept == fun.filter("kept").count() and 0 < n_kept < n_staged
        assert fun.filter("kept IS NULL OR sampled IS NULL").count() == 0
        from petasearch_spark.operators.corpus import CTX_LEN
        from petasearch_spark.operators.portable import tokens

        kept_tokens = kept.agg(F.sum(F.size(tokens(F.col("text"))).cast("long"))).collect()[0][0]
        assert packs.count() == math.ceil(kept_tokens / CTX_LEN)

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "dump_write_s": dump_s,
                    "curate_total_s": total_s,
                    "n_quarantined": n_bad,
                    "n_dropped_null_fields": n_null,
                    "n_staged": n_staged,
                    "n_kept": n_kept,
                    "kept_tokens": int(kept_tokens),
                    "n_packs": packs.count(),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
