"""Scale smoke: INCREMENTAL curate (`curate-stream`) economics at 200k
documents — the claim under test is that a landing zone growing by 10%
costs parse-of-the-new-files plus the (corpus-global) funnel, never a
re-parse of the old 200k (the streaming checkpoint is the parse-once
barrier), and that a no-growth run is a pure resume no-op.

Three runs over one out_dir:
1. initial 200k-doc dump          -> full cost (baseline)
2. +20k docs in a NEW subdir      -> incremental: only the new files
                                     parse; funnel recomputes over 220k
3. nothing new                    -> no-op: zero batches, all stages
                                     resumed

After run 2 the ORIGINAL dump files are poisoned in place (same size +
mtime restored) before run 3 — if any later run re-read them, the
accounting would shift and the assertions fail.

    python scripts/round6_curate_stream_smoke.py [n_docs] [n_extra]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dedup_scale_smoke import synth_documents  # noqa: E402
from petasearch_spark.session import get_spark
from petasearch_spark.streaming.curate_stream import curate_stream

MALFORMED_MOD = 1000


def _dump(docs, path: str) -> None:
    line = F.to_json(
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
            "text",
            "lang",
            "source",
        )
    )
    value = F.when(
        F.col("doc_id") % MALFORMED_MOD == 7, F.substring(line, 1, 15)
    ).otherwise(line)
    docs.select(value.alias("value")).write.mode("overwrite").text(path)


def _poison_in_place(dump_subdir: str) -> None:
    for root, _, files in os.walk(dump_subdir):
        for f in files:
            if not f.startswith("part-"):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            with open(p, "r+") as fh:
                fh.write("POISON NOT JSON ")
            os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_extra = int(sys.argv[2]) if len(sys.argv) > 2 else n_docs // 10
    spark = get_spark("curate_stream_smoke")
    tmp = tempfile.mkdtemp(prefix="cstream_smoke_")
    out: dict[str, object] = {"n_docs": n_docs, "n_extra": n_extra}
    try:
        landing = os.path.join(tmp, "landing")
        os.makedirs(landing)
        all_docs = synth_documents(spark, n_docs + n_extra).persist()
        _dump(all_docs.filter(F.col("doc_id") < n_docs), os.path.join(landing, "day1"))

        out_dir = os.path.join(tmp, "out")
        t0 = time.time()
        r1 = curate_stream(spark, landing, out_dir)
        out["initial_s"] = round(time.time() - t0, 1)
        out["initial"] = {k: r1[k] for k in ("n_input_lines", "n_quarantined", "n_staged", "n_kept", "stream_batches")}
        assert r1["n_input_lines"] == n_docs
        spark.catalog.clearCache()

        # +10% arrives; the old files are poisoned AFTER this run's dump
        # lands so run 2 must not touch them
        _dump(
            all_docs.filter(F.col("doc_id") >= n_docs), os.path.join(landing, "day2")
        )
        _poison_in_place(os.path.join(landing, "day1"))
        t0 = time.time()
        r2 = curate_stream(spark, landing, out_dir)
        out["incremental_s"] = round(time.time() - t0, 1)
        out["incremental"] = {k: r2[k] for k in ("n_input_lines", "n_quarantined", "n_staged", "n_kept", "stream_batches")}
        assert r2["n_input_lines"] == n_docs + n_extra, r2["n_input_lines"]
        assert r2["funnel"]["n_docs"] == r2["n_staged"]
        assert r2["resumed_stages"] == []
        spark.catalog.clearCache()

        t0 = time.time()
        r3 = curate_stream(spark, landing, out_dir)
        out["noop_s"] = round(time.time() - t0, 1)
        assert r3["stream_batches"] == 0
        assert r3["resumed_stages"] == ["staging", "funnel", "curated", "packs"]
        assert r3["n_staged"] == r2["n_staged"] and r3["n_kept"] == r2["n_kept"]
        out["noop_resumed"] = r3["resumed_stages"]
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
