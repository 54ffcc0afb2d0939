"""Scale smoke for the retrieval/monitoring additions: SemDeDup at a
√n-scaled centroid count, exact phrase search, histogram-based value
quantiles and the embedding quality profile — each at 40-100x its bench
input, running the REGISTERED DataFrame cores unchanged and asserting
the property that must survive scale:

* semdedup   — K grows with the corpus (K ≈ √n); injected EXACT
               duplicates (cosine 1.0) must always co-cluster with their
               original (the SemDeDup premise) and be dropped; every
               drop names a smaller-id representative.
* phrase     — every phrase's own source document matches itself; the
               postings probe stays broadcast-shaped at 200k docs. The
               smoke strips the corpus-wide boilerplate PREFIX first:
               left in place, the first-3-token phrase of every source
               doc is the same boilerplate trigram matching all 200k
               docs — an (n_phrases x n_docs)-row answer whose driver
               collect() is the failure, not the plan (the df-cap /
               max_df stopword story from bm25 applies verbatim; assert
               through aggregates, never collect, for such phrases).
* quantiles  — 5M events whose value distribution is uniform over 1000
               distinct values: p50/p90/p99 have closed-form answers the
               histogram+running-count plan must reproduce exactly.
* profile    — injected corrupt vectors (null / bad-dim / NaN / Inf)
               are counted exactly at 200k rows.

    python scripts/retrieval_scale_smoke.py [n_vecs] [n_docs] [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.session import get_spark


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000
    spark = get_spark("retrieval_scale_smoke")
    out: dict[str, object] = {"n_vecs": n_vecs, "n_docs": n_docs, "n_events": n_events}

    # --- SemDeDup at K ≈ √n ---------------------------------------------
    import shutil
    import tempfile

    from petasearch_spark.operators.ivf import DIM, semdedup_frame

    n_dups = n_vecs // 100
    tmp = tempfile.mkdtemp(prefix="ret_smoke_")

    def synth_vecs(batches):
        # numpy kernel, not an interpreted HOF — 13M lambda evals per
        # downstream pass otherwise; materialized to parquet ONCE below
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                orig = int(i) - n_vecs if i >= n_vecs else int(i)
                v = np.random.RandomState(orig).standard_normal(DIM)
                if i >= n_vecs:
                    v = v * 2.0  # scaled copy: cosine exactly 1
                rows.append(v)
            yield pd.DataFrame({"vec_id": ids, "v": rows})

    vec_path = os.path.join(tmp, "vecs.parquet")
    (
        spark.range(n_vecs + n_dups)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_vecs, schema="vec_id long, v array<double>")
        .write.mode("overwrite").parquet(vec_path)
    )
    emb = spark.read.parquet(vec_path)
    k = max(16, int((n_vecs + n_dups) ** 0.5))
    # tau = 0.7: random 64-dim Gaussians essentially never clear it, so
    # the drop set should be almost exactly the injected exact copies
    # (at the default tau = 0.4, co-clustered random vectors correlate
    # through their shared centroid and prototype-prune each other — real
    # SemDeDup behavior, but a weaker assertion)
    t0 = time.time()
    rows = semdedup_frame(emb, n_centroids=k, threshold=0.7).collect()
    out["semdedup_s"] = round(time.time() - t0, 1)
    out["semdedup_k"] = k
    dropped = {r["vec_id"]: r["dup_of"] for r in rows if r["keep"] == 0}
    out["semdedup_dropped"] = len(dropped)
    assert len(rows) == n_vecs + n_dups
    # every injected exact duplicate co-clusters with its original and drops
    for i in range(n_dups):
        assert (i + n_vecs) in dropped, f"exact dup {i + n_vecs} survived"
    for vid, rep in dropped.items():
        assert rep is not None and rep < vid
    assert len(dropped) <= int(n_dups * 1.05), (len(dropped), n_dups)

    # --- phrase search over the synthetic corpus ------------------------
    from dedup_scale_smoke import synth_documents

    from petasearch_spark.operators.bm25 import PHRASE_SRC_MOD, phrase_rank

    try:
        from dedup_scale_smoke import HOT_PREFIX

        docs_path = os.path.join(tmp, "documents.parquet")
        synth_documents(spark, n_docs).write.mode("overwrite").parquet(docs_path)
        # strip the boilerplate prefix so phrases are informative content
        # trigrams (see module docstring for the boilerplate worst case)
        docs = spark.read.parquet(docs_path).withColumn(
            "text", F.expr(f"substring(text, {len(HOT_PREFIX) + 2})")
        )
        t0 = time.time()
        hits = phrase_rank(docs)
        agg = hits.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("phrase_id").alias("queries"),
            F.sum((F.col("doc_id") == F.col("phrase_id")).cast("long")).alias("self_hits"),
        ).collect()[0]
        out["phrase_s"] = round(time.time() - t0, 1)
        out["phrase_rows"] = agg["rows"]
        out["phrase_queries"] = agg["queries"]
        n_expected = docs.filter(F.col("doc_id") % PHRASE_SRC_MOD == 1).count()
        # every phrase matches at least its own source document
        assert agg["self_hits"] == n_expected == agg["queries"], (
            agg["self_hits"], n_expected, agg["queries"],
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise

    # --- exact quantiles with closed-form answers ------------------------
    from petasearch_spark.operators.events import value_quantiles

    n_distinct = 1000
    ev = spark.range(n_events).select(
        F.lit("x").alias("event_type"),
        ((F.col("id") * 7919) % n_distinct).cast("double").alias("value"),
    )
    t0 = time.time()
    q = value_quantiles(ev).collect()
    out["quantiles_s"] = round(time.time() - t0, 1)
    assert len(q) == 1 and q[0]["n_events"] == n_events
    # uniform over 0..999 (n_events a multiple of 1000): the ceil-rank
    # value for percent p is the smallest v with (v+1)·n/1000 >= ceil(p·n/100)
    per = n_events // n_distinct
    for p in (50, 90, 99):
        rank = (p * n_events + 99) // 100
        expect = float((rank + per - 1) // per - 1)
        assert q[0][f"p{p}"] == expect, (p, q[0][f"p{p}"], expect)

    # --- embedding profile with injected corruption ----------------------
    from petasearch_spark.operators.similarity import profile_vectors

    n_null, n_bad, n_nan = 137, 91, 53
    clean = emb.filter(F.col("vec_id") < n_vecs).select(
        F.lit(0).alias("label"), F.col("v").alias("embedding")
    )
    nulls = spark.range(n_null).select(F.lit(1).alias("label"), F.lit(None).cast("array<double>").alias("embedding"))
    bad = spark.range(n_bad).select(F.lit(1).alias("label"), F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"))
    nans = spark.range(n_nan).select(
        F.lit(1).alias("label"),
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), lambda d: F.lit(float("nan"))).alias("embedding"),
    )
    t0 = time.time()
    prof = {r["label"]: r for r in profile_vectors(clean.unionByName(nulls).unionByName(bad).unionByName(nans)).collect()}
    out["profile_s"] = round(time.time() - t0, 1)
    assert prof[0]["n_vecs"] == n_vecs and prof[0]["n_null"] == 0
    r1 = prof[1]
    assert (r1["n_vecs"], r1["n_null"], r1["n_bad_dim"], r1["n_nonfinite"]) == (
        n_null + n_bad + n_nan, n_null, n_bad, n_nan,
    )

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
