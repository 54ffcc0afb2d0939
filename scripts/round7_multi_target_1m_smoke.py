"""Round-7 scale smoke: MULTI-TARGET search at 1M sequences (round-6
VERDICT item 5 — the reference's actual deployment shape is one query
set against MANY target DBs, petasearch.sh:42-65, and
search_multi_target + the round-6 global max_seqs had never run at 1M).

Corpus: the round-6 generator verbatim (scripts/round6_search_1m_smoke
.py — 200-residue pseudo-random sequences, planted LONGER homolog at
seq_id+1, hot poly-L k-mer on 20% of targets), SPLIT INTO ``n_dbs``
TARGET DBS by ``seq_id % n_dbs``. The split is adversarial on purpose:

* a query (seq_id % q_stride == 0) and its planted homolog (seq_id+1)
  land in DIFFERENT target DBs, so recovering both is only possible if
  the union semantics are right;
* every DB inherits ~200k/n_dbs hot poly-L targets, so J2 must collapse
  the hot k-mer to ONE representative row PER DB INDEX (asserted);
* ``max_seqs=2`` is GLOBAL: each query's two best hits anywhere must be
  exactly its self-hit and its homolog — a per-DB cap (the rejected
  design) would pass junk from sparse DBs instead.

Also asserts the query-k-mer build is shared: every per-DB branch of
the union plan reads the ONE persisted query-k-mer table
(InMemoryRelation count >= n_dbs in the optimized plan).

    python scripts/round7_multi_target_1m_smoke.py [n_seqs] [q_stride] [n_dbs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petasearch_spark.functions.kmer import encode_kmer_expr
from petasearch_spark.operators.kmer_index import build_kmer_index
from petasearch_spark.plans.search import search_multi_target
from petasearch_spark.session import get_spark
from scripts.round6_search_1m_smoke import synth


def main() -> None:
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    q_stride = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n_dbs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("round7_multi_target_1m_smoke")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, object] = {
        "n_seqs": n_seqs, "q_stride": q_stride, "n_dbs": n_dbs,
    }

    t0 = time.time()
    seqs = synth(spark, n_seqs, q_stride).persist()
    out["total_residues"] = int(seqs.agg(F.sum(F.length("sequence"))).collect()[0][0])
    out["gen_s"] = round(time.time() - t0, 1)

    # the reference's targetlist shape: n_dbs independent target DBs
    dbs = [seqs.filter(F.col("seq_id") % n_dbs == i).persist() for i in range(n_dbs)]
    queries = seqs.filter(F.col("seq_id") % q_stride == 0).persist()
    nq = queries.count()
    out["n_queries"] = nq

    # per-DB index: J2 collapses the hot k-mer to ONE row in EVERY DB
    t0 = time.time()
    indexes = [build_kmer_index(db).persist() for db in dbs]
    out["index_kmers_per_db"] = [ix.count() for ix in indexes]
    out["index_build_s"] = round(time.time() - t0, 1)
    hot = [
        ix.filter(F.col("kmer") == encode_kmer_expr(F.lit("L" * 9))).count()
        for ix in indexes
    ]
    out["hot_kmer_rows_per_db"] = hot
    assert hot == [1] * n_dbs, f"J2 broken in some DB index: {hot}"

    # GLOBAL max_seqs=2: the two best hits anywhere must be self + homolog.
    # search_multi_target builds per-DB indexes itself; the persisted
    # per-DB indexes above exist for the J2 assertion
    t0 = time.time()
    res = search_multi_target(queries, dbs, max_seqs=2)
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    n_mem = plan.count("InMemoryRelation")
    out["inmemory_branches"] = n_mem
    assert n_mem >= n_dbs, (
        f"query-k-mer reuse broken: {n_mem} InMemoryRelation branches < {n_dbs}"
    )
    rows = res.select("query_id", "target_id").collect()
    out["search_s"] = round(time.time() - t0, 1)
    out["result_rows"] = len(rows)

    hits: dict[int, set] = {}
    for r in rows:
        hits.setdefault(r["query_id"], set()).add(r["target_id"])
    assert all(len(ts) <= 2 for ts in hits.values()), "global max_seqs=2 violated"
    self_hits = sum(1 for q, ts in hits.items() if q in ts)
    homolog_hits = sum(1 for q, ts in hits.items() if q + 1 in ts)
    out["self_hits"], out["homolog_hits"] = self_hits, homolog_hits
    assert self_hits == nq, f"self-hit missing under global cap: {self_hits}/{nq}"
    assert homolog_hits == nq, (
        f"cross-DB homolog missed under global cap: {homolog_hits}/{nq}"
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
