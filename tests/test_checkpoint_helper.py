"""cut_lineage — the checkpoint-vs-localCheckpoint decision as config
(round-6 VERDICT item 3: the durability decision lived in per-site
comments; on a real cluster an executor loss mid-query killed the
iterative plans that relied on localCheckpoint blocks).

Covers: (a) the default path still truncates lineage via localCheckpoint
(no checkpoint dir configured — the local[N] test/bench environment);
(b) with SPARK_GRAFT_CHECKPOINT_DIR set, the helper routes to RELIABLE
df.checkpoint() — asserted by the checkpoint files actually landing in
the configured dir — and the three iterative/barrier consumers
(dedup_clusters' label propagation, gopher_quality's verdict barrier,
bpe_encode_corpus's vocab-release barrier) produce IDENTICAL rows.
The durable run executes in a subprocess: setCheckpointDir is sticky on
a SparkContext, and the suite's shared session must stay on the local
path."""

from __future__ import annotations

import json
import os

import pytest
import subprocess
import sys

from pyspark.sql import functions as F

from petasearch_spark.registry import REGISTRY
from petasearch_spark.session import cut_lineage

SF_DIR = "/root/testdata/sf0.001"
OPS = ["dedup_clusters", "gopher_quality", "bpe_encode_corpus"]

_SUBPROC = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from petasearch_spark import get_spark
from petasearch_spark.registry import REGISTRY

spark = get_spark("ckpt-durable", shuffle_partitions=8)
out = {}
for op in %(ops)r:
    rows = REGISTRY[op][0](spark, %(sf)r).collect()
    out[op] = sorted(sorted([str(k), str(v)] for k, v in r.asDict().items()) for r in rows)
import os
ck = spark.sparkContext.getCheckpointDir()
n_ck = sum(len(fs) for _, _, fs in os.walk(%(ckdir)r))
print("RESULT " + json.dumps({"rows": out, "ckdir": ck, "n_ck_files": n_ck}))
"""


def _norm(rows):
    # lists, not tuples: the subprocess result round-trips through JSON
    return sorted(sorted([str(k), str(v)] for k, v in r.asDict().items()) for r in rows)


def test_local_fallback_cuts_lineage(spark):
    assert spark.sparkContext.getCheckpointDir() is None, (
        "suite session must stay on the localCheckpoint path"
    )
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    cut = cut_lineage(df)
    # a checkpointed frame plans as a flat scan — no Range in the plan
    assert "Range" not in cut._jdf.queryExecution().optimizedPlan().toString()
    assert cut.count() == 100
    assert spark.sparkContext.getCheckpointDir() is None


@pytest.mark.slow  # ~70 s: full dedup_clusters twice (local vs durable checkpoint)
def test_durable_checkpoint_identical_results(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    baseline = {op: _norm(REGISTRY[op][0](spark, SF_DIR).collect()) for op in OPS}
    env = dict(os.environ, SPARK_GRAFT_CHECKPOINT_DIR=ckdir)
    proc = subprocess.run(
        [sys.executable, "-c", _SUBPROC % {"ops": OPS, "sf": SF_DIR, "ckdir": ckdir}],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT "))
    got = json.loads(line[len("RESULT "):])
    # the durable dir was adopted and reliable checkpoint() actually wrote there
    assert got["ckdir"] and ckdir in got["ckdir"]
    assert got["n_ck_files"] > 0, "no checkpoint blocks written to the durable dir"
    for op in OPS:
        assert got["rows"][op] == baseline[op], f"{op}: durable path diverged"
