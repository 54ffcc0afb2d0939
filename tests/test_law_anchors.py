"""Hand-computed LITERAL anchors for the paired engine+oracle laws
(round-6 VERDICT "What's wrong" item 2): the fuzz-parity fixes edit BOTH
engines toward a shared documented law, which is the right method but
can in principle co-evolve both sides away from ground truth. Each test
here pins one law against a constructed case whose expected output is
written as a LITERAL in this file — computed by hand, independent of
Spark and of DuckDB. If a future symmetric edit drifts a law, the
literal stays put and the test fails.

Laws anchored (memory shorthand in parentheses):
- (h) non-finite measures masked-as-NULL, rows still counted
- (i) indexed-vector admission: NULL/empty/NaN/Inf/abs>=1e15/NULL-component
      all rejected; 1e15 is the exact boundary
- (j) day-less (NULL-ts) events excluded from daily series
- (l) CSV wire: ''->NULL, blank line and NULL event_id -> quarantine,
      "NaN"/"Infinity" parse as clean non-finite doubles
- (r7) NULL component inside a present vector is a NON-FINITE defect in
      embedding_profile (counted, norm excluded)
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from petasearch_spark.operators.events import _finite_value
from petasearch_spark.operators.similarity import finite_vec, profile_vectors
from petasearch_spark.sources.csv_events import read_events_csv

NAN, INF = float("nan"), float("inf")


def test_anchor_finite_value_mask(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, NAN), (3, INF), (4, -INF), (5, None), (6, -3.5)],
        "id long, value double",
    )
    out = {
        r["id"]: r["m"]
        for r in df.select("id", _finite_value(F.col("value")).alias("m")).collect()
    }
    # BY HAND: only ordinary doubles survive; NaN/Inf/-Inf -> NULL; NULL stays NULL
    assert out == {1: 5.0, 2: None, 3: None, 4: None, 5: None, 6: -3.5}
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).alias("s"),
    ).collect()[0]
    # BY HAND: 6 rows counted (the event happened), masked sum = 5.0 - 3.5
    assert agg["n"] == 6
    assert float(agg["s"]) == 1.5


def test_anchor_vector_admission(spark):
    rows = [
        (1, [0.5, 0.5]),            # ordinary            -> ADMIT
        (2, []),                    # no geometry         -> reject
        (3, None),                  # absent              -> reject
        (4, [NAN, 0.0]),            # NaN component       -> reject
        (5, [INF, 0.0]),            # Inf component       -> reject
        (6, [1.0e15, 0.0]),         # AT the bound (>=)   -> reject
        (7, [9.99e14, 0.0]),        # below the bound     -> ADMIT
        (8, [-1.0e15, 0.0]),        # bound is on |x|     -> reject
        (9, [0.5, None]),           # NULL component      -> reject
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    admitted = sorted(
        r["id"] for r in df.filter(finite_vec(F.col("v"))).select("id").collect()
    )
    # BY HAND: exactly the two finite sub-bound vectors
    assert admitted == [1, 7]


def test_anchor_dayless_exclusion(spark):
    df = spark.createDataFrame(
        [
            (1, "2026-01-01 05:00:00", 10.0),
            (2, "2026-01-01 23:59:59", 20.0),
            (3, "2026-01-02 00:00:00", 40.0),
            (4, None, 999.0),  # day-less: excluded from every daily series
        ],
        "id long, ts_s string, value double",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    daily = (
        df.filter(F.col("ts").isNotNull())
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    got = {r["day"]: (r["n"], r["s"]) for r in daily.collect()}
    # BY HAND: two days; the 999.0 never appears anywhere
    assert got == {"2026-01-01": (2, 30.0), "2026-01-02": (1, 40.0)}


def test_anchor_csv_wire(spark, tmp_path):
    lines = [
        "1,2026-01-01 00:00:00,7,purchase,3.5",   # clean
        "2,2026-01-01 01:00:00,7,,1.0",           # ''-type -> NULL event_type
        "3,2026-01-01 02:00:00,7,view,NaN",       # parses CLEAN, value NaN
        "4,2026-01-01 03:00:00,7,view,Infinity",  # parses CLEAN, value +Inf
        "",                                        # blank line -> quarantine
        ",2026-01-01 04:00:00,7,view,1.0",        # NULL event_id -> quarantine
        "5,2026-01-01 05:00:00,7,view,not_a_number",  # bad value -> quarantine
    ]
    p = os.path.join(str(tmp_path), "wire.csv")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    out = read_events_csv(spark, p).collect()
    clean = {r["event_id"]: r for r in out if r["_malformed"] is None}
    quarantined = [r for r in out if r["_malformed"] is not None]
    # BY HAND: 4 clean rows (1,2,3,4), 3 quarantined (blank, id-less, bad value)
    assert sorted(clean) == [1, 2, 3, 4]
    assert len(quarantined) == 3
    # ''->NULL: the empty 4th field of line 2 is NULL, not ''
    assert clean[2]["event_type"] is None
    # "NaN"/"Infinity" are CLEAN non-finite doubles on the wire
    assert math.isnan(clean[3]["value"])
    assert clean[4]["value"] == INF
    assert clean[1]["value"] == 3.5


def test_anchor_null_component_profile(spark):
    dim = 64
    rows = [
        (0, [1.0] + [0.0] * (dim - 1)),       # clean unit vector, norm 1
        (0, [0.5] * (dim - 1) + [None]),      # NULL component -> nonfinite
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = profile_vectors(df).collect()
    assert len(got) == 1
    r = got[0]
    # BY HAND: 2 vectors, 0 null, 0 bad-dim (len is 64 either way),
    # 1 non-finite (the NULL component), and ONLY the clean vector's
    # norm (sqrt(1.0) = 1.0) reaches min/max/sum
    assert (r["n_vecs"], r["n_null"], r["n_bad_dim"], r["n_nonfinite"]) == (2, 0, 0, 1)
    assert (r["min_norm"], r["max_norm"], r["sum_norm"]) == (1.0, 1.0, 1.0)
