"""Round-3 analytics additions: anomaly-flag arithmetic on constructed
day series, and the table-profile single-pass plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from petasearch_spark.operators import events, relational

SF = "/root/testdata/sf0.001"


def test_anomaly_spike_arithmetic_on_constructed_days(spark):
    """Seven flat days then a 3x day: only the 3x day is flagged, and the
    first day (no trailing window) never is."""
    import datetime

    rows = []
    counts = [10, 10, 10, 10, 10, 10, 10, 30, 10]
    eid = 0
    for d, n in enumerate(counts):
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 3, 1 + d, 12, 0, 0), 1, "x", 0.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import petasearch_spark.operators.events as E
    from petasearch_spark.sources import tables

    orig = E.load_table
    try:
        E.load_table = lambda _s, _n, _d, **_k: df
        out = {r["day"]: r for r in E.events_anomaly_daily(spark, SF).collect()}
    finally:
        E.load_table = orig
    assert out["2024-03-01"]["is_spike"] == 0  # no trailing window yet
    assert out["2024-03-08"]["is_spike"] == 1  # 30 > 2 * mean(10)
    assert all(
        out[d]["is_spike"] == 0 for d in out if d not in ("2024-03-08",)
    )
    # the spike day's trailing stats are the seven flat days
    assert out["2024-03-08"]["trail_sum"] == 70
    assert out["2024-03-08"]["trail_days"] == 7
    # the day AFTER the spike is not flagged (spike inflates the mean)
    assert out["2024-03-09"]["is_spike"] == 0


def test_table_profile_values(spark):
    out = {r["col_name"]: r for r in relational.table_profile(spark, SF).collect()}
    assert set(out) == {c for c, _ in relational.PROFILE_COLS}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    for c, kind in relational.PROFILE_COLS:
        r = out[c]
        assert r["n_rows"] == n
        assert r["n_nulls"] == li.filter(F.col(c).isNull()).count()
        assert r["n_distinct"] == li.select(c).distinct().count()
        if kind == "num":
            assert r["min_num"] is not None and r["min_num"] <= r["max_num"]
            assert r["min_str"] is None
        else:
            assert r["min_str"] is not None and r["min_str"] <= r["max_str"]
            assert r["min_num"] is None


def test_table_profile_two_pass_hash_agg(spark):
    """Exactly two scans — the fixed-width-buffer pass (counts, distincts,
    numeric/ts ranges, Expand'd multi-distinct) and the keyless string
    min/max pass — never a per-column rescan of lineitem. The split keeps
    the expensive Expand'd aggregation on HashAggregate: a string min/max
    buffer mixed in demoted it to a SortAggregate with two full 7-key
    sorts over the expanded set (measured 3x the query)."""
    plan = relational.table_profile(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 2, plan
    # only KEYLESS SortAggregates allowed (keyless needs no sort — it's the
    # string min/max pass); a keyed one would mean the Expand'd distinct
    # aggregation fell off HashAggregate again
    for m in re.findall(r"SortAggregate\(key=\[[^\]]*\]", plan):
        assert m == "SortAggregate(key=[]", plan


def test_value_quantiles_rank_edges(spark):
    """ceil-rank semantics on constructed groups: n=1 (all quantiles =
    the single value), n=10 (p50 = 5th smallest, p90 = 9th, p99 = 10th),
    duplicated values (quantile must be a data value, dup-safe)."""
    rows = [("a", 7.0)]
    rows += [("b", float(v)) for v in range(1, 11)]          # 1..10
    rows += [("c", 1.0), ("c", 1.0), ("c", 1.0), ("c", 9.0)]  # dups
    e = spark.createDataFrame(rows, ["event_type", "value"])
    from petasearch_spark.operators import events as ev

    out = {r["event_type"]: r for r in ev.value_quantiles(e).collect()}
    assert (out["a"]["p50"], out["a"]["p90"], out["a"]["p99"]) == (7.0, 7.0, 7.0)
    # n=10: ceil(5.0)=5 -> 5.0, ceil(9.0)=9 -> 9.0, ceil(9.9)=10 -> 10.0
    assert (out["b"]["p50"], out["b"]["p90"], out["b"]["p99"]) == (5.0, 9.0, 10.0)
    # n=4 dups: ranks 2, 4, 4 -> values 1.0, 9.0, 9.0
    assert (out["c"]["p50"], out["c"]["p90"], out["c"]["p99"]) == (1.0, 9.0, 9.0)


def test_session_window_merges_at_exact_gap(spark):
    """Pin session_window's boundary: an event EXACTLY gap after the
    previous one MERGES (split is strict diff > gap — the same rule as
    the lag formulation, so the oracle's `>` is the correct mirror);
    one microsecond past the gap splits."""
    import datetime as dt

    from petasearch_spark.operators import events as ev

    base = dt.datetime(2024, 1, 1)
    gap = ev.SESSION_GAP_SECONDS
    rows = [
        (1, 10, base, "click", 1.0, "{}"),
        (2, 10, base + dt.timedelta(seconds=gap), "click", 1.0, "{}"),  # exactly gap
        (3, 20, base, "click", 1.0, "{}"),
        (4, 20, base + dt.timedelta(seconds=gap, microseconds=1), "click", 1.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    sess = (
        e.groupBy("user_id", F.session_window("ts", f"{gap} seconds").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "sw.start")
        .collect()
    )
    per_user = {}
    for r in sess:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert per_user[10] == [2], per_user   # exact gap merges
    assert per_user[20] == [1, 1], per_user  # one microsecond over splits


def test_mad_outliers_robust_to_spike_and_constant_group(spark):
    """A single huge spike must not move the median or the MAD (it IS the
    outlier); a constant group has MAD 0 and flags every non-median
    value."""
    from petasearch_spark.operators.events import MAD_K, value_mad_outliers

    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14]] + [("a", 1e9)]
    rows += [("b", 5.0)] * 4
    rows += [("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 7.0)]
    e = spark.createDataFrame(rows, ["event_type", "value"])
    out = {r["event_type"]: r for r in value_mad_outliers(e).collect()}
    a = out["a"]
    # n=6 -> ceil-rank 3 -> median 12; diffs {2,1,0,1,2,1e9-12} -> MAD 1
    assert (a["median_value"], a["mad"]) == (12.0, 1.0)
    assert a["n_outliers"] == 1  # only the spike exceeds 12 ± 3*1 (10/14 have ad=2)
    assert MAD_K == 3
    b = out["b"]
    assert (b["median_value"], b["mad"], b["n_outliers"]) == (5.0, 0.0, 0)
    c = out["c"]
    # MAD 0: the single 7.0 is beyond 3*0
    assert (c["median_value"], c["mad"], c["n_outliers"]) == (5.0, 0.0, 1)


def test_quantile_sketch_buckets_and_midpoints(spark):
    """Constructed groups pin the bucket arithmetic: values < $10 are
    EXACT (one bucket per cent); values >= $10 report the midpoint of
    their (digit-count, 3-leading-digit) bucket; the rank rule is the
    same ceil(p*n/100) as the exact operator."""
    from petasearch_spark.operators.events import quantile_sketch

    # group a: 10 small values 0.01..0.10 -> all exact cents buckets
    rows = [("a", v / 100.0) for v in range(1, 11)]
    # group b: one value per regime — exact ($3.33), D=4 ($98.76 ->
    # cents 9876, bucket [9870, 9880), midpoint 98.75), D=7
    # ($12345.67 -> cents 1234567, bucket [1230000, 1240000),
    # midpoint 12350.00)
    rows += [("b", 3.33)] * 98 + [("b", 98.76), ("b", 12345.67)]
    e = spark.createDataFrame(rows, ["event_type", "value"])
    out = {r["event_type"]: r for r in quantile_sketch(e).collect()}
    a = out["a"]
    # exact regime: identical to the exact operator's ceil-rank answers
    assert (a["p50_est"], a["p90_est"], a["p99_est"]) == (0.05, 0.09, 0.10)
    assert a["n_buckets"] == 10
    b = out["b"]
    # n=100: rank(p50)=50 -> 3.33 exact; rank(p90)=90 -> still 3.33;
    # rank(p99)=99 -> the 9876-cent value's bucket midpoint 98.75
    assert (b["p50_est"], b["p90_est"], b["p99_est"]) == (3.33, 3.33, 98.75)
    assert b["n_buckets"] == 3
    # and the D=7 bucket midpoint is reachable at p100... p99 of n=100
    # stops at rank 99; verify the big bucket via a tiny group instead
    out2 = {
        r["event_type"]: r
        for r in quantile_sketch(
            spark.createDataFrame([("c", 12345.67)], ["event_type", "value"])
        ).collect()
    }
    assert out2["c"]["p50_est"] == 12350.0


def test_quantile_sketch_error_bound_vs_exact(spark):
    """Hard guarantee on real data: the sketch estimate sits within half
    a bucket width of the EXACT ceil-rank quantile — exact equality
    below $10, relative error <= 0.5/100.5 above."""
    from petasearch_spark.operators.events import events_quantile_sketch, events_value_quantiles

    exact = {r["event_type"]: r for r in events_value_quantiles(spark, SF).collect()}
    est = {r["event_type"]: r for r in events_quantile_sketch(spark, SF).collect()}
    assert set(exact) == set(est) and exact
    checked = 0
    for g in exact:
        for p in (50, 90, 99):
            ev, sv = exact[g][f"p{p}"], est[g][f"p{p}_est"]
            cents = round(ev * 100)
            if cents < 1000:
                assert sv == ev, (g, p, ev, sv)
            else:
                # compare in doubled cents so the half-width bound is exact
                # integer arithmetic (est can sit exactly on the bound when
                # the true quantile is a bucket edge)
                width = 10 ** (len(str(cents)) - 3)
                assert abs(round(sv * 200) - 2 * cents) <= width, (g, p, ev, sv)
            checked += 1
    assert checked >= 15


def test_quantile_sketch_negative_values_match_oracle(spark):
    """Round-4 ADVICE: the old bucket key counted a negative value's '-'
    sign as a digit, silently mis-bucketing — and the fixture could not
    catch it because events.value >= 0. Constructed groups with negatives
    now pin: (1) exact equality vs the DuckDB SQL twin on a mixed-sign
    frame (including near-half rounding inputs), (2) exact-regime
    answers for |cents| < 1000, (3) the signed midpoint for a big
    negative bucket."""
    import random

    import duckdb

    from petasearch_spark.operators.events import EVENTS_QUANTILE_SKETCH_SQL, quantile_sketch

    rng = random.Random(5)
    rows = [("m", round(rng.uniform(-20000, 20000), rng.choice([2, 3, 4]))) for _ in range(500)]
    # deterministic edge pins: sign flips around zero, near-half cents,
    # exact-regime negatives, and one big negative bucket
    rows += [
        ("n", -0.004),  # rounds to cents 0 -> positive zero bucket
        ("n", -0.01),
        ("n", -2.005),
        ("n", -9.99),
        ("n", -98.76),  # cents -9876 -> bucket [-9880,-9870), midpoint -98.75
        ("n", -12345.67),
        ("n", 0.0),
        ("n", 0.01),
    ]
    e = spark.createDataFrame(rows, ["event_type", "value"])
    got = {
        r["event_type"]: r
        for r in quantile_sketch(e).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    res = con.execute(EVENTS_QUANTILE_SKETCH_SQL)
    cols = [d[0] for d in res.description]
    want = {r[0]: dict(zip(cols, r)) for r in res.fetchall()}
    assert set(got) == set(want)
    for g in got:
        for c in cols:
            assert got[g][c] == want[g][c], (g, c, got[g][c], want[g][c])

    # n=8 group: p50 rank = ceil(50*8/100) = 4, walking from the most
    # negative value: -12345.67 (midpoint -12350.0), -98.76 (cents -9876
    # -> midpoint -98.75), -9.99, then -2.005 — whose double sits just
    # ABOVE the half (200.50000000000003 cents), so HALF_UP-away-from-
    # zero lands on exact bucket -201 in all three implementations
    n = got["n"]
    assert n["p50_est"] == -2.01
    one = {
        r["event_type"]: r
        for r in quantile_sketch(
            spark.createDataFrame([("z", -12345.67)], ["event_type", "value"])
        ).collect()
    }
    assert one["z"]["p50_est"] == -12350.0


def test_stream_precount_buckets_match_batch_engine_on_negatives(spark):
    """The streaming precount's numpy rounding must agree with the batch
    engine's ROUND for negatives (floor(v*100+0.5) rounds negative halves
    toward +inf — round-4 ADVICE): compare the (s,d,l) histogram built by
    the real precount kernel against the batch engine's own bucketing on
    a mixed-sign frame."""
    import random

    import pandas as pd

    from petasearch_spark.operators.events import SKETCH_LEAD_DIGITS
    from petasearch_spark.streaming.stateful import quantile_bucket_counts

    rng = random.Random(7)
    vals = [round(rng.uniform(-500, 500), rng.choice([2, 3])) for _ in range(400)]
    vals += [-0.004, -0.005, -2.005, -98.755, 0.0, 0.005]
    # round-5 review finding: v*100 == 0.49999999999999994, and the float
    # ADDITION +0.5 lands on exactly 1.0 — a floor(prod+0.5) kernel would
    # bucket cents 1 where the batch engine's HALF_UP gives 0; the exact
    # trunc/frac comparison must agree with the engine on both signs
    vals += [0.004999999999999999, -0.004999999999999999]
    pdf = pd.DataFrame({"event_type": "x", "value": vals})
    stream_hist = {
        (int(r["s"]), int(r["d"]), int(r["l"])): int(r["w"])
        for _, r in quantile_bucket_counts(pdf).iterrows()
    }

    e = spark.createDataFrame([("x", v) for v in vals], ["event_type", "value"])
    cents = e.select(F.round(F.col("value") * 100, 0).cast("long").alias("v"))
    s = F.when(F.col("v") < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(F.col("v"))
    d = F.length(a.cast("string"))
    lead = F.when(d <= SKETCH_LEAD_DIGITS, a).otherwise(
        F.substring(a.cast("string"), 1, SKETCH_LEAD_DIGITS).cast("long")
    )
    batch_hist = {
        (r["s"], r["d"], r["l"]): r["c"]
        for r in cents.select(s.alias("s"), d.alias("d"), lead.alias("l"))
        .groupBy("s", "d", "l")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert stream_hist == batch_hist


def test_quantile_sketch_partition_invariance(spark):
    """The sketch is its own merge: bucket counts add under the groupBy
    combiner, so ANY partitioning of the input yields byte-identical
    results (the property a mergeable sketch must have at 100 TB)."""
    from petasearch_spark.operators.events import quantile_sketch
    from petasearch_spark.sources.tables import load_table

    e = load_table(spark, "events", SF).select("event_type", "value")
    a = quantile_sketch(e.repartition(3)).collect()
    b = quantile_sketch(e.repartition(13, "value")).collect()
    assert a == b


def test_sax_motifs_constructed_series_and_gap_rule(spark):
    """Engineered daily series with known discretization: global segment
    sums span [0, 30], so thresholds sit at 7.5/15/22.5 -> letters
    a/c/d are forced exactly; a user whose 8 observed days have calendar
    GAPS still forms one window (rank-based rule)."""
    import datetime

    rows = []
    eid = 0

    def add(user, day, value):
        nonlocal eid
        rows.append(
            (eid, datetime.datetime(2024, 3, day, 12, 0, 0), user, "x", value, "{}")
        )
        eid += 1

    for d in range(1, 9):
        add(1, d, 0.0 if d < 8 else 30.0)  # segments 0,0,0,30 -> "aaad"
        add(2, d, 10.0)                     # segments all 20   -> "cccc"
    for i in range(8):
        add(3, 1 + 3 * i, 10.0)             # gapped days, same -> "cccc"
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import petasearch_spark.operators.events as E

    orig = E.load_table
    try:
        E.load_table = lambda _s, _n, _d, **_k: df
        out = [(r["word"], r["n_windows"], r["n_users"]) for r in E.events_sax_motifs(spark, SF).collect()]
    finally:
        E.load_table = orig
    assert out == [("cccc", 2, 2), ("aaad", 1, 1)]


def test_conversion_funnel_rate_rounds_half_away_like_oracle(spark):
    """Round-5 audit: the driver-side conversion rate must round half
    AWAY from zero like DuckDB's ROUND — Python's builtin round is
    HALF_EVEN and on an exact 7th-decimal half (128 step-0 users, 1
    converting: 1/128 = 0.0078125) emits 0.007812 where the oracle says
    0.007813."""
    import datetime

    from petasearch_spark.operators.events import FUNNEL_STEPS

    rows = []
    eid = 0
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    for u in range(128):
        rows.append((eid, t0, u, FUNNEL_STEPS[0], 0.0, "{}"))
        eid += 1
    rows.append((eid, t0 + datetime.timedelta(hours=1), 0, FUNNEL_STEPS[1], 0.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import petasearch_spark.operators.events as E

    orig = E.load_table
    try:
        E.load_table = lambda _s, _n, _d, **_k: df
        out = {r["step"]: r for r in E.events_conversion_funnel(spark, SF).collect()}
    finally:
        E.load_table = orig
    assert out[0]["n_users"] == 128 and out[1]["n_users"] == 1
    assert out[1]["conv_rate"] == 0.007813  # half-away, NOT half-even 0.007812
