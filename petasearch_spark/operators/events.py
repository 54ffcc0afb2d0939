"""Event-stream analytics (batch surface; the Structured Streaming variant
lives in petasearch_spark/streaming/). Exercises time bucketing, JSON
extraction, and sessionization — the streaming-adjacent operator classes the
reference lacks entirely (SURVEY §2.10) but a large-scale pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.functions.localframe import literal_df

from petasearch_spark.sources.tables import load_table

SESSION_GAP_SECONDS = 1800


def _finite_value(col: F.Column) -> F.Column:
    """THE non-finite-measure rule, stated once for engine and oracle:
    a NaN/±Inf ``value`` is excluded (as NULL) from every money/measure
    aggregate and sketch. Spark's double→decimal cast happens to send
    non-finite to NULL silently even under ANSI, while DuckDB's CAST
    ERRORS on it — relying on either implicit behavior diverged
    (round-6 fuzz); both sides now mask explicitly. Row counts
    (n_events) still include the rows — the measure is bad, the event
    happened."""
    return F.when(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), F.lit(None)).otherwise(col)


#: DuckDB rendering of :func:`_finite_value` over the events.value column
FINITE_VALUE_SQL = "CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END"


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation by hour × event type. Non-finite
    values are excluded from sum_value (``_finite_value``), counted in
    n_events."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST({FINITE_VALUE_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min idle.
    Window lag + cumulative sum — the batch shape of stateful streaming
    session windows. NULL-timestamp rows are excluded: they cannot be
    placed in any session, and unfiltered they sort NULLS FIRST in
    Spark's lag window but NULLS LAST in the oracle's, silently changing
    n_sessions (round-5 audit)."""
    e = load_table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    with_breaks = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0),
    )
    sessions = with_breaks.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).cast("double").alias("total_value"),
    )
    return sessions.orderBy("user_id")


EVENTS_SESSIONIZE_SQL = f"""
WITH marked AS (
    SELECT user_id, {FINITE_VALUE_SQL} AS fvalue,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > {SESSION_GAP_SECONDS * 1_000_000}
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events WHERE ts IS NOT NULL
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events,
       CAST(SUM(CAST(fvalue AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM marked
GROUP BY user_id
ORDER BY user_id
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `k` out of the JSON props column.

    `k` counts only when it extracts as an INTEGRAL string — try_cast,
    not cast: under Spark 4's default ANSI mode a plain cast ABORTS the
    whole job on the first non-integral k (e.g. ``{"k":3.0}``), and the
    old DuckDB twin's ::BIGINT rounded 3.5 to 4 instead — the oracle's
    regexp-guarded cast now mirrors try_cast's integral-only rule
    exactly (round-5 audit)."""
    e = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
WITH raw AS (
    -- json_valid guard: DuckDB's json_extract ERRORS on a malformed
    -- props row where Spark's get_json_object returns NULL
    -- the trim mirrors Spark's string-to-long cast, which strips ALL
    -- chars <= 0x20 (not just spaces) before parsing
    SELECT event_type,
           CASE WHEN json_valid(props)
                THEN regexp_replace(json_extract_string(props, '$.k'),
                                    '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') END AS ks
    FROM events
), ext AS (
    -- TRY_CAST: the regexp guards integral-ness, not RANGE — a >int64
    -- digit string must go NULL like Spark's try_cast, not abort
    SELECT event_type,
           CASE WHEN regexp_matches(ks, '^[+-]?[0-9]+$')
                THEN TRY_CAST(ks AS BIGINT) END AS k
    FROM raw
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
FROM ext
GROUP BY event_type
ORDER BY event_type
"""


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation in one pass: ROLLUP over (day, event_type)
    gives per-(day,type), per-day, and grand-total rows — one shuffle,
    grouping-id disambiguates levels. (Absent in the reference — SURVEY
    §2.5 notes no grouping sets exist there — but table stakes for an
    analytics engine.)"""
    e = load_table(spark, "events", sf_dir)
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        e.select(day.alias("day"), "event_type", "value")
        .rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
        .orderBy("day", "event_type")
    )


EVENTS_ROLLUP_SQL = f"""
SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST({FINITE_VALUE_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), event_type)
ORDER BY day, event_type
"""


def users_purchase_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users who both purchased and hit an error (§2.7 — the
    reference has only UNION ALL; intersect/except round out the set-op
    surface)."""
    e = load_table(spark, "events", sf_dir)
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b).orderBy("user_id")


USERS_PURCHASE_AND_ERROR_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def clean_purchase_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): (user, day) pairs with a purchase but no error
    that day. Granularity matters: at user level every synthetic user
    eventually errors and the difference is empty at every SF — a
    trivially-passing oracle check; per-day it is non-trivial. `subtract`
    is distinct EXCEPT (EXCEPT ALL would keep days where purchases merely
    outnumber errors)."""
    e = load_table(spark, "events", sf_dir)
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        e.filter(F.col("event_type") == "purchase").select("user_id", day.alias("day"))
        .subtract(e.filter(F.col("event_type") == "error").select("user_id", day.alias("day")))
        .orderBy("user_id", "day")
    )


CLEAN_PURCHASE_DAYS_SQL = """
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d')
FROM events WHERE event_type = 'error'
ORDER BY user_id, day
"""


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN as a composition of built-in ops (the canonical
    "operator Spark lacks" — implemented with zero custom code, SURVEY
    §Spark-first): each purchase is joined to the same user's most recent
    click at or before its timestamp.

    Plan: tag both sides, UNION, one window pass per user ordered by
    (ts, side) carrying the last click forward (`last(..., ignorenulls)`
    over unbounded-preceding rows), filter back to purchases — exactly
    ONE shuffle on user_id, no per-row Python, no range explosion; at
    100 TB this is the merge-scan an ASOF join compiles to anywhere.
    Clicks are pre-deduped to one row per (user, ts) — max event_id —
    so equal-timestamp ties are deterministic in both engines; all
    outputs are integers (unix micros), immune to timestamp
    serialization differences in the value hash. NULL-timestamp rows
    are excluded — an undated click would sort NULLS FIRST into Spark's
    carry-forward window (becoming everyone's "most recent" click)
    while the oracle's ASOF ``>=`` never matches it (round-5 audit).
    NULL-event_id rows are excluded too: a click whose (user, ts) dedup
    yields a NULL click_id is SKIPPED by the ignorenulls carry-forward
    (silently falling back to an OLDER click) while the oracle's ASOF
    matches the row itself — an id-less event cannot be referenced
    (round-6 fuzz). NULL-user CLICKS are excluded on both sides for the
    same class of reason: Spark's window partition groups NULL users
    TOGETHER (a NULL-user purchase would "match" a NULL-user click)
    while SQL's equality join key never matches NULL — ownerless
    purchases stay in the output, matched to nothing (round-6 fuzz)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    clicks = (
        ev.filter((F.col("event_type") == "click") & F.col("user_id").isNotNull())
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id", "ts",
            F.lit(0).alias("is_p"),
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(1).alias("is_p"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(purchases)
    # clicks sort BEFORE purchases at equal ts (is_p ascending), so an
    # equal-timestamp click is visible to the purchase — ts >= click_ts
    # inclusive, matching DuckDB's ASOF >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lc_id = F.last("click_id", ignorenulls=True).over(w)
    lc_us = F.last(
        F.when(F.col("is_p") == 0, F.unix_micros("ts")), ignorenulls=True
    ).over(w)
    return (
        u.withColumn("last_click_id", lc_id)
        .withColumn("last_click_us", lc_us)
        .filter(F.col("is_p") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            "last_click_id",
            "last_click_us",
            (F.unix_micros("ts") - F.col("last_click_us")).alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


EVENTS_ASOF_SQL = """
WITH clicks AS (
    SELECT user_id, ts, MAX(event_id) AS click_id
    FROM events
    WHERE event_type = 'click' AND ts IS NOT NULL AND event_id IS NOT NULL
          AND user_id IS NOT NULL
    GROUP BY user_id, ts
), p AS (
    SELECT event_id AS purchase_id, user_id, ts
    FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL AND event_id IS NOT NULL
)
SELECT p.purchase_id, p.user_id,
       epoch_us(p.ts) AS purchase_us,
       c.click_id AS last_click_id,
       epoch_us(c.ts) AS last_click_us,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""


#: proximity-pair window (6 h in micros) — see events_proximity_pairs
PROXIMITY_US = 6 * 3600 * 1_000_000


def events_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN at scale, by time-binning: ordered pairs of events of
    the same user within PROXIMITY_US of each other.

    A naive theta-join (b.ts - a.ts BETWEEN 0 AND W) degenerates to a
    per-user nested loop; the distributed strategy is the classic
    interval-binning trick: bucket events into W-wide bins, join each
    left event to bins {bin, bin+1} (any right event within W of ts_a
    must land there, since ts_b ∈ [ts_a, ts_a+W]), then apply the exact
    range predicate. The join is a plain EQUI-join on (user_id, bin) —
    shuffle-partitionable, AQE-skew-splittable, output-bounded by true
    pairs, the same shape Spark's own optimizer rewrites range joins to
    on systems that support it. Ordering ties (equal ts) break by
    event_id so each unordered pair is emitted exactly once."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    a = ev.select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                F.expr(f"us div {PROXIMITY_US}"),
                F.expr(f"us div {PROXIMITY_US}") + 1,
            )
        ).alias("bin"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        "user_id",
        F.col("us").alias("b_us"),
        F.expr(f"us div {PROXIMITY_US}").alias("bin"),
    )
    return (
        a.join(b, ["user_id", "bin"])
        .filter(
            (F.col("b_us") - F.col("a_us") >= 0)
            & (F.col("b_us") - F.col("a_us") <= PROXIMITY_US)
            & (
                (F.col("a_us") < F.col("b_us"))
                | ((F.col("a_us") == F.col("b_us")) & (F.col("a_id") < F.col("b_id")))
            )
        )
        .select("user_id", "a_id", "b_id", (F.col("b_us") - F.col("a_us")).alias("gap_us"))
        .orderBy("user_id", "a_id", "b_id")
    )


EVENTS_PROXIMITY_SQL = f"""
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) - epoch_us(a.ts) >= 0
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {PROXIMITY_US}
 AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
ORDER BY a.user_id, a_id, b_id
"""


# --- conversion funnel & cohort retention ---------------------------------

FUNNEL_STEPS = ("signup", "view", "purchase")


def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> purchase: a user
    converts step N only if their earliest step-N event follows their
    earliest qualifying step-(N-1) event. Output: one row per step with
    users reaching it and the conversion rate from the previous step.

    Plan: one corpus pass aggregates each user's earliest ts per step
    (map-side combined pivot agg keyed by user_id), then the step
    ordering is per-row column logic and the final count is a tiny agg —
    no joins, no windows over the corpus.
    """
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.unix_micros("ts"))).alias(f"t_{s}")
            for s in FUNNEL_STEPS
        ]
    )
    # reached_N = earliest step-N ts exists and follows reached_(N-1)'s ts
    reach = firsts.select(
        "user_id",
        F.col(f"t_{FUNNEL_STEPS[0]}").alias("r0"),
        F.when(
            F.col(f"t_{FUNNEL_STEPS[1]}") >= F.col(f"t_{FUNNEL_STEPS[0]}"),
            F.col(f"t_{FUNNEL_STEPS[1]}"),
        ).alias("r1"),
        F.col(f"t_{FUNNEL_STEPS[2]}").alias("t2"),
    ).select(
        "user_id",
        "r0",
        "r1",
        F.when(F.col("r1").isNotNull() & (F.col("t2") >= F.col("r1")), F.col("t2")).alias("r2"),
    )
    counts = reach.agg(
        F.count(F.col("r0")).alias("n0"),
        F.count(F.col("r1")).alias("n1"),
        F.count(F.col("r2")).alias("n2"),
    ).collect()[0]
    ns = [counts["n0"], counts["n1"], counts["n2"]]

    def _rate(a: int, b: int) -> float:
        # half-AWAY-from-zero at 6 decimals via exact trunc/frac on the
        # same double ops as DuckDB's ROUND(a/b, 6) — Python's builtin
        # round is HALF_EVEN and diverges on exact 7th-decimal halves
        # (e.g. a ratio of k/128; round-5 audit)
        y = (a / b) * 1e6
        t = float(int(y))
        return (t + (y - t >= 0.5)) / 1e6

    rows = [
        (i, FUNNEL_STEPS[i], ns[i], _rate(ns[i], ns[i - 1]) if i > 0 and ns[i - 1] else None)
        for i in range(3)
    ]
    return literal_df(
        spark, rows, "step int, event_type string, n_users bigint, conv_rate double"
    ).orderBy("step")


EVENTS_FUNNEL_SQL = f"""
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN epoch_us(ts) END) AS t0,
           MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' THEN epoch_us(ts) END) AS t1,
           MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' THEN epoch_us(ts) END) AS t2
    FROM events
    WHERE event_type IN ('{FUNNEL_STEPS[0]}', '{FUNNEL_STEPS[1]}', '{FUNNEL_STEPS[2]}')
    GROUP BY user_id
), reach AS (
    SELECT user_id, t0 AS r0,
           CASE WHEN t1 >= t0 THEN t1 END AS r1,
           CASE WHEN (CASE WHEN t1 >= t0 THEN t1 END) IS NOT NULL
                 AND t2 >= (CASE WHEN t1 >= t0 THEN t1 END) THEN t2 END AS r2
    FROM firsts
), counts AS (
    SELECT COUNT(r0) AS n0, COUNT(r1) AS n1, COUNT(r2) AS n2 FROM reach
)
SELECT * FROM (
    SELECT 0 AS step, '{FUNNEL_STEPS[0]}' AS event_type, n0 AS n_users, CAST(NULL AS DOUBLE) AS conv_rate FROM counts
    UNION ALL
    SELECT 1, '{FUNNEL_STEPS[1]}', n1, CASE WHEN n0 > 0 THEN ROUND(CAST(n1 AS DOUBLE) / n0, 6) END FROM counts
    UNION ALL
    SELECT 2, '{FUNNEL_STEPS[2]}', n2, CASE WHEN n1 > 0 THEN ROUND(CAST(n2 AS DOUBLE) / n1, 6) END FROM counts
)
ORDER BY step
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event; for each later week offset, how many were active. The classic
    cohort triangle as (cohort_week, week_offset, n_active, retention).

    Plan: first-event week per user (one agg), broadcast back onto the
    user's distinct active weeks (both keyed by user_id — co-partitioned
    join, no row explosion), then a small (cohorts x offsets) agg.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first_wk = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    active = ev.distinct()
    joined = active.join(first_wk, "user_id").select(
        "user_id",
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        ((F.unix_micros("wk") - F.unix_micros("cohort_wk")) / F.lit(7 * 86400 * 1_000_000))
        .cast("long")
        .alias("week_offset"),
    )
    sizes = joined.filter(F.col("week_offset") == 0).groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_RETENTION_SQL = """
WITH ev AS (
    SELECT user_id, date_trunc('week', ts) AS wk FROM events
), first_wk AS (
    SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, wk FROM ev
), joined AS (
    SELECT a.user_id,
           strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST((epoch_us(a.wk) - epoch_us(f.cohort_wk)) / 604800000000 AS BIGINT) AS week_offset
    FROM active a JOIN first_wk f USING (user_id)
), sizes AS (
    SELECT cohort_week, COUNT(*) AS cohort_size FROM joined WHERE week_offset = 0 GROUP BY cohort_week
)
SELECT j.cohort_week, j.week_offset, COUNT(*) AS n_active,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(s.cohort_size), 6) AS retention
FROM joined j JOIN sizes s ON s.cohort_week = j.cohort_week
GROUP BY j.cohort_week, j.week_offset
ORDER BY j.cohort_week, j.week_offset
"""


ANOM_TRAIL_DAYS = 7
ANOM_SPIKE_FACTOR = 2  # spike = today's count more than 2x the trailing mean


def events_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomaly detection per event type: compare each day's
    event count to the trailing {ANOM_TRAIL_DAYS}-day mean and flag days
    above {ANOM_SPIKE_FACTOR}x — the monitoring query a pipeline runs to
    catch ingestion incidents before they poison training data.

    The spike test is pure integer arithmetic
    (``n * trailing_days > factor * trailing_sum``) — no float mean, no
    stddev — so the flags are bit-identical cross-engine. The trailing
    window partitions by event_type (a handful of partitions, each one
    day-count row per day), so the window state is trivially small at
    ANY corpus scale: the only corpus-sized work is the daily pre-agg,
    one shuffle with map-side combine.

    NULL-timestamp rows are excluded: a day-less event has no place in a
    daily series, and unfiltered its NULL day sorts FIRST under Spark's
    trailing window but LAST under the oracle's, silently shifting every
    trailing sum (the window-NULL-ordering law; round-6 fuzz)."""
    e = load_table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    daily = e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOM_TRAIL_DAYS, -1)
    )
    trail_sum = F.sum("n_events").over(w)
    trail_cnt = F.count(F.lit(1)).over(w)
    return (
        daily.select(
            "day",
            "event_type",
            "n_events",
            F.coalesce(trail_sum, F.lit(0)).alias("trail_sum"),
            trail_cnt.alias("trail_days"),
        )
        .withColumn(
            "is_spike",
            (
                (F.col("trail_days") > 0)
                & (F.col("n_events") * F.col("trail_days") > ANOM_SPIKE_FACTOR * F.col("trail_sum"))
            ).cast("int"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_ANOMALY_SQL = f"""
WITH daily AS (
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n_events
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), trailed AS (
    SELECT day, event_type, n_events,
           CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS trail_sum,
           COUNT(*) OVER w AS trail_days
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {ANOM_TRAIL_DAYS} PRECEDING AND 1 PRECEDING)
)
SELECT day, event_type, n_events, trail_sum, trail_days,
       CAST(trail_days > 0 AND n_events * trail_days > {ANOM_SPIKE_FACTOR} * trail_sum AS INT) AS is_spike
FROM trailed
ORDER BY day, event_type
"""


# --- exact per-group discrete quantiles ----------------------------------

#: quantile ranks as integer percents — rank-of-n arithmetic stays exact
QUANTILE_PCTS = (50, 90, 99)


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete p50/p90/p99 of ``value`` per event_type — the
    latency-percentile query every ingestion monitor runs. "Discrete"
    means the result is an actual data value (the ceil(q·n)-th smallest),
    so it cross-engine value-hashes exactly; interpolated percentiles
    would be float-formula-shaped and engine-divergent.

    Scale-right formulation: quantiles are computed from the per-group
    VALUE HISTOGRAM (groupBy (type, value) count — one map-side-combined
    shuffle that collapses 100 TB of rows to |distinct values| rows),
    then a running-count window over the histogram picks the smallest
    value whose cumulative count reaches each rank. The window sorts
    distinct values per group, not raw events — the naive
    row_number-over-raw-rows form (which the INDEPENDENT DuckDB oracle
    uses) would sort entire groups and dies on a hot event_type at scale.
    When value cardinality itself explodes (true continuous doubles),
    the same plan holds after bucketing values, which is what
    approx_percentile's t-digest formalizes — this operator is the exact
    integer-rank anchor for validating that approximation."""
    e = load_table(spark, "events", sf_dir)
    return value_quantiles(e)


def value_quantiles(e: DataFrame) -> DataFrame:
    """Core of :func:`events_value_quantiles` over an
    ``(event_type, value)`` frame (separated for constructed-group
    tests). NULL values are excluded like the sketch sibling — without
    the filter Spark's cumulative window ranks the NULL bucket FIRST
    while the oracle's row_number ranks it LAST, shifting every
    quantile pick (round-5 audit)."""
    e = e.filter(F.col("value").isNotNull())
    hist = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "value",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    aggs = [F.max("n").alias("n_events")]
    for p in QUANTILE_PCTS:
        # rank = ceil(p·n/100) in pure integer arithmetic
        rank = F.expr(f"({p} * n + 99) div 100")
        aggs.append(F.min(F.when(F.col("cum") >= rank, F.col("value"))).alias(f"p{p}"))
    return cum.groupBy("event_type").agg(*aggs).orderBy("event_type")


EVENTS_VALUE_QUANTILES_SQL = f"""
WITH ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events WHERE value IS NOT NULL
)
SELECT event_type, MAX(n) AS n_events,
       {", ".join(f"MAX(CASE WHEN rn = ({p} * n + 99) // 100 THEN value END) AS p{p}" for p in QUANTILE_PCTS)}
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""

#: leading decimal digits kept per sketch bucket: 3 digits -> buckets are
#: exact below 1000 cents ($10) and have relative half-width <= 0.5/100.5
#: (~0.5%) above; state per group is bounded by <= 900 buckets per decimal
#: decade regardless of row count.
SKETCH_LEAD_DIGITS = 3


def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state quantile SKETCH over (event_type, value) — the
    100 TB companion to :func:`events_value_quantiles` (which is exact
    but keeps one histogram row per DISTINCT value; for true continuous
    doubles that is the whole dataset).

    DDSketch-style log-ish buckets (Masson et al., VLDB 2019) realized
    in pure decimal-integer arithmetic so the result is deterministic,
    order/partition-insensitive, and EXACTLY cross-engine hashable (no
    float log anywhere near a bucket boundary): value -> integer cents,
    bucket key = (digit count D of cents, first ``SKETCH_LEAD_DIGITS``
    digits L). Buckets are exact for cents < 10^3; above that the
    bucket covers [L*10^(D-3), (L+1)*10^(D-3)) cents, i.e. relative
    half-width <= 0.5/100.5. The estimate for percentile p is the
    midpoint of the bucket containing the ceil(p*n/100)-th value, so
    |est - exact_quantile| <= half the width of that bucket (asserted
    as a hard bound in tests/test_events_extra.py).

    Scale shape: ONE map-side-combined groupBy whose output is bounded
    by #buckets (<= ~900 per decade per group), never by rows or by
    distinct values; the per-group cumulative window then runs over
    that bounded bucket set. Merging two sketches = adding bucket
    counts, which is what the groupBy combiner already does — the
    operator IS its own merge, with no order sensitivity by
    construction (pinned by a repartition-invariance test)."""
    e = load_table(spark, "events", sf_dir)
    return quantile_sketch(e)


def quantile_sketch(e: DataFrame) -> DataFrame:
    """Core of :func:`events_quantile_sketch` over an
    ``(event_type, value)`` frame (separated for constructed-group
    tests, mirroring :func:`value_quantiles`).

    Negative values bucket on ``(sign, digits(|cents|), lead(|cents|))``
    — the digit grammar runs over the ABSOLUTE cents so a '-' sign never
    counts as a digit, and the signed bucket midpoint keeps the
    cumulative order correct across zero (round-4 ADVICE: the previous
    formulation silently mis-bucketed any negative value; pinned with
    constructed negative groups in tests/test_events_extra.py).

    Non-finite values are excluded like NULLs (:func:`_finite_value`):
    a quantile over a set containing NaN/±Inf is ill-defined, and the
    cents cast diverged cross-engine on them (round-6 fuzz)."""
    e = e.select("event_type", _finite_value(F.col("value")).alias("value")).filter(
        F.col("value").isNotNull()
    )
    # Spark ROUND is HALF_UP away from zero for negatives, matching
    # DuckDB's ROUND — the sign split below happens AFTER rounding so
    # -0.004 -> cents 0 -> the non-negative zero bucket in both engines
    cents = e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    s = F.when(F.col("v") < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(F.col("v"))
    d = F.length(a.cast("string"))
    lead = F.when(
        d <= SKETCH_LEAD_DIGITS, a
    ).otherwise(F.substring(a.cast("string"), 1, SKETCH_LEAD_DIGITS).cast("long"))
    hist = (
        cents.select("event_type", s.alias("s"), d.alias("d"), lead.alias("l"))
        .groupBy("event_type", "s", "d", "l")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bucket midpoint in DOUBLED cents so it stays integer (width may be odd
    # in halves); /200.0 at the end is one correctly-rounded IEEE division of
    # exact integers — identical in both engines. The SIGNED midpoint is
    # strictly monotone in value order (buckets are disjoint intervals), so
    # ordering the cumulative window by rep_x2 itself sorts negatives
    # largest-magnitude-first, then zero/positives ascending.
    width = F.pow(F.lit(10.0), (F.col("d") - SKETCH_LEAD_DIGITS).cast("double")).cast("long")
    rep_x2 = F.col("s") * (
        F.when(F.col("d") <= SKETCH_LEAD_DIGITS, 2 * F.col("l")).otherwise(
            2 * F.col("l") * width + width
        )
    )
    wc = Window.partitionBy("event_type").orderBy("rep_x2")
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        rep_x2.alias("rep_x2"),
        F.col("c"),
    ).select(
        "event_type",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
        "rep_x2",
    )
    aggs = [F.max("n").alias("n_events"), F.count(F.lit(1)).alias("n_buckets")]
    for p in QUANTILE_PCTS:
        rank = F.expr(f"({p} * n + 99) div 100")
        # rep_x2 is monotone in (d, l), so min over qualifying buckets is
        # exactly the first bucket whose cumulative count reaches the rank
        aggs.append(
            (F.min(F.when(F.col("cum") >= rank, F.col("rep_x2"))) / F.lit(200.0)).alias(f"p{p}_est")
        )
    return cum.groupBy("event_type").agg(*aggs).orderBy("event_type")


EVENTS_QUANTILE_SKETCH_SQL = f"""
WITH cents AS (
    SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL AND NOT isnan(value) AND NOT isinf(value)
), bucketed AS (
    SELECT event_type,
           CASE WHEN v < 0 THEN -1 ELSE 1 END AS s,
           LENGTH(CAST(ABS(v) AS VARCHAR)) AS d,
           CASE WHEN LENGTH(CAST(ABS(v) AS VARCHAR)) <= {SKETCH_LEAD_DIGITS} THEN ABS(v)
                ELSE CAST(SUBSTR(CAST(ABS(v) AS VARCHAR), 1, {SKETCH_LEAD_DIGITS}) AS BIGINT) END AS l
    FROM cents
), hist AS (
    SELECT event_type, s, d, l, COUNT(*) AS c FROM bucketed GROUP BY 1, 2, 3, 4
), reps AS (
    SELECT event_type, c,
           s * (CASE WHEN d <= {SKETCH_LEAD_DIGITS} THEN 2 * l
                ELSE 2 * l * CAST(POWER(10, d - {SKETCH_LEAD_DIGITS}) AS BIGINT)
                     + CAST(POWER(10, d - {SKETCH_LEAD_DIGITS}) AS BIGINT) END) AS rep_x2
    FROM hist
), cum AS (
    SELECT event_type,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY rep_x2) AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           rep_x2
    FROM reps
)
SELECT event_type, MAX(n) AS n_events, COUNT(*) AS n_buckets,
       {", ".join(f"MIN(CASE WHEN cum >= ({p} * n + 99) // 100 THEN rep_x2 END) / 200.0 AS p{p}_est" for p in QUANTILE_PCTS)}
FROM cum
GROUP BY event_type
ORDER BY event_type
"""


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SESSION rows via Spark's native ``session_window`` — the
    built-in gap-merge operator (events_sessionize is the window-lag
    formulation that only reports per-user counts; this one materializes
    each session's bounds, which is what funnels and dwell-time analyses
    consume, and in streaming mode the same expression runs with
    watermark-managed state).

    Boundary semantics (pinned on constructed events in
    tests/test_events_extra.py): an event arriving EXACTLY gap after the
    previous one still MERGES — session_window splits only on
    diff > gap, the same strict rule as the lag formulation, so the two
    forms agree everywhere and differ only in output shape. Timestamps
    surface as formatted strings so the cross-engine value hash sees
    identical text. NULL-timestamp rows are excluded EXPLICITLY on both
    sides: Spark's session_window silently drops them while the oracle's
    lag formulation sessionized them (round-6 fuzz) — the sessionize
    rule (round-5) now applies uniformly."""
    e = load_table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    sess = (
        e.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).cast("double").alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    return sess.select(
        "user_id",
        F.date_format("first_ts", fmt).alias("session_start"),
        F.date_format("last_ts", fmt).alias("session_last"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start")


EVENTS_SESSION_WINDOW_SQL = f"""
WITH marked AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
, sessions AS (
    SELECT user_id, event_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_last,
       COUNT(*) AS n_events,
       CAST(SUM(CAST({FINITE_VALUE_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


MAD_K = 3  #: flag |value - median| > K * MAD — the standard robust rule


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier monitoring: median / MAD (median absolute
    deviation) and the count of values beyond {MAD_K}·MAD — the
    mean/stddev-free rule that a fat-tailed `value` column (latencies,
    purchase amounts) needs, since one spike drags a stddev threshold
    but not a MAD one.

    Both medians are DISCRETE (actual data values, ceil-rank n/2) and
    both are computed from HISTOGRAMS — groupBy (type, value) first, so
    the per-type window sorts distinct values, never raw rows (the
    events_value_quantiles scale argument; the second histogram is over
    |value − median|, whose IEEE subtraction is bit-identical across
    engines on identical inputs). The DuckDB oracle recomputes through
    the independent row_number-over-raw-rows formulation."""
    e = load_table(spark, "events", sf_dir)
    return value_mad_outliers(e)


def value_mad_outliers(e: DataFrame) -> DataFrame:
    """Core of :func:`events_value_outliers` over ``(event_type, value)``.
    NULL values excluded (same NULLS FIRST/LAST blind spot as
    value_quantiles — round-5 audit)."""
    e = e.filter(F.col("value").isNotNull())
    h1 = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    cum1 = h1.select(
        "event_type", "value",
        F.sum("c").over(wc).alias("cum"), F.sum("c").over(wn).alias("n"),
    )
    med = cum1.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("value"))).alias("median_value"),
    )
    diffs = (
        h1.join(F.broadcast(med), "event_type")
        .select(
            "event_type", "c",
            F.abs(F.col("value") - F.col("median_value")).alias("ad"),
        )
        .groupBy("event_type", "ad")
        .agg(F.sum("c").alias("c"))
    )
    wc2 = Window.partitionBy("event_type").orderBy("ad")
    cum2 = diffs.select(
        "event_type", "ad", "c",
        F.sum("c").over(wc2).alias("cum"), F.sum("c").over(wn).alias("n"),
    )
    mad = cum2.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("ad"))).alias("mad")
    )
    outl = (
        diffs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(F.sum(F.when(F.col("ad") > MAD_K * F.col("mad"), F.col("c")).otherwise(0)).alias("n_outliers"))
    )
    return (
        med.join(mad, "event_type").join(outl, "event_type")
        .select("event_type", "n_events", "median_value", "mad", "n_outliers")
        .orderBy("event_type")
    )


EVENTS_VALUE_OUTLIERS_SQL = f"""
WITH evts AS (
    SELECT event_type, value FROM events WHERE value IS NOT NULL
)
, ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM evts
)
, med AS (
    SELECT event_type, MAX(n) AS n_events,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS median_value
    FROM ranked GROUP BY event_type
)
, ranked2 AS (
    SELECT e.event_type, abs(e.value - m.median_value) AS ad,
           ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY abs(e.value - m.median_value)) AS rn,
           COUNT(*) OVER (PARTITION BY e.event_type) AS n
    FROM evts e JOIN med m USING (event_type)
)
, mad AS (
    SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad
    FROM ranked2 GROUP BY event_type
)
SELECT m.event_type, m.n_events, m.median_value, d.mad,
       CAST(SUM(CASE WHEN r.ad > {MAD_K} * d.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM ranked2 r JOIN med m USING (event_type) JOIN mad d USING (event_type)
GROUP BY m.event_type, m.n_events, m.median_value, d.mad
ORDER BY m.event_type
"""


#: fixed pivot column list — NEVER inferred: an unpinned pivot runs an
#: extra distinct-scan over the corpus to discover values, and a schema
#: that depends on the data breaks every downstream consumer
PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type crosstab: one row per day, one count column per
    event type plus the day's total value in cents — the long->wide
    PIVOT operator class (reporting tables, feature matrices).

    Spark's ``pivot`` with an EXPLICIT value list compiles to one
    groupBy(day) aggregation with conditional counts — a single shuffle,
    map-side combined, identical plan shape to writing the CASE
    expressions by hand (which is exactly how the DuckDB oracle states
    it). Counts are integers and the value sum is DECIMAL cents, so the
    wide row value-hashes identically cross-engine.

    NULL-timestamp rows are excluded: a day-less event has no pivot row,
    and unfiltered the NULL day survives BOTH engines' groupBys but then
    silently drops out of Spark's counts-to-totals INNER join (NULL join
    keys never match) while the oracle's single GROUP BY keeps it —
    one engine loses the row, the other keeps it (round-6 fuzz).
    Non-finite values are excluded from value_cents (_finite_value)."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    counts = (
        ev.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    totals = ev.select(day, "value").groupBy("day").agg(
        F.sum(F.round(_finite_value(F.col("value")) * 100).cast("decimal(18,0)")).cast("long").alias("value_cents")
    )
    out = counts.join(totals, "day")
    return out.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in PIVOT_TYPES],
        "value_cents",
    ).orderBy("day")


EVENTS_TYPE_PIVOT_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in PIVOT_TYPES)},
       CAST(SUM(CAST(ROUND(({FINITE_VALUE_SQL}) * 100) AS DECIMAL(18,0))) AS BIGINT) AS value_cents
FROM events
WHERE ts IS NOT NULL
GROUP BY day
ORDER BY day
"""


def events_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide->long inverse of :func:`events_type_pivot`: melt the
    daily crosstab back into (day, event_type, n_events) rows via the
    native ``unpivot``/``stack`` operator and keep only non-zero cells.
    Round-tripping pivot -> unpivot is the standard reshaping pair of a
    reporting layer; ``unpivot`` is a zero-shuffle projection (each wide
    row expands locally), so the only shuffle in this whole query is the
    pivot's own aggregation.

    The oracle states the melt as a UNION ALL over the same CASE
    aggregates — value-identical including the zero-cell filter."""
    wide = events_type_pivot(spark, sf_dir)
    long = wide.unpivot(
        ids=["day"],
        values=[f"n_{t}" for t in PIVOT_TYPES],
        variableColumnName="event_type",
        valueColumnName="n_events",
    )
    return (
        long.select(
            "day",
            F.expr("substring(event_type, 3)").alias("event_type"),
            "n_events",
        )
        .filter(F.col("n_events") > 0)
        .orderBy("day", "event_type")
    )


EVENTS_TYPE_UNPIVOT_SQL = f"""
WITH wide AS (
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in PIVOT_TYPES)}
    FROM events WHERE ts IS NOT NULL GROUP BY day
)
SELECT day, event_type, n_events FROM (
    {" UNION ALL ".join(f"SELECT day, '{t}' AS event_type, n_{t} AS n_events FROM wide" for t in PIVOT_TYPES)}
)
WHERE n_events > 0
ORDER BY day, event_type
"""


#: SAX motif parameters: window of 8 consecutive-rank days, 4 segments
#: of 2 days, a 4-letter alphabet, top-25 motifs reported.
SAX_W = 8
SAX_SEG_LEN = 2
SAX_TOP = 25


def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series MOTIF DISCOVERY via SAX (Lin et al. 2003, "A Symbolic
    Representation of Time Series"): per user, the daily value series is
    cut into sliding 8-day windows (rank-based: the user's observed days
    in order, calendar gaps ignored — the documented rule), each window
    is piecewise-aggregated into 4 two-day segments, each segment sum is
    discretized into a 4-letter alphabet by global equal-width
    breakpoints, and the corpus-wide most frequent SAX words are the
    motifs (recurring weekly-scale activity shapes).

    Determinism: day sums and segment sums are exact DECIMAL; the
    breakpoint comparisons multiply through by 4 instead of dividing
    ((ssum-mn)*4 >= k*(mx-mn)), so no float ever exists; ordering is
    (n_windows DESC, word) — a total order.

    Scale shape: two map-side-combined data shuffles (user-day sums,
    then the per-user series collect), one tiny segment-sum min/max agg,
    and the word-count agg. Windows are sliced from the per-user DAY
    ARRAY with HOFs — per-user state is the day count (bounded, e.g.
    365), and the oracle's relational form (a rank-range self-join that
    fans each user out by days x windows before filtering) is never
    executed by the engine.
    """
    ev = load_table(spark, "events", sf_dir)
    # day-less (NULL-ts) events law: a NULL day group would sort FIRST in
    # Spark's array_sort(struct(day,...)) but LAST under the oracle's
    # ORDER BY day (DuckDB NULLS LAST), silently permuting the series for
    # any user with >= SAX_W observed days plus a NULL-ts event — same
    # exclusion every other daily-series op applies (round-7 ADVICE).
    daily = ev.filter(F.col("ts").isNotNull()).groupBy(
        "user_id",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(_finite_value(F.col("value")).cast("decimal(18,4)")).alias("dsum"))
    ser = daily.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "dsum"))), lambda x: x["dsum"]
        ).alias("vals")
    )
    n_seg = SAX_W // SAX_SEG_LEN
    segsums = lambda s: F.transform(  # noqa: E731 — segment sums of the window at 1-based start s
        F.sequence(F.lit(0), F.lit(n_seg - 1)),
        lambda g: F.aggregate(
            F.slice(F.col("vals"), s + g * SAX_SEG_LEN, SAX_SEG_LEN),
            F.lit(0).cast("decimal(28,4)"),
            lambda acc, x: (acc + x).cast("decimal(28,4)"),
        ),
    )
    wins = ser.select(
        "user_id",
        F.explode(
            F.when(
                F.size("vals") >= SAX_W,
                F.transform(
                    F.sequence(F.lit(1), F.size("vals") - SAX_W + 1), lambda s: segsums(s)
                ),
            ).otherwise(F.array().cast("array<array<decimal(28,4)>>"))
        ).alias("segs"),
    )
    mm = wins.select(F.explode("segs").alias("ssum")).agg(
        F.min("ssum").alias("mn"), F.max("ssum").alias("mx")
    )
    span = F.col("mx") - F.col("mn")
    letter = lambda ssum: (  # noqa: E731
        F.when((ssum - F.col("mn")) * 4 >= 3 * span, "d")
        .when((ssum - F.col("mn")) * 4 >= 2 * span, "c")
        .when((ssum - F.col("mn")) * 4 >= span, "b")
        .otherwise("a")
    )
    words = wins.crossJoin(F.broadcast(mm)).select(
        "user_id",
        F.concat_ws("", F.transform("segs", lambda ssum: letter(ssum))).alias("word"),
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_windows"), F.countDistinct("user_id").alias("n_users"))
        .orderBy(F.desc("n_windows"), "word")
        .limit(SAX_TOP)
    )


EVENTS_SAX_MOTIFS_SQL = f"""
WITH daily AS (
    SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           SUM(CAST({FINITE_VALUE_SQL} AS DECIMAL(18,4))) AS dsum
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), rnk AS (
    SELECT user_id, dsum, row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
    FROM daily
), nd AS (
    SELECT user_id, MAX(rn) AS nd FROM rnk GROUP BY user_id
), starts AS (
    SELECT r.user_id, r.rn AS s
    FROM rnk r JOIN nd USING (user_id)
    WHERE r.rn <= nd.nd - {SAX_W} + 1
), memb AS (
    SELECT st.user_id, st.s, (r.rn - st.s) // {SAX_SEG_LEN} AS g, r.dsum
    FROM starts st
    JOIN rnk r ON r.user_id = st.user_id AND r.rn >= st.s AND r.rn < st.s + {SAX_W}
), seg AS (
    SELECT user_id, s, g, SUM(dsum) AS ssum FROM memb GROUP BY 1, 2, 3
), mm AS (
    SELECT MIN(ssum) AS mn, MAX(ssum) AS mx FROM seg
), sym AS (
    SELECT user_id, s, g,
           CASE WHEN (ssum - mn) * 4 >= 3 * (mx - mn) THEN 'd'
                WHEN (ssum - mn) * 4 >= 2 * (mx - mn) THEN 'c'
                WHEN (ssum - mn) * 4 >= (mx - mn) THEN 'b'
                ELSE 'a' END AS letter
    FROM seg CROSS JOIN mm
), words AS (
    SELECT user_id, s, string_agg(letter, '' ORDER BY g) AS word
    FROM sym GROUP BY user_id, s
)
SELECT word, COUNT(*) AS n_windows, COUNT(DISTINCT user_id) AS n_users
FROM words GROUP BY word
ORDER BY n_windows DESC, word
LIMIT {SAX_TOP}
"""
