"""Constructed edge cases for the composed as-of and range joins
(operators/events.py): the synthetic corpus has microsecond timestamps,
so equal-ts ties and bin-boundary hits never occur there — pin them here
against DuckDB on hand-built rows."""

from __future__ import annotations

import datetime

import duckdb

from petasearch_spark.operators.events import (
    PROXIMITY_US,
    events_asof_join,
    events_proximity_pairs,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(microseconds=us), uid, et, 1.0, "{}")
         for i, (us, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _duck(sql, sf_dir):
    con = duckdb.connect()
    # Spark writes a directory of part files; DuckDB needs the glob
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'")
    return con.execute(sql).fetchall()


def test_asof_equal_ts_click_is_visible_and_ties_break_by_max_id(spark, tmp_path):
    H = 3_600_000_000
    rows = [
        (0 * H, 1, "click"),      # id 0
        (2 * H, 1, "click"),      # id 1: same ts as the purchase
        (2 * H, 1, "click"),      # id 2: same (user, ts) -> dedup keeps max id
        (2 * H, 1, "purchase"),   # id 3: must see click id 2 (gap 0)
        (5 * H, 1, "purchase"),   # id 4: still click id 2
        (1 * H, 2, "purchase"),   # id 5: user 2 has no clicks -> nulls
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in events_asof_join(spark, sf).collect()]
    from petasearch_spark.operators.events import EVENTS_ASOF_SQL
    want = [tuple(r) for r in _duck(EVENTS_ASOF_SQL, sf)]
    assert got == want
    by_pid = {r[0]: r for r in got}
    assert by_pid[3][3] == 2 and by_pid[3][5] == 0        # equal-ts click, max id, gap 0
    assert by_pid[4][3] == 2                               # carried forward
    assert by_pid[5][3] is None and by_pid[5][5] is None   # no prior click


def test_proximity_pairs_hit_bin_boundaries_exactly(spark, tmp_path):
    W = PROXIMITY_US
    rows = [
        (0, 1, "click"),           # id 0
        (W, 1, "click"),           # id 1: exactly W after id 0 -> IN (inclusive)
        (W + 1, 1, "click"),       # id 2: W+1 after id 0 -> OUT, 1 after id 1 -> in
        (3 * W, 1, "click"),       # id 3: far -> alone
        (3 * W, 1, "click"),       # id 4: equal ts as id 3 -> pair by id order
        (0, 2, "click"),           # id 5: other user, never pairs with user 1
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = [tuple(r) for r in events_proximity_pairs(spark, sf).collect()]
    from petasearch_spark.operators.events import EVENTS_PROXIMITY_SQL
    want = [tuple(r) for r in _duck(EVENTS_PROXIMITY_SQL, sf)]
    assert got == want
    pairs = {(a, b): g for (_, a, b, g) in got}
    assert pairs[(0, 1)] == W          # inclusive boundary
    assert (0, 2) not in pairs         # just past the window
    assert pairs[(1, 2)] == 1
    assert pairs[(3, 4)] == 0          # equal-ts tie ordered by id
    assert all(a != 5 and b != 5 for (a, b) in pairs)
