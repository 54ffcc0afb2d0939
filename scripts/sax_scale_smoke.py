"""Scale smoke: SAX motif discovery at 5M events (100k users x 50 days).

Plants three user classes with deterministic daily patterns whose SAX
words are forced exactly (flat-low -> "aaaa", flat-high -> "dddd",
alternating 0/30 -> every 2-day segment sums to 30 -> "cccc"), so the
full 5M-event output is THREE rows with arithmetically exact
n_windows/n_users — a large-scale correctness assertion, not just a
timing. Also checks the per-user array plan never materializes the
oracle's days x windows self-join blowup (wall-clock stays linear).

    python scripts/sax_scale_smoke.py [n_users] [n_days]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

import petasearch_spark.operators.events as E
from petasearch_spark.operators.events import SAX_W
from petasearch_spark.session import get_spark


def main() -> None:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("sax_scale_smoke")
    out: dict[str, object] = {"n_events": n_users * n_days}

    ids = spark.range(n_users * n_days).select(
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") / n_users).cast("int").alias("day"),
    )
    cls = F.col("user_id") % 3
    value = (
        F.when(cls == 0, F.lit(0.0))
        .when(cls == 1, F.lit(30.0))
        .otherwise(F.when(F.col("day") % 2 == 0, 0.0).otherwise(30.0))
    )
    ev = ids.select(
        "user_id",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("day")).cast("timestamp").alias("ts"),
        value.alias("value"),
    ).persist()
    ev.count()

    orig = E.load_table
    try:
        E.load_table = lambda _s, _n, _d, **_k: ev
        t0 = time.time()
        rows = [(r["word"], r["n_windows"], r["n_users"]) for r in E.events_sax_motifs(spark, "unused").collect()]
        out["sax_seconds"] = round(time.time() - t0, 2)
    finally:
        E.load_table = orig
        ev.unpersist()

    w = n_days - SAX_W + 1  # windows per user
    # exact count of user_ids < n_users with user_id % 3 == c
    u = [(n_users - c + 2) // 3 for c in range(3)]
    expect = sorted(
        [("aaaa", u[0] * w, u[0]), ("cccc", u[2] * w, u[2]), ("dddd", u[1] * w, u[1])],
        key=lambda r: (-r[1], r[0]),
    )
    assert rows == expect, (rows[:5], expect)
    out["words"] = [r[0] for r in rows]
    out["n_windows_top"] = rows[0][1]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
