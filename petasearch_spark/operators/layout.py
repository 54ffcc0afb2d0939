"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

The reference engine's answer to locality is its sorted single-key k-mer
table (O1, /root/reference/src/sra/createkmertable.cpp:129-133 — sort by
k-mer so the merge join streams). That gives pruning on ONE dimension.
Large-scale lakehouse tables routinely need pruning on TWO independent
dimensions at once (user_id AND time for events): the standard technique is
Z-ordering — quantize both keys to a common bit width, interleave their
bits into a single Morton value, range-partition + sort on it, and every
parquet file ends up covering a small rectangle in (user, time) space, so
min/max file stats prune scans filtered on EITHER dimension.

The range normalization step matters: interleaving RAW bits degenerates to
time-major ordering whenever one dimension spans more bits than the other
(the wide dimension's high bits own every significant z position). Both
dims are min/max-quantized to {QBITS} bits first — the same thing Delta's
OPTIMIZE ZORDER does with its range-partition ids.

Everything here is exact integer arithmetic on both engines (no UDF,
whole-stage codegen on the Spark side; the DuckDB oracle unrolls the same
interleave as a bit expression), so the query sits under the driver's
value-hash gate like any relational query.

100 TB shape: the min/max bounds come from table statistics (free — every
lakehouse table format stores them; here a one-row agg). The z projection
is then stateless per-row; ``write_zordered`` is one range-partition
shuffle — the cost of any global sort — paid once at layout time,
amortized over every subsequent pruned query. tests/test_layout.py
measures the payoff as files-touched under a point filter on the
non-sort dimension: a time-sorted layout touches every file, the
Z-ordered layout a small fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from petasearch_spark.sources.tables import load_table

QBITS = 8  # quantized bits per dimension -> 16-bit Morton value
QMAX = (1 << QBITS) - 1


def zvalue(a: Column, b: Column, bits: int = QBITS) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative
    integer columns: bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Pure bitwise column expressions (stays in codegen)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i + 1)
    return z


def _zvalue_sql(a: str, b: str, bits: int = QBITS) -> str:
    terms = []
    for i in range(bits):
        # full outer parens: SQL's `+` binds tighter than `<<`, so an
        # unparenthesized `x << 1 + y << 2` associates as x << (1+y) << 2
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def with_zvalue(df: DataFrame) -> DataFrame:
    """events frame -> + (ubits, hbits, zval): user_id and hour-of-epoch
    min/max-quantized to QBITS each, plus their Morton interleave.

    The bounds agg is one tiny job here; at deployment they come from
    table-format column stats (no scan)."""
    hour = F.expr("unix_timestamp(ts) div 3600")
    b = df.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min(hour).alias("hlo"),
        F.max(hour).alias("hhi"),
    ).collect()[0]
    # empty frame: min/max come back NULL — zero bounds keep the plan
    # constructible and the output stays empty anyway
    ulo, uhi = b["ulo"] or 0, b["uhi"] or 0
    hlo, hhi = b["hlo"] or 0, b["hhi"] or 0
    uspan = max(1, uhi - ulo)
    hspan = max(1, hhi - hlo)
    ub = F.expr(f"({QMAX} * (user_id - {ulo})) div {uspan}")
    hb = F.expr(f"({QMAX} * ((unix_timestamp(ts) div 3600) - {hlo})) div {hspan}")
    return (
        df.withColumn("ubits", ub)
        .withColumn("hbits", hb)
        .withColumn("zval", zvalue(F.col("ubits"), F.col("hbits")))
    )


def write_zordered(df: DataFrame, path: str, n_files: int = 16) -> None:
    """Rewrite events Z-ordered: range-partition on the Morton value (one
    shuffle), sort within partitions, keep the layout keys so pruning
    scans can filter on them. Each output file covers a contiguous
    z-range = a small (user × time) box, so parquet min/max stats prune
    on either dimension."""
    (
        with_zvalue(df)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


# z-grid cell width: top 4 bits of each quantized dim -> a 16×16 grid of
# bounding boxes, tens-to-hundreds occupied at every driver SF
ZGRID_SHIFT = 8


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout key under the oracle: Morton value per event, bucketed
    into fixed z-grid cells (zval >> {ZGRID_SHIFT}) with each occupied
    cell's row count and (user, hour) bounding box — exactly the min/max
    file stats a pruning scan reads. A fixed grid rather than an
    equal-height ntile keeps the plan one ordinary groupBy shuffle (a
    global ntile window would sort everything into one partition — the
    anti-pattern); the production write (:func:`write_zordered`) gets
    equal-height splits from repartitionByRange's distributed sampler."""
    ev = with_zvalue(load_table(spark, "events", sf_dir, widen_scan=True))
    return (
        ev.withColumn("cell", F.shiftright(F.col("zval"), ZGRID_SHIFT))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ubits").alias("user_lo"),
            F.max("ubits").alias("user_hi"),
            F.min("hbits").alias("hour_lo"),
            F.max("hbits").alias("hour_hi"),
            F.min("zval").alias("z_lo"),
            F.max("zval").alias("z_hi"),
        )
        .orderBy("cell")
    )


_Z_SQL = _zvalue_sql("ubits", "hbits")

EVENTS_ZORDER_SQL = f"""
WITH hours AS (
    SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr
    FROM events
), bounds AS (
    SELECT MIN(user_id) AS ulo, GREATEST(1, MAX(user_id) - MIN(user_id)) AS uspan,
           MIN(hr) AS hlo, GREATEST(1, MAX(hr) - MIN(hr)) AS hspan
    FROM hours
), keyed AS (
    SELECT event_id,
           ({QMAX} * (user_id - ulo)) // uspan AS ubits,
           ({QMAX} * (hr - hlo)) // hspan AS hbits
    FROM hours CROSS JOIN bounds
), z AS (
    SELECT event_id, ubits, hbits, {_Z_SQL} AS zval FROM keyed
)
SELECT zval >> {ZGRID_SHIFT} AS cell, COUNT(*) AS n_rows,
       MIN(ubits) AS user_lo, MAX(ubits) AS user_hi,
       MIN(hbits) AS hour_lo, MAX(hbits) AS hour_hi,
       MIN(zval) AS z_lo, MAX(zval) AS z_hi
FROM z
GROUP BY cell
ORDER BY cell
"""
