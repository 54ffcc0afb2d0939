"""General relational query surface over the driver's TPC-H-ish tables.

The reference engine has exactly one relational shape (SURVEY intro): scan ->
flatMap -> sort/dedup -> merge join -> group/HAVING -> sort -> union. These
queries exercise the same operator classes (plus windows/set-ops the driver's
north star asks for) as first-class DataFrame plans with DuckDB oracles.

Every computed column is aliased identically in the DataFrame code and the
oracle SQL; money aggregates go through DECIMAL (see operators/portable.py).

Scale notes (100 TB): every query here is a scan -> (broadcast|shuffle)
join -> partial-agg shape. Small dims (region/nation/customer/supplier/part)
are broadcast; only lineitem/orders/events shuffle, on their natural keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from petasearch_spark.operators.portable import decimal_sum
from petasearch_spark.sources.tables import load_table


def _finite(col: F.Column) -> F.Column:
    """THE non-finite-measure rule (events._finite_value) applied to the
    relational fact columns: a NaN/±Inf measure is excluded (as NULL)
    from every money sum — Spark's decimal cast silently NULLs it while
    DuckDB's CAST aborts the whole oracle (round-6 fuzz); both sides
    mask explicitly. Counts still include the rows."""
    return F.when(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), F.lit(None)).otherwise(col)


_LINEITEM_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_FIN_SQL = "CASE WHEN isnan({c}) OR isinf({c}) THEN NULL ELSE {c} END"
#: DuckDB twin of :func:`_mask_lineitem` — prepend as a WITH clause and
#: read FROM lineitem_fin
LINEITEM_FIN_CTE = (
    "lineitem_fin AS (SELECT * REPLACE ("
    + ", ".join(f"{_FIN_SQL.format(c=c)} AS {c}" for c in _LINEITEM_MEASURES)
    + ") FROM lineitem)"
)


def _mask_lineitem(l: DataFrame) -> DataFrame:
    for c in _LINEITEM_MEASURES:
        l = l.withColumn(c, _finite(F.col(c)))
    return l


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + groupBy agg (map-side partial)."""
    l = _mask_lineitem(
        load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
    )
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    charge = disc * (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum(F.col("l_quantity")).alias("sum_qty"),
            decimal_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.round(F.sum(disc), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(8,4)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
WITH {LINEITEM_FIN_CTE}
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem_fin
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
    customer is broadcast; orders⋈lineitem shuffles on the order key."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = _mask_lineitem(
        load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    )
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(disc), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
WITH {LINEITEM_FIN_CTE}
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
FROM lineitem_fin JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / left-semi join + agg (TPC-H Q4 shape)."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, "lineitem", sf_dir)
    late = o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count")).orderBy("o_orderpriority")


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, dims broadcast, agg by nation."""
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _mask_lineitem(load_table(spark, "lineitem", sf_dir))
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(disc), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
WITH {LINEITEM_FIN_CTE}
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
FROM lineitem_fin
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def parts_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS / left-anti join + agg."""
    p = load_table(spark, "part", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    unsold = p.join(l, p.p_partkey == l.l_partkey, "left_anti")
    return unsold.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_unsold")).orderBy("p_brand")


PARTS_WITHOUT_LINEITEMS_SQL = """
SELECT p_brand, COUNT(*) AS n_unsold
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY p_brand
"""


def top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank over an aggregated join (dense window coverage)."""
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    l = _mask_lineitem(load_table(spark, "lineitem", sf_dir))
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    rev = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_suppkey", "s_name")
        .agg(F.round(F.sum(disc), 4).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), "s_suppkey")
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "s_suppkey", "s_name", "revenue", "rk")
        .orderBy("n_name", "rk")
    )


TOP_SUPPLIERS_SQL = f"""
WITH {LINEITEM_FIN_CTE}
, rev AS (
    SELECT n_name, s_suppkey, s_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
    FROM lineitem_fin
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, s_suppkey, s_name
)
SELECT n_name, s_suppkey, s_name, revenue, rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS rk FROM rev)
WHERE rk <= 3
ORDER BY n_name, rk
"""


def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: INTERSECT of 1996 and 1997 purchaser key sets."""
    o = load_table(spark, "orders", sf_dir)
    y96 = o.filter((F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter((F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))).select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97).orderBy("custkey")


REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY custkey
"""


def customers_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: EXCEPT (customer keys minus purchaser keys).
    `subtract` is set EXCEPT like the oracle — the previous
    exceptAll().distinct() was MULTISET difference then dedup, which
    keeps a key that appears twice in customer but only once in orders
    (a double-loaded customer row would be reported as never-ordered
    despite its order — round-5 audit)."""
    c = load_table(spark, "customer", sf_dir).select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, "orders", sf_dir).select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o).orderBy("custkey")


CUSTOMERS_NEVER_ORDERED_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
ORDER BY custkey
"""


def running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum window per customer (streaming-style cumulative agg).

    Dateless (NULL o_orderdate) orders are excluded on both sides: they
    have no position in a by-date running sequence, and unfiltered they
    sort NULLS FIRST under Spark's window but NULLS LAST under the
    oracle's, shifting every seq/total after them (the window-NULL-
    ordering law; round-6 fuzz). Non-finite totals are masked
    (:func:`_finite`) before the decimal cumulative sum."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate").isNotNull())
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.sum(_finite(F.col("o_totalprice")).cast("decimal(18,4)")).over(w).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "order_seq")


RUNNING_ORDER_TOTALS_SQL = f"""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
       CAST(SUM(CAST({_FIN_SQL.format(c='o_totalprice')} AS DECIMAL(18,4))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
WHERE o_orderdate IS NOT NULL
ORDER BY o_custkey, order_seq
"""


# ---- table profiling (data-quality monitoring) ----------------------------
#: (column, kind) pairs profiled; kind picks which min/max slot applies
PROFILE_COLS = (
    ("l_orderkey", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of the lineitem table — the data-quality snapshot a
    pipeline records per ingest batch (null counts, exact cardinality,
    ranges) to catch schema drift and corrupt loads.

    One scan-wide aggregation computes every fixed-width-buffer metric
    (Catalyst's Expand handles the multi-column distinct counts in the
    same shuffle); the single result row is then unpivoted driver-free by
    exploding an array of per-column structs. Numeric ranges surface as
    double, string/date ranges as text — two typed slots instead of one
    stringly column so no cross-engine number-formatting ambiguity exists
    for the oracle.

    String min/max runs as a SECOND keyless pass: a var-width (string)
    aggregation buffer disqualifies HashAggregate, and mixed into the
    Expand'd distinct pass it demoted the whole 7x-expanded set to a
    SortAggregate with two full 7-key sorts (measured 3x the query).
    Keyless on its own it needs no sort at all, and the two single-row
    results recombine with a free crossJoin."""
    li = load_table(spark, "lineitem", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
        elif kind == "ts":
            aggs.append(F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss").alias(f"{c}__min_str"))
            aggs.append(F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias(f"{c}__max_str"))
    str_aggs = []
    for c, kind in PROFILE_COLS:
        if kind == "str":
            str_aggs.append(F.min(c).alias(f"{c}__min_str"))
            str_aggs.append(F.max(c).alias(f"{c}__max_str"))
    row = li.agg(*aggs).crossJoin(li.agg(*str_aggs))
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__min_num") if kind == "num" else null_d).alias("min_num"),
                (F.col(f"{c}__max_num") if kind == "num" else null_d).alias("max_num"),
                (F.col(f"{c}__min_str") if kind != "num" else null_s).alias("min_str"),
                (F.col(f"{c}__max_str") if kind != "num" else null_s).alias("max_str"),
            )
            for c, kind in PROFILE_COLS
        ]
    )
    return (
        row.select("n_rows", F.explode(entries).alias("e"))
        .select(
            "e.col_name",
            "n_rows",
            "e.n_nulls",
            "e.n_distinct",
            "e.min_num",
            "e.max_num",
            "e.min_str",
            "e.max_str",
        )
        .orderBy("col_name")
    )


def _profile_sql() -> str:
    parts = []
    for c, kind in PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"MIN({c})", f"MAX({c})"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms = f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')"
            xs = f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')"
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str"
            f" FROM lineitem"
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


TABLE_PROFILE_SQL = _profile_sql()


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the bidirectional nation-pair join — lineitem joins
    BOTH its supplier's and its customer's nation, keeping the two
    (supp_nation, cust_nation) orientations of one country pair, revenue
    by shipping year. Exercises the planner on a join graph with two
    roles for the same dimension table (nation joined twice under
    different keys) — both sides broadcast, the fact table never
    shuffles for the dimensions."""
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, "supplier", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l = _mask_lineitem(
        load_table(spark, "lineitem", sf_dir).filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01")) & (F.col("l_shipdate") <= F.lit("1996-12-31"))
        )
    )
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    pair = (
        (F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_20"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(disc), 4).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
WITH {LINEITEM_FIN_CTE}
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
FROM lineitem_fin
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

Q18_MIN_QTY = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose TOTAL line quantity exceeds a
    threshold — a HAVING-driven semi-join where the filter derives from
    an aggregation of the fact table itself. The aggregated key set is
    tiny (threshold makes it selective), so the re-join back to orders /
    customer broadcasts the AGGREGATED side — the fact table is read
    once for the agg and once for the fetch, never shuffled on a
    dimension."""
    l = _mask_lineitem(load_table(spark, "lineitem", sf_dir))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_name")), o.o_custkey == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


Q18_SQL = f"""
WITH {LINEITEM_FIN_CTE}
, big AS (
    SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem_fin GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > {Q18_MIN_QTY}
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""
