"""Driver-gate rehearsal: run every registry query on Spark AND its DuckDB
oracle on the same parquet, compare row counts, column names and values
EXACTLY (the driver's t2 check is an order-insensitive value hash — exact
equality here predicts a hash match there)."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest
# round 11: whole-module slow tier — see pyproject [tool.pytest.ini_options]
pytestmark = pytest.mark.slow


from petasearch_spark.registry import REGISTRY, UNGATED
from petasearch_spark.sources.tables import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
SF_GATE = "/root/testdata/sf0.01"

ORACLE_CASES = [(name, fn, sql) for name, (fn, sql) in REGISTRY.items() if sql is not None]

#: The driver's correctness gate runs only the 50 GATED entries at sf0.01;
#: the UNGATED entries would otherwise only ever be value-checked at
#: sf0.001 (round-3 VERDICT item 7). Rehearse them at the gate SF too —
#: unless PARITY_SF_DIR explicitly redirects the whole run.
GATE_SF_CASES = (
    []
    if "PARITY_SF_DIR" in os.environ
    else [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if n in UNGATED and sql is not None]
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(v):
    if isinstance(v, float):
        # exact comparison; NaN-safe
        return ("f", math.nan if math.isnan(v) else v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.strftime("%Y-%m-%d %H:%M:%S"))
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v)) if v is not None else ("null",)


def _assert_parity(spark, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = sorted(
        tuple(normalize(row[c]) for c in spark_cols) for row in sdf.collect()
    )

    con = duck_con(sf_dir)
    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows_raw = res.fetchall()
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = [duck_cols_raw[i] for i in order]
    duck_rows = sorted(tuple(normalize(r[i]) for i in order) for r in duck_rows_raw)

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)} rows"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_query_matches_oracle(spark, name, fn, sql):
    _assert_parity(spark, name, fn, sql, SF_DIR)


@pytest.mark.parametrize(
    "name,fn,sql", GATE_SF_CASES, ids=[f"{c[0]}@sf0.01" for c in GATE_SF_CASES]
)
def test_ungated_query_matches_oracle_at_gate_sf(spark, name, fn, sql):
    _assert_parity(spark, name, fn, sql, SF_GATE)


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_output_types_are_hashable(name, fn, sql):
    """DuckDB returns HUGEINT (arrow decimal128) for bare SUM(BIGINT); the
    driver's value hash serializes that differently from Spark's BIGINT even
    when values agree (round-1 failure mode). Every oracle projection must
    come out as a <=64-bit type."""
    con = duck_con(SF_DIR)
    schema = con.execute(sql).fetch_arrow_table().schema
    bad = [f"{f.name}:{f.type}" for f in schema if "decimal" in str(f.type)]
    assert not bad, f"{name}: oracle output has 128-bit columns {bad} — add CAST(... AS BIGINT/DOUBLE)"


def test_rows_only_queries_run(spark):
    for name, (fn, sql) in REGISTRY.items():
        if sql is None:
            df = fn(spark, SF_DIR)
            assert df.count() >= 0, name
            assert df.columns, name
