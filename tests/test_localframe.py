"""literal_df must be a drop-in for spark.createDataFrame(rows, schema)
on the bounded scalar/array literal frames the operators build — same
rows, same schema — while never creating a Python-RDD-backed plan
(the round-10 finding: a 1-row createDataFrame frame costs ~5 s per
coalesce(1).write through the Python worker pool; literal_df is a pure
JVM plan)."""

from __future__ import annotations

import pytest

from petasearch_spark.functions.localframe import literal_df


CASES = [
    # (rows, schema)
    ([(1, "a"), (2, "b")], "id int, name string"),
    ([(1, None), (None, "x")], "id int, name string"),
    ([(3.5, 7)], "v double, n long"),
    ([], "a long, b string"),
    ([(True, b"\x00\x01")], "f boolean, payload binary"),
    ([(42, "tab\tnl\nq'uote\""),], "k int, s string"),
    ([(0, [1.0, 2.5, None])], "cent_id long, cv array<double>"),
    ([(1, [])], "cent_id long, cv array<double>"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_matches_create_dataframe(spark, rows, schema):
    got = literal_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, want.collect()), key=repr
    )


def test_no_python_stage_in_plan(spark):
    df = literal_df(spark, [(1, "x")], "a int, b string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan


def test_out_of_scope_inputs_delegate_to_create_dataframe(spark):
    """Vector cells and row counts past MAX_LITERAL_ROWS must NOT become
    giant Catalyst literal trees (k115 round-10 regression): they fall
    back to createDataFrame, which shows as a Python-RDD scan."""
    from petasearch_spark.functions.localframe import MAX_LITERAL_ROWS

    vec = literal_df(spark, [(0, [1.0, 2.0])], "cent_id long, cv array<double>")
    assert "ExistingRDD" in vec._jdf.queryExecution().executedPlan().toString()

    big_rows = [(i, f"t{i}") for i in range(MAX_LITERAL_ROWS + 1)]
    big = literal_df(spark, big_rows, "id int, s string")
    assert "ExistingRDD" in big._jdf.queryExecution().executedPlan().toString()
    assert big.count() == MAX_LITERAL_ROWS + 1


def test_typed_null_columns_on_empty(spark):
    df = literal_df(spark, [], "a long, v array<double>")
    assert df.count() == 0
    assert [f.simpleString() for f in df.schema.fields] == [
        "a:bigint",
        "v:array<double>",
    ]
