"""Z-order layout: Morton-interleave correctness against a pure-Python
reference, and the pruning payoff — per-file (user × time) bounding boxes
under a Z-ordered write must cover far less area than a time-sorted
layout's, which is the property that makes min/max file stats prune scans
filtered on either dimension."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from petasearch_spark.operators import layout
from petasearch_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _morton_py(a: int, b: int, bits: int = layout.QBITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (123, 231), (7, 200)]
    df = spark.createDataFrame(rows, ["a", "b"]).select(
        "a", "b", layout.zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton_py(r["a"], r["b"]), (r["a"], r["b"])


def test_zvalue_is_monotone_in_each_dim_locally(spark):
    # interleaving preserves order along each axis when the other is fixed
    df = spark.createDataFrame([(a, 7) for a in range(64)], ["a", "b"]).select(
        layout.zvalue(F.col("a"), F.col("b")).alias("z")
    )
    zs = [r["z"] for r in df.collect()]
    assert zs == sorted(zs)


@pytest.fixture()
def _events(spark):
    return load_table(spark, "events", SF)


def _file_boxes(df, n_parts: int, order_col: str):
    """Per-range-partition (user, hour) bounding boxes — a stand-in for
    parquet file min/max stats under that layout."""
    return (
        layout.with_zvalue(df)
        .repartitionByRange(n_parts, order_col)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("ubits").alias("ulo"),
            F.max("ubits").alias("uhi"),
            F.min("hbits").alias("hlo"),
            F.max("hbits").alias("hhi"),
        )
        .collect()
    )


def test_zorder_prunes_user_filters_where_time_sort_cannot(_events):
    """The pruning payoff: a point filter on user_id touches every file of
    a time-sorted layout (each file spans all users) but only the files
    whose z-box contains that user's quantized coordinate."""
    n = 32
    z_boxes = _file_boxes(_events, n, "zval")
    t_boxes = _file_boxes(_events, n, "hbits")
    probes = [0, 63, 127, 200, 255]  # quantized user coords across the range

    def touched(boxes, u):
        return sum(1 for b in boxes if b["ulo"] <= u <= b["uhi"])

    z_frac = sum(touched(z_boxes, u) for u in probes) / (len(probes) * len(z_boxes))
    t_frac = sum(touched(t_boxes, u) for u in probes) / (len(probes) * len(t_boxes))
    assert t_frac > 0.9, t_frac  # time sort: essentially no user pruning
    assert z_frac < 0.5 * t_frac, (z_frac, t_frac)
    # and the z layout still bounds time: every z-file's hour span is a
    # strict subset of the full range for most files
    full_h = max(b["hhi"] for b in z_boxes) - min(b["hlo"] for b in z_boxes)
    narrow = sum(1 for b in z_boxes if (b["hhi"] - b["hlo"]) <= full_h / 2)
    assert narrow >= len(z_boxes) // 2, (narrow, len(z_boxes))


def test_write_zordered_roundtrip(tmp_path, spark, _events):
    path = str(tmp_path / "events_z")
    layout.write_zordered(_events, path, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == _events.count()
    # layout keys are persisted so pruning scans can filter on them
    assert {"zval", "ubits", "hbits"} <= set(back.columns)
