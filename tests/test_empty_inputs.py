"""Degenerate-input sweep: every registered query must execute (not
necessarily return rows) against ZERO-ROW mirrors of all tables.

Empty inputs are not an edge case at deployment scale — a partition
filter that matches nothing, a fresh ingest day, a source with no
documents yet — and a query that crashes the DRIVER on them (0-d
centroid matrices, None scalars from min/max collects, reshape of an
empty training sample) takes the whole batch down. The guards this
sweep pins: nearest_centroid_udf with no centroids maps to NULL,
PQ/IVF-PQ return typed empty frames when the codebook cannot train,
bm25's avgdl and the Z-order bounds fall back to constructible
constants.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from petasearch_spark.registry import REGISTRY

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    tmp = tempfile.mkdtemp(prefix="empty_sf_")
    for name in TABLES:
        p = os.path.join(SRC, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).limit(0).write.mode("overwrite").parquet(
                os.path.join(tmp, f"{name}.parquet")
            )
    return tmp


@pytest.mark.slow  # ~150 s: every registered query against empty tables
def test_every_registered_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, (fn, _) in REGISTRY.items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:140]}")
    assert not failures, "\n".join(failures)
