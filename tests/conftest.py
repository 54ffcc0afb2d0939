from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petasearch_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("petasearch_spark_tests", shuffle_partitions=8)
    yield s
    # pid-unique managed tables (test_incremental_index, test_skew_pruning)
    # leave directories in the shared /tmp warehouse that no later run
    # will ever DROP by name — clean this process's own leftovers
    import glob
    import shutil

    wh = s.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        for d in glob.glob(f"{wh.removeprefix('file:')}/*_{os.getpid()}"):
            shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(autouse=True)
def _drop_query_caches(request):
    """Release per-query persist() blocks between tests: queries persist
    shared branches for their own execution and cannot unpersist before
    returning a lazy DataFrame, so a long shared session would otherwise
    accumulate every test's cache (GC pressure, eviction churn)."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()
