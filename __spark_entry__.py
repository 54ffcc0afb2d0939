"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full petasearch-style engine end-to-end
                 (index build -> prefilter join -> banded gapped alignment)
                 on sequences derived from /root/testdata/sf0.001.
queries()      — every implemented operator from SURVEY §2 + the
                 large-scale-pipeline surface (petasearch_spark/registry.py).
oracle_sql()   — DuckDB-equivalent SQL per query (same column names/values).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from petasearch_spark import registry  # noqa: E402
from petasearch_spark.operators.doc_search import protein_search  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return protein_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
