"""Global sorts above expensive Python-kernel subtrees.

A global ``orderBy`` plans as ``Sort <- Exchange(rangepartitioning)``, and
building the RangePartitioner runs a SEPARATE sampling job over the
exchange's child RDD (``RangePartitioner.sketch``). That job re-executes
everything above the last materialized shuffle — so a ``mapInPandas``
kernel sitting directly under the final sort runs **twice per query**:
once for the sample, once for the real shuffle write (measured: exactly
2x the kernel batch count; pinned by
tests/test_plan_antipatterns.py::test_sort_above_kernel_runs_kernel_once).

``sort_via_exchange`` interposes a hash exchange on the leading sort key,
so the sampling job reads that shuffle instead of recomputing the kernel:
kernel once, at the cost of one extra exchange of FINAL RESULT rows —
tiny next to kernel compute at any scale, and AQE coalesces it. Use it
only where the subtree under the sort is expensive (alignment/rescore
kernels); a sort above an aggregation already samples from the agg's own
exchange and needs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sort_via_exchange(df: DataFrame, *cols) -> DataFrame:
    """``df.orderBy(*cols)`` with the RangePartitioner sampling decoupled
    from the (expensive) child plan by a hash exchange on ``cols[0]``.
    Result-identical to a bare ``orderBy`` whenever the sort spec is a
    total order over the rows (every call site here sorts on a unique key
    set); the interposed exchange only changes which physical partitions
    feed the range shuffle."""
    return df.repartition(cols[0]).orderBy(*cols)
