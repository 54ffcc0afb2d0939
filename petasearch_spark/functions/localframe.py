"""JVM-literal construction of small driver-side DataFrames.

``spark.createDataFrame(rows)`` for a plain Python list builds a
32-partition **Python-RDD-backed** frame: every action on it round-trips
the Python worker pool, and the common ``coalesce(1).write`` sidecar
pattern is worst-case — the single coalesced task evaluates all 32
parent partitions sequentially, ~5-7 s of pure Python-boundary overhead
for a 1-row frame (measured round 10, warm session; the noop path still
pays ~1 s). A frame built from ``range(1)`` + literal projections is a
pure JVM plan: the same write is ~0.2 s, and the frame can never appear
as a Python stage in any consumer's executed plan
(spark_optimization_guide §4 — eliminate the JVM↔Python boundary).

Scope: BOUNDED literal rows of scalar values (int/float/str/bytes/bool/
None) — exactly the sidecar/summary/accounting frames the operators
build. Corpus-sized data never goes through here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


# Past this many rows the literal struct-array expression tree starts to
# cost more in Catalyst analysis/codegen than the Python-RDD scan it
# replaces (and an unbounded caller would bloat every consumer plan —
# round-10 ADVICE on bm25 qterms); fall back to createDataFrame there.
MAX_LITERAL_ROWS = 256


def _parse_schema(schema: str | StructType) -> StructType:
    if isinstance(schema, StructType):
        return schema
    # the same DDL-string form createDataFrame accepts
    return StructType.fromDDL(schema)


def literal_df(
    spark: SparkSession, rows: list[tuple], schema: str | StructType
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL scalar literal
    rows, built as a JVM-only plan (``range`` + ``inline`` of a struct
    array — zero Python tasks at evaluation time).

    Values are embedded with ``F.lit(...).cast(field type)``, so every
    field arrives exactly as the schema declares it (None becomes a
    typed NULL). Rows must be sequences matching the schema's field
    order — the createDataFrame contract this replaces.

    The struct array is cast to ``array<st>`` BEFORE inline: the cast
    target carries the declared per-field nullability verbatim, so the
    generated columns match ``st`` exactly — createDataFrame marks DDL
    fields nullable while literal columns come out non-nullable, and the
    driver's schema gate must not see that drift (``.to(st)`` does NOT
    reconcile it: a non-nullable source is left as the narrower type).

    Out-of-scope inputs — more than MAX_LITERAL_ROWS rows, or any
    non-scalar cell (vector/centroid frames, round-10 VERDICT item 2) —
    delegate to ``createDataFrame``: a literal tree there costs more in
    Catalyst analysis than the Python-RDD scan it would replace."""
    st = _parse_schema(schema)
    if len(rows) > MAX_LITERAL_ROWS or any(
        isinstance(v, (list, tuple, dict)) for row in rows for v in row
    ):
        return spark.createDataFrame(rows, st)

    def _lit(v, dt):
        return F.lit(v).cast(dt)

    if rows:
        arr = F.array(
            *[
                F.struct(
                    *[
                        _lit(v, f.dataType).alias(f.name)
                        for v, f in zip(row, st.fields)
                    ]
                )
                for row in rows
            ]
        )
    else:
        # array<void> casts to any array<struct> — a zero-row frame with
        # the exact declared schema
        arr = F.array()
    return spark.range(1).select(
        F.inline(arr.cast(ArrayType(st, containsNull=False)))
    )
