"""Cross-engine-deterministic building blocks.

The driver's correctness gate (t2) runs each Spark query AND its DuckDB
oracle SQL on the same parquet and compares row counts + values. Floating
point and engine-specific hash functions are the two places that silently
diverge; everything here is chosen to be bit-identical across Spark and
DuckDB:

* ``hash64``: first 15 hex digits of md5 -> BIGINT (60 bits, positive).
  Spark ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
  ``('0x'||substr(md5(x),1,15))::BIGINT``. md5 is identical everywhere;
  engine-native hash functions (murmur vs duckdb hash) are not.
* money/quantity aggregates: cast to DECIMAL before summing (exact),
  cast the final sum to DOUBLE (exact for < 2^53).
* token split: regex ``\\s+`` split + drop empty tokens, identical
  semantics in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column) -> Column:
    """Deterministic 60-bit positive hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash64` over SQL expression `expr`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


#: THE whitespace rule, stated once as an explicit ASCII class because
#: the three regex dialects disagree on bare ``\s``: Java (Spark)
#: includes \x0B, RE2 (DuckDB) does not, and Python re is Unicode-aware
#: (\xa0,  , ...) — bare \s made every token-based operator diverge
#: from its oracle on text containing vertical tab or non-ASCII
#: whitespace (round-5 audit). The explicit class means the SAME set of
#: separator characters in all three engines; non-ASCII whitespace is
#: deliberately NOT a separator anywhere.
WS_CHARS = r" \t\n\r\f\x0B"
WS_PATTERN = f"[{WS_CHARS}]+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (array<string>)."""
    return F.filter(F.split(col, WS_PATTERN), lambda t: t != F.lit(""))


# DuckDB single-quoted literals pass backslashes through verbatim, so
# the raw pattern lands in RE2 exactly as written
TOKENS_SQL = "list_filter(regexp_split_to_array({col}, '" + WS_PATTERN + "'), x -> x <> '')"


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) from a token array."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


#: shingle-start bound shared by the SQL twins' range(1, N) enumeration
#: AND the Spark-side kernels — an oracle-only cap would silently
#: truncate the comparison for >4095-token docs while the engine
#: shingled them fully (round-5 audit; the kmer/sketch families carry
#: the same both-sides rule)
SHINGLE_MAX_TOKENS = 4096


def shingles_sql(table: str, id_col: str, text_col: str, n: int = 3, extra_cols: str = "", max_tokens: int = SHINGLE_MAX_TOKENS, distinct: bool = True) -> str:
    """DuckDB CTE body producing (id, shingle) rows (DISTINCT by default).

    DuckDB 1.0 can't use a correlated lateral generate_series, so we cross
    join a constant `range` and filter to the token count (oracle runs at
    sf<=0.01 only; the bound is generous — and applied on BOTH engines,
    see SHINGLE_MAX_TOKENS)."""
    toks = TOKENS_SQL.format(col=text_col)
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    extra = f", {extra_cols}" if extra_cols else ""
    d = "DISTINCT " if distinct else ""
    return f"""
        toks AS (SELECT {id_col}, {toks} AS t{extra} FROM {table}),
        sh AS (
            SELECT {d}{id_col}, {parts} AS shingle{extra}
            FROM toks, range(1, {max_tokens}) r(i)
            WHERE i + {n - 1} <= len(t)
        )
    """


def shingle_hashes_sql(table: str, id_col: str, text_col: str, n: int = 3, hash_col: str = "sh_h") -> str:
    """CTE chain ending in `shh(id, hash_col)`: DISTINCT applied on the
    8-byte hash, not the shingle string — the cheap-shuffle form the Spark
    side uses."""
    return f"""{shingles_sql(table, id_col, text_col, n=n, distinct=False)}
, shh AS (SELECT DISTINCT {id_col}, {hash64_sql("shingle")} AS {hash_col} FROM sh)"""


def decimal_sum(col: Column, scale: str = "decimal(18,4)") -> Column:
    """Exact cross-engine sum: DECIMAL accumulate, round to scale 4 (both
    engines round decimals half-away-from-zero), then DOUBLE. Rounding in
    the decimal domain matters: DuckDB's high-scale decimal->double cast is
    up to 1 ulp off Spark's correctly-rounded conversion."""
    return F.round(F.sum(col.cast(scale)), 4).cast("double")
