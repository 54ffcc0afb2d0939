"""Skew-aware join utilities.

The prefilter join's classic hazard is hot k-mers: low-complexity
sequence makes a handful of keys carry orders of magnitude more rows
than the rest, so one shuffle partition dominates the stage
(SURVEY §4.1). Three defenses, layered:

1. J2's one-representative-per-kmer index bounds the BUILD side at one
   row per key by construction (operators/kmer_index.py).
2. AQE skew-join splitting is on session-wide (session.py) and
   re-splits oversized partitions at runtime.
3. `salted_join` below is the explicit tool for joins AQE cannot fix —
   e.g. a shuffled join whose probe side concentrates on few keys while
   the build side must be replicated: the hot side's keys are salted
   into SALT buckets and the other side is exploded across all buckets,
   turning one giant partition into SALT even ones.

The salting is deterministic (key-hash based), so results are identical
to the unsalted join — verified by test against the plain join."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed ⋈ other ON on` with the skewed side's rows spread
    across `salt` sub-keys and the other side replicated to every sub-key.

    Cost model: the other side's shuffle volume grows `salt`-fold (use for
    small-ish build sides), the skewed side's hottest key now lands on
    `salt` partitions instead of one. Row-level results are EXACTLY the
    plain join's."""
    skew_salted = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    other_replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = skew_salted.join(other_replicated, [on, "_salt"], how)
    return out.drop("_salt")


def key_histogram(df: DataFrame, on: str, top: int = 20) -> DataFrame:
    """Skew diagnostic: the heaviest `top` keys with their row counts and
    share of the table — run this before choosing a join strategy."""
    total = df.count()
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(total), 6))
        .orderBy(F.desc("rows"))
        .limit(top)
    )
