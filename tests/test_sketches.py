"""Sketch-family guarantees the oracle rows can't express: the Count-Min
one-sided error bound under forced collisions, and KMV/CM mergeability
arguments that only hold because the state is order-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

from petasearch_spark.operators import sketches

SF = "/root/testdata/sf0.001"


def _tf(spark, counts: dict[str, int]):
    return spark.createDataFrame(
        [(t, c) for t, c in counts.items()], ["term", "cnt"]
    ).withColumn("cnt", F.col("cnt").cast("long"))


def test_cm_is_exact_when_vocab_fits(spark):
    counts = {f"t{i}": 10 * (i + 1) for i in range(8)}
    out = sketches.cm_probe(_tf(spark, counts), depth=4, width=512, top_k=8).collect()
    assert len(out) == 8
    for r in out:
        assert r["cm_estimate"] == r["exact_cnt"]
        assert r["overestimate"] == 0


def test_cm_overestimates_but_never_underestimates_under_collisions(spark):
    # width=2 forces heavy collisions: estimates inflate, never deflate
    counts = {f"w{i}": 5 + i for i in range(32)}
    out = sketches.cm_probe(_tf(spark, counts), depth=2, width=2, top_k=32).collect()
    assert len(out) == 32
    total = sum(counts.values())
    assert any(r["overestimate"] > 0 for r in out)
    for r in out:
        assert r["cm_estimate"] >= r["exact_cnt"]
        assert r["cm_estimate"] <= total  # counter can't exceed the stream total


def test_cm_counters_merge_across_shards(spark):
    # CM state is additive: sketch(shard A) + sketch(B) == sketch(A ∪ B).
    # Probing the tf-sum table equals summing per-shard probes only when
    # no collision splits differently — with exact-fit width both equal.
    a = {f"m{i}": 3 for i in range(6)}
    b = {f"m{i}": 4 for i in range(6)}
    merged = {k: a[k] + b[k] for k in a}
    out = sketches.cm_probe(_tf(spark, merged), depth=4, width=256, top_k=6).collect()
    for r in out:
        assert r["cm_estimate"] == 7


def test_cm_heavy_hitters_runs_on_corpus(spark):
    rows = sketches.cm_heavy_hitters(spark, SF).collect()
    assert len(rows) == sketches.CM_TOP_K
    assert all(r["cm_estimate"] >= r["exact_cnt"] for r in rows)
    # output is ranked by exact count
    cnts = [r["exact_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


class TestHLL:
    """HLL guarantees the oracle row can't express: register mergeability
    (union = elementwise max) and the linear-counting branch on sparse
    registers."""

    @staticmethod
    def _registers(spark, terms):
        from petasearch_spark.operators.portable import hash64

        df = spark.createDataFrame([(t,) for t in terms], ["t"]).select(
            hash64(F.col("t")).alias("h")
        )
        return {
            r["bucket"]: r["reg"]
            for r in df.select(
                (F.col("h") % sketches.HLL_M).alias("bucket"),
                (
                    55
                    - F.length(
                        F.regexp_replace(
                            F.conv(F.expr(f"h DIV {sketches.HLL_M}"), 10, 2), "^0+", ""
                        )
                    )
                ).alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("reg"))
            .collect()
        }

    def test_registers_merge_by_elementwise_max(self, spark):
        a = [f"alpha{i}" for i in range(300)]
        b = [f"beta{i}" for i in range(300)]
        ra, rb, rall = (
            self._registers(spark, a),
            self._registers(spark, b),
            self._registers(spark, a + b),
        )
        merged = {
            k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
        }
        assert merged == rall

    def test_estimate_accuracy_on_corpus(self, spark):
        rows = sketches.hll_distinct_tokens(spark, SF).collect()
        assert rows
        for r in rows:
            # 64 registers -> sigma = 1.04/8 = 13%; 4 sigma bound
            assert abs(r["rel_error"]) < 0.52
            assert r["hll_estimate"] > 0

    def test_linear_counting_branch_on_sparse_registers(self, spark):
        """A handful of distinct values leaves most registers zero; the
        estimate must come from the linear-counting branch and land close
        to exact (raw HLL is badly biased here)."""
        import math

        regs = self._registers(spark, [f"x{i}" for i in range(10)])
        z = sketches.HLL_M - len(regs)
        assert z > 0
        lc = sketches.HLL_M * math.log(sketches.HLL_M / z)
        assert abs(lc - 10) < 3  # LC is tight at this range
