"""Owned-sketch operators (operators/sketches.py): HLL registers,
count-min, bloom pruning — determinism, error-direction, mergeability,
and the no-shuffle probe plan. Cross-engine value parity for the corpus
entries x32-x34 is covered by test_oracle_parity.py."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from stream_sentinel_spark.operators import sketches


@pytest.fixture(scope="module")
def sf_dir() -> str:
    import os

    return os.environ.get("SS_SKETCH_SF", "/root/testdata/sf0.001")


def _py_rho(value_hex12: str) -> int:
    """Reference rho: leftmost 1-bit position in the 48-bit suffix."""
    v = int(value_hex12, 16)
    if v == 0:
        return 49
    return 48 - v.bit_length() + 1


def _py_register_table(values):
    regs = {}
    for v in values:
        hx = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(hx[:2], 16)
        rho = _py_rho(hx[2:14])
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


class TestHll:
    def test_rho_matches_bit_scan(self, spark):
        # every rho regime: all-zero suffix, leading-zero nibbles, each
        # position within a nibble
        cases = [
            "000000000000",
            "800000000000",
            "400000000000",
            "200000000000",
            "100000000000",
            "080000000000",
            "010000000000",
            "000000000001",
            "0000f0000000",
            "7fffffffffff",
        ]
        df = spark.createDataFrame([(c,) for c in cases], "hx string")
        got = {
            r["hx"]: r["rho"]
            for r in df.select("hx", sketches.hll_rho(F.col("hx")).alias("rho")).collect()
        }
        for c in cases:
            assert got[c] == _py_rho(c), c

    def test_registers_match_python_reference(self, spark):
        values = list(range(400))
        df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
            "g", F.lit("a")
        )
        regs = {
            r["register"]: r["max_rho"]
            for r in sketches.hll_registers(df, ["g"], "v").collect()
        }
        assert regs == _py_register_table(values)

    def test_estimate_within_rsd(self, spark):
        # m=256 → rsd ≈ 6.5%; 3·rsd ≈ 20% is the hard bound
        n = 2000
        df = spark.createDataFrame([(v,) for v in range(n)], "v long").withColumn(
            "g", F.lit("a")
        )
        est = sketches.hll_distinct(df, ["g"], "v").collect()[0]["hll_estimate"]
        assert abs(est - n) / n < 0.20

    def test_registers_merge_across_partitions(self, spark):
        # the sketch contract: registers(A ∪ B) == merge(registers(A), registers(B))
        a = spark.createDataFrame([(v,) for v in range(300)], "v long").withColumn(
            "g", F.lit("a")
        )
        b = spark.createDataFrame(
            [(v,) for v in range(200, 600)], "v long"
        ).withColumn("g", F.lit("a"))
        both = sketches.hll_registers(a.unionByName(b), ["g"], "v")
        merged = (
            sketches.hll_registers(a, ["g"], "v")
            .unionByName(sketches.hll_registers(b, ["g"], "v"))
            .groupBy("g", "register")
            .agg(F.max("max_rho").alias("max_rho"))
        )
        assert sorted(map(tuple, both.collect())) == sorted(
            map(tuple, merged.collect())
        )


class TestCms:
    def test_estimate_never_under(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        sk = sketches.cms_build(ev, "user_id")
        exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
        est = sketches.cms_estimate(sk, exact.select("user_id"), "user_id")
        bad = (
            exact.join(est, "user_id")
            .filter(F.col("cms_estimate") < F.col("exact_cnt"))
            .count()
        )
        assert bad == 0  # CMS error is one-sided by construction

    def test_sketch_bounded_and_mergeable(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        sk = sketches.cms_build(ev, "user_id")
        assert sk.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH
        # summing two halves' sketches == whole sketch
        h1 = sketches.cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
        h2 = sketches.cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
        merged = (
            h1.unionByName(h2)
            .groupBy("depth", "bucket")
            .agg(F.sum("counter").alias("counter"))
        )
        assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, merged.collect()))


class TestBloom:
    def test_no_false_negatives_and_bounded_fp(self, spark):
        keys = spark.createDataFrame([(i,) for i in range(0, 3000)], "k long")
        bitmap = sketches.bloom_build(keys, "k")
        assert len(bitmap) == sketches.BLOOM_BITS // 64
        probe = spark.createDataFrame([(i,) for i in range(0, 6000)], "k long")
        kept = {r["k"] for r in sketches.bloom_prune(probe, "k", bitmap).collect()}
        assert set(range(3000)) <= kept  # members always pass
        fp = len(kept) - 3000
        # 3000 keys × 3 hashes in 65536 bits → fpr ≈ (1-e^(-9000/65536))^3 ≈ 0.2%
        assert fp / 3000 < 0.02

    def test_probe_is_map_only(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        bitmap = sketches.bloom_build(
            spark.createDataFrame([(i,) for i in range(100)], "k long"), "k"
        )
        plan = sketches.bloom_prune(li, "l_orderkey", bitmap)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure filter: no shuffle added


def test_hll_registers_merge_equals_rebuild(spark):
    """max-merging per-part register tables gives the IDENTICAL sketch
    (and therefore estimate) as building from the union — the property
    that makes HLL the distributed distinct-count path."""
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i % 2, f"v{i % 700}") for i in range(5000)], "part int, v string"
    )
    merged_regs = (
        hll_registers(df, ["part"], "v")
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .withColumn("g", F.lit(0))
    )
    direct_regs = hll_registers(df.withColumn("g", F.lit(0)), ["g"], "v")
    merged = hll_estimate(merged_regs, ["g"]).collect()[0]
    direct = hll_estimate(direct_regs, ["g"]).collect()[0]
    assert merged["hll_estimate"] == direct["hll_estimate"]
    assert merged["harmonic_scaled"] == direct["harmonic_scaled"]


def test_cms_estimate_absent_key_is_zero(spark):
    """A key never inserted must report estimate 0 (or a collision
    over-count), not vanish from the output."""
    from stream_sentinel_spark.operators.sketches import cms_build, cms_estimate

    data = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "k string")
    sketch = cms_build(data, "k")
    probes = spark.createDataFrame(
        [("a",), ("definitely-not-inserted-xyz",)], "k string"
    )
    out = {r["k"]: r["cms_estimate"] for r in cms_estimate(sketch, probes, "k").collect()}
    assert set(out) == {"a", "definitely-not-inserted-xyz"}
    assert out["a"] >= 5  # one-sided
    assert out["definitely-not-inserted-xyz"] >= 0
