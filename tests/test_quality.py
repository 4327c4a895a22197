"""Data-quality constraint suite (operators/quality.py): failing
constraints, null handling, profile-only metrics, and the one-pass plan.
Cross-engine parity for the report values is x36 in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_sentinel_spark.operators import quality as dq


def _report(spark, rows, schema, checks):
    df = spark.createDataFrame(rows, schema)
    out = dq.run_checks(df, checks)
    return {r["metric"]: (r["value"], r["passed"]) for r in out.collect()}


def test_failing_and_passing_constraints(spark):
    rows = [(1, "a", 10.0), (2, "b", None), (2, "c", 30.0)]
    rep = _report(
        spark,
        rows,
        "id long, name string, v double",
        [
            dq.completeness("v", at_least=0.9),       # 2/3 -> fail
            dq.uniqueness("id"),                       # dup id -> fail
            dq.uniqueness("name"),                     # unique -> pass
            dq.min_value("v", at_least=0.0),           # 10 -> pass
            dq.mean_value("v", between=(0.0, 100.0)),  # 20 -> pass
        ],
    )
    assert rep["completeness(v)"] == (2 / 3, 0)
    assert rep["uniqueness(id)"][1] == 0
    assert rep["uniqueness(name)"][1] == 1
    assert rep["min(v)"] == (10.0, 1)
    assert rep["mean(v)"] == (20.0, 1)


def test_profile_only_metric_has_null_passed(spark):
    rep = _report(
        spark,
        [(1,), (2,)],
        "id long",
        [dq.distinctness("id"), dq.completeness("id")],
    )
    assert rep["distinctness(id)"] == (2.0, None)
    assert rep["completeness(id)"] == (1.0, None)


def test_compliance_fraction(spark):
    rep = _report(
        spark,
        [("O",), ("F",), ("X",), ("O",)],
        "s string",
        [dq.compliance("dom", F.col("s").isin("O", "F"), at_least=0.9)],
    )
    assert rep["compliance(dom)"] == (0.75, 0)


def test_single_aggregation_pass(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    checks = [
        dq.completeness("v"),
        dq.min_value("v"),
        dq.max_value("v"),
        dq.mean_value("v"),
        dq.compliance("pos", F.col("v") >= 0, at_least=1.0),
    ]
    plan = dq.run_checks(df, checks)._jdf.queryExecution().optimizedPlan().toString()
    # all constraints fold into one Aggregate node — one scan, one pass
    assert plan.count("Aggregate") == 1


def test_benford_profile_exact_digits(spark):
    from stream_sentinel_spark.operators.quality import benford_profile

    # 6.55 * 100 = 654.999… in IEEE: digit extraction must still say 6
    df = spark.createDataFrame(
        [(6.55,), (0.01,), (123.0,), (19.99,), (-5.0,), (0.0,)],
        "value double",
    )
    out = {r["digit"]: r["n"] for r in benford_profile(df, "value").collect()}
    assert out == {6: 1, 1: 3}  # 0.01→1, 123.0→1, 19.99→1999→1; ≤0 excluded


def test_benford_profile_math(spark):
    import math

    from stream_sentinel_spark.operators.quality import benford_profile

    df = spark.createDataFrame([(float(d),) for d in [1, 1, 1, 2]], "value double")
    rows = {r["digit"]: r for r in benford_profile(df, "value").collect()}
    assert rows[1]["frac"] == 0.75
    assert rows[1]["benford_p"] == round(math.log10(2.0), 6)
    e = math.log10(2.0) * 4
    assert rows[1]["chi2_term"] == round((3 - e) ** 2 / e, 6)


def test_benford_profile_rounds_to_zero_excluded(spark):
    from stream_sentinel_spark.operators.quality import benford_profile

    # 0.003 is positive but rounds to 0 at scale 2: no digit-0 row, no
    # division by zero in the expected share
    df = spark.createDataFrame([(0.003,), (1.0,)], "value double")
    rows = benford_profile(df, "value").collect()
    assert {r["digit"] for r in rows} == {1}
    assert all(r["benford_p"] is not None for r in rows)


def test_referential_integrity_orphans_and_nulls(spark):
    from stream_sentinel_spark.operators.quality import referential_integrity

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk long"
    )
    r = referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert (r["n_rows"], r["n_null_fk"], r["n_orphans"]) == (5, 1, 1)
    assert r["orphan_frac"] == 1 / 4  # over non-null rows
    assert r["passed"] is False


def test_referential_integrity_clean_pass(spark):
    from stream_sentinel_spark.operators.quality import referential_integrity

    parent = spark.createDataFrame([(1,)], "pk long")
    child = spark.createDataFrame([(1,), (1,)], "fk long")
    r = referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert r["passed"] is True and r["n_orphans"] == 0


def test_column_profile_values(spark):
    import math

    from stream_sentinel_spark.operators.quality import column_profile

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), (None,), (None,)], "c string"
    )
    r = column_profile(df, ["c"], top_k=1).collect()[0]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (6, 3, 2)
    # entropy over non-null distribution {a: 2/3, b: 1/3}
    want = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert r["entropy"] == round(want, 6)
    # NULL outnumbers everything but must not take the top-k slot
    assert r["top_values"] == "a:2"


def test_column_profile_topk_order_and_ties(spark):
    from stream_sentinel_spark.operators.quality import column_profile

    df = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 3 + [("z",)] * 1, "c string"
    )
    r = column_profile(df, ["c"], top_k=2).collect()[0]
    assert r["top_values"] == "x:3,y:3"  # count desc, value asc on ties


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_zero(spark):
    from stream_sentinel_spark.operators.quality import psi_drift

    df = spark.range(100).selectExpr("CAST(id % 40 AS DOUBLE) AS v")
    rows = psi_drift(df, df, "v", [10.0, 20.0, 30.0]).collect()
    assert len(rows) == 4
    assert all(r["psi_term"] == 0.0 for r in rows)
    assert sum(r["n_ref"] for r in rows) == 100


def test_psi_hand_computed_shift(spark):
    import math

    from stream_sentinel_spark.operators.quality import psi_drift

    ref = spark.createDataFrame([(float(v),) for v in [1, 1, 5, 5]], "v double")
    cur = spark.createDataFrame([(float(v),) for v in [1, 5, 5, 5]], "v double")
    rows = {r["bucket"]: r for r in psi_drift(ref, cur, "v", [3.0]).collect()}
    # bucket 0: p=0.5, q=0.25; bucket 1: p=0.5, q=0.75
    t0 = (0.5 - 0.25) * math.log(0.5 / 0.25)
    t1 = (0.5 - 0.75) * math.log(0.5 / 0.75)
    assert rows[0]["psi_term"] == round(t0, 6)
    assert rows[1]["psi_term"] == round(t1, 6)


def test_psi_empty_bucket_clamps_and_nulls_reported(spark):
    from stream_sentinel_spark.operators.quality import psi_drift

    ref = spark.createDataFrame(
        [(1.0,), (1.0,), (None,)], "v double"
    )
    cur = spark.createDataFrame([(9.0,), (None,), (None,)], "v double")
    rows = {r["bucket"]: r for r in psi_drift(ref, cur, "v", [5.0]).collect()}
    # bucket 0 is empty on the cur side: q clamps to eps, term finite
    assert rows[0]["n_cur"] == 0 and rows[0]["p_cur"] == 1e-6
    assert rows[0]["psi_term"] > 0
    # a bucket empty on BOTH sides contributes exactly 0 — here none,
    # but the null counts must surface, excluded from all denominators
    assert rows[0]["n_null_ref"] == 1 and rows[0]["n_null_cur"] == 2
    assert rows[0]["p_ref"] == 1.0  # 2 of 2 non-null ref rows


def test_psi_rejects_bad_edges(spark):
    import pytest as _pytest

    from stream_sentinel_spark.operators.quality import psi_drift

    df = spark.range(2).selectExpr("CAST(id AS DOUBLE) AS v")
    for bad in ([], [3.0, 1.0], [1.0, 1.0]):
        with _pytest.raises(ValueError, match="strictly-increasing"):
            psi_drift(df, df, "v", bad)
