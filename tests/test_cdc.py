"""CDC operators (operators/cdc.py): merge semantics (upsert, delete
tombstone, seq tie-break) and SCD2 interval algebra (compression,
contiguity, as-of reads). Cross-engine parity is x37/x38 in
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_sentinel_spark.operators import cdc


def _changes(spark):
    #  key  seq  op   val
    rows = [
        (1, 1, "U", "a"),
        (1, 2, "U", "b"),     # key 1: latest is b
        (2, 1, "U", "x"),
        (2, 2, "D", None),    # key 2: deleted
        (3, 1, "D", None),
        (3, 2, "U", "y"),     # key 3: re-inserted after delete
        (4, 1, "U", "p"),     # key 4: seq tie, higher tiebreak wins
        (4, 1, "U", "q"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, op string, val string")
    return df.withColumn("tb", F.monotonically_increasing_id())


class TestMergeLatest:
    def test_upsert_delete_reinsert(self, spark):
        snap = cdc.merge_latest(
            _changes(spark), ["k"], ["seq", "tb"], op_col="op"
        )
        got = {r["k"]: r["val"] for r in snap.collect()}
        assert got == {1: "b", 3: "y", 4: "q"}

    def test_no_op_column_keeps_all_keys(self, spark):
        snap = cdc.merge_latest(_changes(spark), ["k"], ["seq", "tb"])
        assert snap.count() == 4  # one row per key, tombstones included


class TestScd2:
    def _history(self, spark):
        rows = [
            # key 1: a a b a  -> versions a[1,3) b[3,4) a[4,∞)
            (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
            # key 2: constant -> one open version
            (2, 1, "z"), (2, 2, "z"),
        ]
        df = spark.createDataFrame(rows, "k long, seq long, attr string")
        return cdc.scd2(df, ["k"], "seq", ["attr"]).cache()

    def test_compression_and_intervals(self, spark):
        h = self._history(spark)
        k1 = sorted(
            (r["valid_from"], r["valid_to"], r["attr"])
            for r in h.filter("k = 1").collect()
        )
        assert k1 == [(1, 3, "a"), (3, 4, "b"), (4, None, "a")]
        assert h.filter("k = 2").count() == 1

    def test_exactly_one_current_per_key(self, spark):
        h = self._history(spark)
        per_key = h.groupBy("k").agg(F.sum("is_current").alias("cur")).collect()
        assert all(r["cur"] == 1 for r in per_key)

    def test_intervals_contiguous(self, spark):
        # each version's valid_to equals the next version's valid_from
        h = self._history(spark)
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("valid_from")
        bad = (
            h.withColumn("nxt", F.lead("valid_from").over(w))
            .filter(F.col("nxt").isNotNull() & (F.col("valid_to") != F.col("nxt")))
            .count()
        )
        assert bad == 0

    def test_as_of_read(self, spark):
        h = self._history(spark)
        asof = h.filter(
            (F.col("valid_from") <= 3)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > 3))
        )
        got = {r["k"]: r["attr"] for r in asof.collect()}
        assert got == {1: "b", 2: "z"}


def test_snapshot_diff_statuses(spark):
    from stream_sentinel_spark.operators.cdc import snapshot_diff

    a = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, None), (4, 40.0, "w")],
        "k long, price double, tag string",
    )
    b = spark.createDataFrame(
        [(2, 20.0, "y"), (3, 30.0, None), (4, 41.0, "W"), (5, 50.0, "v")],
        "k long, price double, tag string",
    )
    out = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(a, b, ["k"], ["price", "tag"]).collect()
    }
    assert out == {
        1: ("removed", ""),
        4: ("changed", "price,tag"),
        5: ("added", ""),
    }  # 2 identical and 3 (null == null, null-safe) are dropped


def test_snapshot_diff_null_keys(spark):
    """A NULL-keyed row present in both snapshots must diff as ONE row
    (null-safe key match), not as a contradictory added+removed pair."""
    from stream_sentinel_spark.operators.cdc import snapshot_diff

    a = spark.createDataFrame(
        [(None, 1.0), (1, 10.0)], "k long, v double"
    )
    b = spark.createDataFrame(
        [(None, 2.0), (1, 10.0)], "k long, v double"
    )
    rows = snapshot_diff(a, b, ["k"], ["v"]).collect()
    assert len(rows) == 1
    assert rows[0]["k"] is None
    assert rows[0]["status"] == "changed"
    assert rows[0]["changed_cols"] == "v"


def test_snapshot_diff_include_unchanged(spark):
    from stream_sentinel_spark.operators.cdc import snapshot_diff

    a = spark.createDataFrame([(1, 1.0)], "k long, v double")
    out = snapshot_diff(a, a, ["k"], ["v"], include_unchanged=True).collect()
    assert [(r["k"], r["status"]) for r in out] == [(1, "unchanged")]
