"""Zone-map data skipping (sources/skipping.py): the stats index is a
file-granularity SUPERSET selector — pruned reads equal plain filtered
reads on any layout, and actually skip files on a clustered one."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.sources.skipping import (
    file_zone_maps,
    prune_files,
    read_pruned,
)

SCHEMA = "id long, v long, s string"


def _clustered(spark, tmp_path, n=400, files=8):
    """Range-clustered layout: v strictly increasing with id, 8 files."""
    path = str(tmp_path / "clustered")
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 10).alias("v"),
        F.format_string("s%05d", F.col("id")).alias("s"),
    )
    df.repartitionByRange(files, "id").write.parquet(path)
    return path


def _read(spark, path):
    return spark.read.schema(SCHEMA).parquet(path)


def test_zone_maps_shape_and_totals(spark, tmp_path):
    path = _clustered(spark, tmp_path)
    zm = file_zone_maps(_read(spark, path), ["v", "s"])
    rows = zm.collect()
    assert len(rows) == len(_read(spark, path).inputFiles())
    assert sum(r.n_rows for r in rows) == 400
    for r in rows:
        assert r.v__min <= r.v__max
        assert r.v__nulls == 0


def test_pruned_read_equals_plain_filter(spark, tmp_path):
    path = _clustered(spark, tmp_path)
    full = _read(spark, path)
    zm = file_zone_maps(full, ["v"]).localCheckpoint(eager=True)
    for lo, hi in [(500, 700), (None, 90), (3990, None), (-5, -1), (0, 10**6)]:
        got = read_pruned(spark, zm, {"v": (lo, hi)}, SCHEMA)
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("v") >= lo)
        if hi is not None:
            cond = cond & (F.col("v") <= hi)
        want = full.filter(cond)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_pruning_actually_skips_files(spark, tmp_path):
    path = _clustered(spark, tmp_path)
    full = _read(spark, path)
    total = len(full.inputFiles())
    assert total >= 6
    zm = file_zone_maps(full, ["v"])
    narrow = read_pruned(spark, zm, {"v": (500, 700)}, SCHEMA)
    opened = len(narrow.inputFiles())
    assert 1 <= opened <= 2, opened  # ~21 of 400 rows, range-clustered
    assert narrow.count() == 21
    # out-of-range predicate prunes EVERYTHING — zero files opened
    assert read_pruned(spark, zm, {"v": (10**7, None)}, SCHEMA).count() == 0


def test_multi_column_conjunction(spark, tmp_path):
    path = _clustered(spark, tmp_path)
    full = _read(spark, path)
    zm = file_zone_maps(full, ["v", "s"])
    got = read_pruned(
        spark, zm, {"v": (100, 2000), "s": ("s00050", "s00060")}, SCHEMA
    )
    want = full.filter(
        (F.col("v") >= 100) & (F.col("v") <= 2000)
        & (F.col("s") >= "s00050") & (F.col("s") <= "s00060")
    )
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )


def test_nulls_prune_and_residual(spark, tmp_path):
    # file A: all-null v (prunable outright); file B: mixed nulls
    path = str(tmp_path / "nulls")
    a = spark.createDataFrame([(1, None, "a"), (2, None, "b")], SCHEMA)
    b = spark.createDataFrame([(3, 5, "c"), (4, None, "d"), (5, 9, "e")], SCHEMA)
    a.coalesce(1).write.parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    full = _read(spark, path)
    zm = file_zone_maps(full, ["v"])
    surv = prune_files(zm, {"v": (0, 100)})
    assert surv.count() == 1  # the all-null file drops at the index
    got = read_pruned(spark, zm, {"v": (0, 100)}, SCHEMA)
    assert sorted(r.id for r in got.collect()) == [3, 5]  # residual drops row 4


def test_unbounded_both_sides_rejected(spark, tmp_path):
    path = _clustered(spark, tmp_path)
    zm = file_zone_maps(_read(spark, path), ["v"])
    with pytest.raises(ValueError, match="matches everything"):
        prune_files(zm, {"v": (None, None)})
    with pytest.raises(ValueError, match="at least one predicate"):
        prune_files(zm, {})
    with pytest.raises(ValueError, match="no stats"):
        prune_files(zm, {"id": (0, 5)})


def test_stale_index_raises(spark, tmp_path):
    path = _clustered(spark, tmp_path)
    full = _read(spark, path)
    zm = file_zone_maps(full, ["v"]).localCheckpoint(eager=True)
    surviving = [
        r[0] for r in prune_files(zm, {"v": (500, 700)}).collect()
    ]
    os.remove(surviving[0].replace("file:", ""))
    with pytest.raises(FileNotFoundError, match="stale"):
        read_pruned(spark, zm, {"v": (500, 700)}, SCHEMA)


def test_random_layout_correct_but_unpruned(spark, tmp_path):
    # adversarial layout: values shuffled across files — every file's
    # interval is wide, nothing prunes, result still exact
    path = str(tmp_path / "random")
    df = spark.range(400).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 4000).alias("v"),
        F.lit("x").alias("s"),
    )
    df.repartition(8).write.parquet(path)
    full = _read(spark, path)
    zm = file_zone_maps(full, ["v"])
    got = read_pruned(spark, zm, {"v": (100, 200)}, SCHEMA)
    want = full.filter((F.col("v") >= 100) & (F.col("v") <= 200))
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The property x63's stats predicted, driven end to end: a Z-order
    layout gives zone-map pruning on BOTH dimensions, where a
    single-column sort only prunes its own column. Same rows, same
    index machinery, same two-sided predicate — layout is the only
    variable."""
    from stream_sentinel_spark.operators.partitioning import zorder_value

    sch = "x long, y long"
    n, files = 4096, 16
    grid = spark.range(n).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    z_path, lin_path = str(tmp_path / "zorder"), str(tmp_path / "linear")
    grid.withColumn("_z", zorder_value(F.col("x"), F.col("y"), bits=6)) \
        .repartitionByRange(files, "_z").drop("_z").write.parquet(z_path)
    grid.repartitionByRange(files, "x").write.parquet(lin_path)
    # the y-only predicate is the one a single-column (x) sort cannot
    # serve: every x-stripe spans all of y, so nothing prunes — while
    # the Z layout bounds y within each quadrant block
    pred = {"y": (10, 20)}
    opened = {}
    for name, path in (("zorder", z_path), ("linear", lin_path)):
        full = spark.read.schema(sch).parquet(path)
        zm = file_zone_maps(full, ["x", "y"])
        pruned = read_pruned(spark, zm, pred, sch)
        assert pruned.count() == 11 * 64  # exact under either layout
        opened[name] = len(pruned.inputFiles())
    assert opened["linear"] == files, opened  # no help from the x sort
    assert opened["zorder"] <= files // 2, opened


def test_refresh_zone_maps_stats_only_new_files(spark, tmp_path):
    """Appending extends the index at the cost of the new files only:
    the pre-existing rows pass through byte-identical (they were never
    re-scanned), the refreshed index equals a from-scratch rebuild, and
    pruned reads see the appended data."""
    path = _clustered(spark, tmp_path)
    zm0 = file_zone_maps(_read(spark, path), ["v"]).localCheckpoint(eager=True)
    extra = spark.createDataFrame(
        [(10_000 + i, 100_000 + i, "zz") for i in range(5)], SCHEMA
    )
    extra.coalesce(1).write.mode("append").parquet(path)
    from stream_sentinel_spark.sources.skipping import refresh_zone_maps

    zm1 = refresh_zone_maps(zm0, _read(spark, path), ["v"])
    rebuilt = file_zone_maps(_read(spark, path), ["v"])
    assert sorted(map(tuple, zm1.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    assert zm1.count() == zm0.count() + 1
    got = read_pruned(spark, zm1, {"v": (100_000, None)}, SCHEMA)
    assert got.count() == 5
    assert len(got.inputFiles()) == 1


# ---------------------------------------------------------------------------
# bloom-filter file skipping (equality probes)
# ---------------------------------------------------------------------------

from stream_sentinel_spark.sources.skipping import (  # noqa: E402
    file_bloom_maps,
    prune_files_bloom,
    read_pruned_bloom,
    refresh_bloom_maps,
)


def _scattered(spark, tmp_path, n=400, files=8):
    """Layout clustered on id, probed on `key` — a Weyl-sequence
    permutation of id, so every file's [key_min, key_max] spans nearly
    the whole domain (zone maps useless) while each file holds only
    n/files distinct keys (bloom prunes)."""
    path = str(tmp_path / "scattered")
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % n).alias("key"),
        F.format_string("s%05d", F.col("id")).alias("s"),
    )
    df.repartitionByRange(files, "id").write.parquet(path)
    return path


BSCHEMA = "id long, key long, s string"


def test_bloom_pruned_read_equals_point_lookup(spark, tmp_path):
    path = _scattered(spark, tmp_path)
    full = spark.read.schema(BSCHEMA).parquet(path)
    bm = file_bloom_maps(full, "key").localCheckpoint(eager=True)
    for probe in [[7], [7, 123, 399], [10**9], list(range(17))]:
        got = read_pruned_bloom(spark, bm, "key", probe, BSCHEMA)
        want = full.filter(F.col("key").isin(probe))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_bloom_skips_files_where_zone_maps_cannot(spark, tmp_path):
    path = _scattered(spark, tmp_path)
    full = spark.read.schema(BSCHEMA).parquet(path)
    n_files = len(full.inputFiles())
    assert n_files == 8
    zm = file_zone_maps(full, ["key"])
    bm = file_bloom_maps(full, "key").localCheckpoint(eager=True)
    # the scattered key leaves MOST files' [min, max] covering the
    # probe (a 50-residue sample's min can exceed 7, so a file or three
    # may drop — the point is zone maps stay near-useless here)
    assert prune_files(zm, {"key": (7, 7)}).count() >= n_files // 2
    # ... but at 400/8 = 50 keys/file and 8192 bits, the bloom isolates
    # the one true file (false positives possible but wildly unlikely)
    pruned = read_pruned_bloom(spark, bm, "key", [7], BSCHEMA)
    assert len(pruned.inputFiles()) <= 2
    assert pruned.count() == 1


def test_bloom_nulls_never_match_and_all_null_file_prunes(spark, tmp_path):
    path = str(tmp_path / "withnulls")
    df = spark.createDataFrame(
        [(0, 5, "a"), (1, None, "b"), (2, 7, "c")], BSCHEMA
    ).repartition(1)
    nulls = spark.createDataFrame(
        [(10, None, "x"), (11, None, "y")], BSCHEMA
    ).repartition(1)
    df.write.parquet(path)
    nulls.write.mode("append").parquet(path)
    full = spark.read.schema(BSCHEMA).parquet(path)
    bm = file_bloom_maps(full, "key").localCheckpoint(eager=True)
    assert bm.count() == len(full.inputFiles())
    surv = prune_files_bloom(bm, "key", [5])
    # the all-null file must NOT survive an equality probe
    assert surv.count() >= 1
    assert all(r["key__nulls"] < r["n_rows"] for r in surv.collect())
    got = read_pruned_bloom(spark, bm, "key", [5], BSCHEMA).collect()
    assert [(r.id, r.key) for r in got] == [(0, 5)]


def test_bloom_stale_index_raises(spark, tmp_path):
    path = _scattered(spark, tmp_path)
    full = spark.read.schema(BSCHEMA).parquet(path)
    bm = file_bloom_maps(full, "key").localCheckpoint(eager=True)
    victim = [f for f in full.inputFiles()][0].replace("file:", "")
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="stale"):
        # probe everything so the vanished file is pruned-in
        read_pruned_bloom(spark, bm, "key", list(range(400)), BSCHEMA).count()


def test_bloom_refresh_uses_index_family(spark, tmp_path):
    path = str(tmp_path / "grow")
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 97).alias("key"),
        F.lit("x").alias("s"),
    )
    base.repartition(2).write.parquet(path)
    full0 = spark.read.schema(BSCHEMA).parquet(path)
    # deliberately non-default family: refresh must stick to it
    bm0 = file_bloom_maps(full0, "key", bits=1024, hashes=2).localCheckpoint(eager=True)
    more = spark.range(100, 200).select(
        F.col("id"), (F.col("id") % 97).alias("key"), F.lit("y").alias("s")
    )
    more.repartition(2).write.mode("append").parquet(path)
    full1 = spark.read.schema(BSCHEMA).parquet(path)
    bm1 = refresh_bloom_maps(bm0, full1, "key").localCheckpoint(eager=True)
    assert bm1.count() == len(full1.inputFiles())
    fams = bm1.select("_bloom_bits", "_bloom_hashes").distinct().collect()
    assert [(r[0], r[1]) for r in fams] == [(1024, 2)]
    # pruned read over the refreshed index ≡ plain filter on the grown set
    got = read_pruned_bloom(spark, bm1, "key", [3], BSCHEMA)
    want = full1.filter(F.col("key") == 3)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # refresh statted ONLY the new files: old rows are bit-identical
    old = {r["_file"]: r for r in bm0.collect()}
    for r in bm1.collect():
        if r["_file"] in old:
            assert r == old[r["_file"]]


def test_bloom_rejections(spark, tmp_path):
    path = _scattered(spark, tmp_path, n=40, files=2)
    full = spark.read.schema(BSCHEMA).parquet(path)
    with pytest.raises(ValueError, match="no column"):
        file_bloom_maps(full, "nope")
    with pytest.raises(ValueError, match="power of two"):
        file_bloom_maps(full, "key", bits=1000)
    bm = file_bloom_maps(full, "key")
    with pytest.raises(ValueError, match="at least one probe"):
        prune_files_bloom(bm, "key", [])
    with pytest.raises(ValueError, match="non-null"):
        prune_files_bloom(bm, "key", [1, None])
    with pytest.raises(ValueError, match="no filter for column"):
        prune_files_bloom(bm, "id", [1])


def test_refresh_from_parquet_persisted_index(spark, tmp_path):
    """The deployment shape: the index PERSISTS as parquet next to the
    data. Refresh then anti-joins one file source against another under
    input_file_name(), which Spark rejects outright unless the known
    list is pinned first (MULTI_SOURCES_UNSUPPORTED_FOR_EXPRESSION —
    found by the 20 M-row stress, invisible to checkpointed-index
    tests). Covers both index kinds."""
    from stream_sentinel_spark.sources.skipping import refresh_zone_maps

    path = str(tmp_path / "data")
    zpath = str(tmp_path / "zm")
    bpath = str(tmp_path / "bm")
    spark.range(100).selectExpr("id", "id % 11 AS key", "'a' AS s").write.parquet(path)
    full0 = spark.read.schema(BSCHEMA).parquet(path)
    file_zone_maps(full0, ["key"]).write.parquet(zpath)
    file_bloom_maps(full0, "key").write.parquet(bpath)
    spark.range(100, 150).selectExpr(
        "id", "id % 11 AS key", "'b' AS s"
    ).repartition(1).write.mode("append").parquet(path)
    full1 = spark.read.schema(BSCHEMA).parquet(path)
    zm = refresh_zone_maps(spark.read.parquet(zpath), full1, ["key"])
    bm = refresh_bloom_maps(spark.read.parquet(bpath), full1, "key")
    assert zm.count() == len(full1.inputFiles())
    assert bm.count() == len(full1.inputFiles())
    got = read_pruned_bloom(spark, bm, "key", [3], BSCHEMA)
    want = full1.filter(F.col("key") == 3)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
