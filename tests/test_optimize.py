"""Small-file OPTIMIZE for plain parquet dirs (sources/optimize.py):
content preservation, file-count reduction, and the full crash-state
decision table of the double-rename swap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.sources.optimize import (
    optimize_parquet_dir,
    recover_optimize,
)

SCHEMA = "id long, v string"


def _fragmented(spark, tmp_path, rows=500, files=25):
    path = str(tmp_path / "sink")
    df = spark.range(rows).select(
        F.col("id"), F.format_string("v%04d", F.col("id")).alias("v")
    )
    df.repartition(files).write.parquet(path)
    return path


def _rows(spark, path):
    return sorted(
        (r.id, r.v) for r in spark.read.schema(SCHEMA).parquet(path).collect()
    )


def test_optimize_preserves_content_and_shrinks(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    before = _rows(spark, path)
    n_before = len(spark.read.parquet(path).inputFiles())
    report = optimize_parquet_dir(spark, path, 4, schema=SCHEMA)
    assert report["files_before"] == n_before >= 20
    assert report["files_after"] == 4
    assert report["rows"] == 500
    assert _rows(spark, path) == before
    # no protocol debris left behind
    assert recover_optimize(spark, path) == "clean"


def test_optimize_bad_target_rejected(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    with pytest.raises(ValueError, match="target_files"):
        optimize_parquet_dir(spark, path, 0)


def _simulate_states(spark, path):
    """Prepare the swap inputs as optimize would: a COMPLETE tmp copy."""
    src = spark.read.schema(SCHEMA).parquet(path)
    src.repartition(2).write.parquet(f"{path}__optimizing")


def test_recover_partial_tmp_with_source_intact(spark, tmp_path):
    # crash during the tmp write: source untouched, debris deleted
    path = _fragmented(spark, tmp_path)
    before = _rows(spark, path)
    (tmp_path / "sink__optimizing").mkdir()
    (tmp_path / "sink__optimizing" / "part-junk.parquet").write_bytes(b"xx")
    assert recover_optimize(spark, path) == "cleaned_debris"
    assert _rows(spark, path) == before
    assert not (tmp_path / "sink__optimizing").exists()


def test_recover_between_renames_finishes_swap(spark, tmp_path):
    # crash between rename 2 and 3: path missing, tmp COMPLETE (_SUCCESS)
    import os

    path = _fragmented(spark, tmp_path)
    before = _rows(spark, path)
    _simulate_states(spark, path)
    os.rename(path, f"{path}__old")
    assert recover_optimize(spark, path) == "finished_swap"
    assert _rows(spark, path) == before
    assert len(spark.read.parquet(path).inputFiles()) == 2
    assert not (tmp_path / "sink__old").exists()


def test_recover_incomplete_tmp_rolls_back(spark, tmp_path):
    # crash after rename 2 with an INCOMPLETE tmp (no _SUCCESS): the
    # original comes back, the partial copy is discarded
    import os

    path = _fragmented(spark, tmp_path)
    before = _rows(spark, path)
    _simulate_states(spark, path)
    os.remove(f"{path}__optimizing/_SUCCESS")
    os.rename(path, f"{path}__old")
    assert recover_optimize(spark, path) == "rolled_back"
    assert _rows(spark, path) == before
    assert not (tmp_path / "sink__optimizing").exists()


def test_recover_after_swap_cleans_old(spark, tmp_path):
    # crash between rename 3 and the old-dir delete
    import os

    path = _fragmented(spark, tmp_path)
    before = _rows(spark, path)
    _simulate_states(spark, path)
    os.rename(path, f"{path}__old2_tmphold")  # stand-in for the window:
    os.rename(f"{path}__optimizing", path)
    os.rename(f"{path}__old2_tmphold", f"{path}__old")
    assert recover_optimize(spark, path) == "cleaned_debris"
    assert _rows(spark, path) == before
    assert not (tmp_path / "sink__old").exists()


def test_recover_nothing_to_heal_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="nothing to heal"):
        recover_optimize(spark, str(tmp_path / "absent"))
