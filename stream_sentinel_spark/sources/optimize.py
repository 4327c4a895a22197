"""Small-file OPTIMIZE for plain parquet sink directories.

The engine's bucketed tables already have a compaction story
(``compact_bucketed`` — Exchange-free one-file-per-bucket rewrite under
a swap-and-recover protocol). Its PLAIN sinks do not: the ingest loops
append one-or-more files per epoch to ``accepted_path`` /
``matches_path``-style directories, and at production cadence that is
the classic lakehouse small-file problem — a year of 1-minute epochs is
half a million files whose per-file open cost eventually dwarfs the
data. This module is the ``OPTIMIZE`` half (Delta's OPTIMIZE, Iceberg's
rewrite_data_files) for those directories:

- :func:`optimize_parquet_dir` rewrites the directory's content into
  ``target_files`` files (content-preserving — rows in, rows out; the
  tests pin exceptAll-both-ways equality) and swaps the new directory
  in.
- A plain directory has no transaction log, so an IN-PLACE atomic
  file-set swap is impossible — that impossibility is why table formats
  exist. The honest primitive that remains is the DIRECTORY rename, and
  the protocol uses two of them with a completeness witness:

  1. write the compacted copy to ``{path}__optimizing`` (Spark's
     ``_SUCCESS`` marker in it is the job-completeness witness);
  2. rename ``path`` → ``{path}__old``;
  3. rename ``{path}__optimizing`` → ``path``;
  4. delete ``{path}__old``.

  Every crash point heals in :func:`recover_optimize` (run it before
  reads/writes after a crash, and it runs on every optimize entry):
  a partial tmp with the source intact is deleted; a missing ``path``
  restores from tmp if (and only if) tmp carries ``_SUCCESS``, else
  from ``__old``; a leftover ``__old`` after a completed swap is
  deleted. The one non-atomic window is between renames 2 and 3: a
  CONCURRENT reader can observe a missing directory and fail loudly —
  never read duplicated or partial data. Run optimize when the sink is
  quiescent (the ingest loops take epochs, so between epochs), exactly
  like the bucketed compactions run at epoch boundaries.

Scale shape: one read + one write of the directory's content (the same
cost every table format pays for OPTIMIZE), a repartition to the target
file count, and O(1) renames. At 100 TB you run it per partition
directory on a schedule, not globally — the function takes one
directory on purpose. After optimizing, rebuild any zone-map index
(sources/skipping.py documents the staleness contract: the pruned read
RAISES on vanished files rather than under-reading).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_sentinel_spark.streaming.exactly_once import _hadoop_fs

__all__ = ["optimize_parquet_dir", "recover_optimize"]


def _tmp(path: str) -> str:
    return f"{path.rstrip('/')}__optimizing"


def _old(path: str) -> str:
    return f"{path.rstrip('/')}__old"


def _exists(spark: SparkSession, p: str) -> bool:
    fs, hp = _hadoop_fs(spark, p)
    return fs.exists(hp)


def _delete(spark: SparkSession, p: str) -> None:
    fs, hp = _hadoop_fs(spark, p)
    if fs.exists(hp):
        fs.delete(hp, True)


def _rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, s = _hadoop_fs(spark, src)
    _, d = _hadoop_fs(spark, dst)
    if not fs.rename(s, d):  # pragma: no cover - FS race
        raise IOError(f"could not rename {src} -> {dst}")


def _has_success(spark: SparkSession, p: str) -> bool:
    return _exists(spark, f"{p.rstrip('/')}/_SUCCESS")


def recover_optimize(spark: SparkSession, path: str) -> str:
    """Heal a crashed :func:`optimize_parquet_dir` swap on ``path``.
    Idempotent; returns the action taken (``"clean"`` when nothing was
    pending). The decision table covers every crash point:

    - ``path`` present: any ``__optimizing``/``__old`` leftovers are
      debris of a crash before rename 2 or after rename 3 — delete
      them (``"cleaned_debris"``).
    - ``path`` missing, tmp complete (``_SUCCESS``): the crash hit
      between renames 2 and 3 with the new content fully written —
      finish the swap (``"finished_swap"``).
    - ``path`` missing, tmp absent or incomplete: roll back to the
      original (``"rolled_back"``).
    """
    path = path.rstrip("/")
    tmp, old = _tmp(path), _old(path)
    if _exists(spark, path):
        if _exists(spark, tmp) or _exists(spark, old):
            _delete(spark, tmp)
            _delete(spark, old)
            return "cleaned_debris"
        return "clean"
    if _exists(spark, tmp) and _has_success(spark, tmp):
        _rename(spark, tmp, path)
        _delete(spark, old)
        return "finished_swap"
    if _exists(spark, old):
        _delete(spark, tmp)
        _rename(spark, old, path)
        return "rolled_back"
    raise FileNotFoundError(
        f"recover_optimize: neither {path!r} nor a recoverable "
        "__old/__optimizing sibling exists — nothing to heal"
    )


def optimize_parquet_dir(
    spark: SparkSession,
    path: str,
    target_files: int,
    schema=None,
) -> dict:
    """Rewrite the parquet directory ``path`` into ``target_files``
    files, content-preserved, under the swap-and-recover protocol in
    the module doc. ``schema`` pins the read schema (pass the writer's
    schema when the directory may contain all-null columns whose types
    inference would widen). Returns ``{"files_before", "files_after",
    "rows"}``. The sink must be quiescent — run between epochs, like
    every other compaction in this engine."""
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    path = path.rstrip("/")
    recover_optimize(spark, path)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    src: DataFrame = reader.parquet(path)
    files_before = len(src.inputFiles())
    tmp, old = _tmp(path), _old(path)
    src.repartition(target_files).write.parquet(tmp)
    _rename(spark, path, old)
    _rename(spark, tmp, path)
    _delete(spark, old)
    out = (
        spark.read.schema(schema) if schema is not None else spark.read
    ).parquet(path)
    return {
        "files_before": files_before,
        "files_after": len(out.inputFiles()),
        "rows": out.count(),
    }
