"""File-level DATA SKIPPING — zone maps over an immutable parquet file
set, and the pruned read that uses them.

Parquet footers already carry row-group min/max stats, but at 100 TB a
selective scan still pays one footer OPEN per file — millions of object
-store GETs before a single data page is read. Every production table
format (Iceberg manifests, Delta ``stats`` in the transaction log, Hudi
column-stats index) therefore hoists those stats one level up, into a
small index the PLANNER reads instead: prune the file list first, hand
the scan only the survivors. This module is that pattern on plain
parquet:

- :func:`file_zone_maps` computes the index — per file, per declared
  column: typed min / max / null count, plus the file row count — in
  ONE pass over the data (a ``groupBy(input_file_name())`` with
  map-side partial aggregation; output is O(files × columns), the
  natural thing to persist next to the data and refresh on compaction).
- :func:`prune_files` evaluates closed-interval predicates against the
  index: a file survives when every predicated column's [min, max]
  intersects its interval (all-null files drop — a range predicate
  can't match NULL).
- :func:`read_pruned` reads ONLY the surviving files and re-applies the
  predicate exactly (the RESIDUAL filter): zone-map pruning is a
  file-granularity superset selection, so correctness never depends on
  it — a wrong/stale index can only fail loudly via the staleness
  check, never silently wrong, and an unclustered layout degrades to
  reading everything, not to wrong answers. tests/test_skipping.py pins
  both directions: result ≡ plain filtered read, AND the scan's
  inputFiles really shrink on a range-clustered layout.

The index is valid for an IMMUTABLE file set (the same contract as
Iceberg manifests): recompute after compaction or any rewrite;
:func:`read_pruned` raises when a predicated file has vanished rather
than silently under-reading. Layout determines effectiveness, not
correctness: ``repartitionByRange`` / Z-order (x63) cluster values so
file intervals are narrow; a random layout leaves every file's interval
wide and nothing prunes.

Scale shape: the stats build is one full scan (amortized: build at
write time or from the writer's own frame); every subsequent selective
read costs one filter over the O(files) index plus a driver pull of the
SURVIVING file names only (bounded by the predicate's selectivity — the
pruned-in set is what the scan must enumerate anyway), then a scan that
never opens a pruned file. Reference anchor: the reference scans full
topics and filters per event (core-engine RuleEvaluator); this is the
batch-side index that makes the same predicate sublinear at rest.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "file_zone_maps",
    "prune_files",
    "read_pruned",
    "refresh_zone_maps",
]

_FILE = "_file"


def file_zone_maps(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """The zone-map index of ``df``'s backing files: one row per file —
    ``(_file, n_rows, {c}__min, {c}__max, {c}__nulls …)`` with min/max
    in the column's own type (string stats compare lexicographically,
    exactly as the pruning predicate will). ``df`` must be a plain
    file scan (``input_file_name()`` is empty under joins or after
    shuffles — raise early rather than emit a garbage index)."""
    if not cols:
        raise ValueError("file_zone_maps needs at least one column")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
        ]
    out = df.groupBy(F.input_file_name().alias(_FILE)).agg(*aggs)
    return out.filter(F.col(_FILE) != "")


def _interval(pred) -> tuple:
    try:
        lo, hi = pred
    except (TypeError, ValueError):
        raise ValueError(
            f"predicate must be a (lo, hi) pair, got {pred!r}"
        ) from None
    if lo is None and hi is None:
        raise ValueError(
            "predicate (None, None) matches everything — drop the column "
            "from the predicates instead of passing an unbounded interval"
        )
    return lo, hi


def prune_files(zone_maps: DataFrame, predicates: Mapping[str, tuple]) -> DataFrame:
    """The surviving subset of the zone-map index under closed-interval
    predicates ``{col: (lo, hi)}`` (either bound None = open on that
    side, not both). A file survives when every predicated column's
    [min, max] INTERSECTS its interval; a column that is all-NULL in a
    file can never satisfy a range predicate, so such files drop."""
    if not predicates:
        raise ValueError("prune_files needs at least one predicate")
    keep = F.lit(True)
    for c, pred in predicates.items():
        lo, hi = _interval(pred)
        if f"{c}__min" not in zone_maps.columns:
            raise ValueError(
                f"zone-map index has no stats for column {c!r} — rebuild "
                "file_zone_maps with it included"
            )
        # min/max are NULL iff the file is all-null for c: the NULL
        # comparison result conjoins to NULL and the filter drops it
        cond = F.col(f"{c}__min").isNotNull()
        if hi is not None:
            cond = cond & (F.col(f"{c}__min") <= F.lit(hi))
        if lo is not None:
            cond = cond & (F.col(f"{c}__max") >= F.lit(lo))
        keep = keep & cond
    return zone_maps.filter(keep)


def read_pruned(
    spark: SparkSession,
    zone_maps: DataFrame,
    predicates: Mapping[str, tuple],
    schema,
) -> DataFrame:
    """Selective read through the zone-map index: prune the file list,
    scan ONLY the survivors under ``schema`` (the writer's schema — the
    index knows files, not types), then re-apply the predicate exactly
    as a residual filter, so the result equals a plain filtered read of
    the full file set regardless of layout. Raises if a surviving file
    no longer exists (stale index — rebuild after compaction); returns
    an empty frame of ``schema`` when nothing survives."""
    survivors = [r[0] for r in prune_files(zone_maps, predicates).select(_FILE).collect()]
    residual = F.lit(True)
    for c, pred in predicates.items():
        lo, hi = _interval(pred)
        cond = F.col(c).isNotNull()
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
        residual = residual & cond
    if not survivors:
        return spark.createDataFrame([], schema)
    from stream_sentinel_spark.streaming.exactly_once import _hadoop_fs

    jvm = spark.sparkContext._jvm
    fs, _ = _hadoop_fs(spark, survivors[0])
    missing = [
        f for f in survivors
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f))
    ]
    if missing:
        raise FileNotFoundError(
            f"zone-map index is stale: {len(missing)} pruned-in files are "
            f"gone (e.g. {missing[:2]}) — rebuild file_zone_maps after "
            "compaction or rewrite"
        )
    return spark.read.schema(schema).parquet(*survivors).filter(residual)


def refresh_zone_maps(
    zone_maps: DataFrame, df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Incrementally extend the index after an APPEND: stat only the
    files of ``df`` the index doesn't know yet, union with the existing
    rows. An append-only table at 100 TB refreshes its skipping index
    at the cost of the new partition, never a full re-scan; after a
    COMPACTION or rewrite (files removed), rebuild with
    :func:`file_zone_maps` instead — this function only ever adds."""
    known = zone_maps.select(F.col(_FILE).alias("__known"))
    fresh = (
        df.withColumn(_FILE, F.input_file_name())
        .join(
            F.broadcast(known),
            F.col(_FILE) == F.col("__known"),
            "left_anti",
        )
        .drop(_FILE)
    )
    return zone_maps.unionByName(file_zone_maps(fresh, cols))
