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
    "file_bloom_maps",
    "file_zone_maps",
    "prune_files",
    "prune_files_bloom",
    "read_pruned",
    "read_pruned_bloom",
    "refresh_bloom_maps",
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
    _require_files_exist(spark, survivors)
    return spark.read.schema(schema).parquet(*survivors).filter(residual)


def _require_files_exist(spark: SparkSession, survivors: Sequence[str]) -> None:
    """The staleness gate shared by every pruned read: a pruned-in file
    that vanished means the index predates a compaction/rewrite — fail
    loudly, never under-read."""
    from stream_sentinel_spark.streaming.exactly_once import _hadoop_fs

    jvm = spark.sparkContext._jvm
    fs, _ = _hadoop_fs(spark, survivors[0])
    missing = [
        f for f in survivors
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f))
    ]
    if missing:
        raise FileNotFoundError(
            f"skipping index is stale: {len(missing)} pruned-in files are "
            f"gone (e.g. {missing[:2]}) — rebuild the index after "
            "compaction or rewrite"
        )


def refresh_zone_maps(
    zone_maps: DataFrame, df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Incrementally extend the index after an APPEND: stat only the
    files of ``df`` the index doesn't know yet, union with the existing
    rows. An append-only table at 100 TB refreshes its skipping index
    at the cost of the new partition, never a full re-scan; after a
    COMPACTION or rewrite (files removed), rebuild with
    :func:`file_zone_maps` instead — this function only ever adds."""
    # checkpoint the O(files) name list: a parquet-PERSISTED index in
    # the anti-join would otherwise put a second file source under the
    # same plan as input_file_name(), which Spark rejects outright
    # (MULTI_SOURCES_UNSUPPORTED_FOR_EXPRESSION)
    known = zone_maps.select(F.col(_FILE).alias("__known")).localCheckpoint(
        eager=True
    )
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


# ---------------------------------------------------------------------------
# Bloom-filter file skipping: the point-lookup complement to zone maps.
# ---------------------------------------------------------------------------

BLOOM_FILE_K = 3
_BLOOM_BITS_PER_KEY = 16  # with k=3: fp ≈ 0.13% per (value, file)
_BLOOM_MIN_BITS = 1 << 10
_BLOOM_MAX_BITS = 1 << 26  # 8 MiB/file hard cap


def _file_bloom_positions(col, bits_minus_1, hashes: int) -> list:
    """k bit positions for one value: native ``xxhash64(cast(v AS
    string), seed_i)`` masked to the filter width. Values hash through
    their STRING form so the probe literal needs no knowledge of the
    column's physical type (int32 vs int64 hash differently raw — cast
    first and ``5`` probes a bigint column correctly); the cast costs
    one allocation per row in the one-off index build, nothing at probe
    time. ``bits_minus_1`` is an EXPRESSION, not a constant — each
    file's own width rides the index row, so differently-sized files
    coexist in one index (the auto-sizing below depends on this).
    NULLs never reach this (filtered in the build; an equality probe
    value must be non-null)."""
    s = col.cast("string")
    return [
        F.xxhash64(s, F.lit(i)).bitwiseAND(bits_minus_1)
        for i in range(hashes)
    ]


def _bloom_word(pos):
    # call_function: PySpark's F.shiftleft only accepts a literal int
    # for the shift amount, but the amount here is itself an expression
    return (
        F.shiftright(pos, 6).cast("int").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        ).alias("mask"),
    )


def file_bloom_maps(
    df: DataFrame,
    column: str,
    bits: int | str = "auto",
    hashes: int = BLOOM_FILE_K,
) -> DataFrame:
    """The bloom-filter skipping index of ``df``'s backing files for
    EQUALITY probes on ``column`` — what zone maps cannot serve: a
    high-cardinality key scattered by a layout clustered on some OTHER
    axis leaves every file's [min, max] spanning the whole domain, yet
    each file holds only its own distinct keys, which a per-file bitmap
    captures with sub-percent false positives. This is Parquet's
    optional column bloom filter (PARQUET-41) hoisted to the planner's
    index, exactly as :func:`file_zone_maps` hoists the footer min/max
    — Delta's bloom-filter index and Hudi's bloom index do the same.

    **Sizing is per file and measured, not guessed** (``bits="auto"``,
    the default): the same pass that counts rows takes an
    ``approx_count_distinct`` per file, and each file's width is the
    next power of two above ``ndv × 16`` bits (clamped to [2^10,
    2^26]). A FIXED width has a saturation cliff — 8 KiB is <1% fp at
    ~850 keys but EVERY BIT SET at ~300 k keys, measured pruning
    nothing at 20 M rows / 64 files (STRESS_r09_ops3) — and the right
    width is a property of each file's content, not of the table.
    Explicit int ``bits`` (power of two) pins every file to one width
    instead; only the literal ``"auto"`` measures. The probe never
    needs to know: each row carries its own ``_bloom_bits`` and the
    probe masks against THAT column, so mixed widths coexist.

    Stored SPARSE (``map<int, bigint>`` of touched 64-bit words), plus
    ``n_rows`` / ``{column}__nulls`` so every file appears even when
    all-null (an absent file would silently never be read; an all-null
    file's NULL map prunes it — equality with NULL never matches,
    which ``coalesce(element_at(...), 0)`` encodes for free).
    ``_bloom_hashes`` also rides every row: probe and refresh derive
    the hash family from the index instead of trusting a caller to
    repeat it (a mismatched family would be a silent false negative —
    the one failure mode a bloom must never have).

    Same immutable-file-set contract as zone maps: refresh on append
    via :func:`refresh_bloom_maps`, rebuild after compaction.
    """
    if column not in df.columns:
        raise ValueError(f"file_bloom_maps: no column {column!r} in frame")
    if bits == "auto":
        target = F.greatest(
            F.col("__ndv").cast("bigint") * _BLOOM_BITS_PER_KEY,
            F.lit(_BLOOM_MIN_BITS).cast("bigint"),
        )
        bits_expr = F.least(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.ceil(F.log2(target)).cast("int"),
            ),
            F.lit(_BLOOM_MAX_BITS).cast("bigint"),
        )
    elif isinstance(bits, int) and not isinstance(bits, bool):
        if bits < 64 or bits & (bits - 1):
            raise ValueError(f"bits must be a power of two ≥ 64, got {bits}")
        bits_expr = F.lit(bits).cast("bigint")
    else:
        raise ValueError(f"bits must be an int or 'auto', got {bits!r}")
    files = (
        df.groupBy(F.input_file_name().alias(_FILE))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(column).isNull().cast("long")).alias(f"{column}__nulls"),
            F.approx_count_distinct(column).alias("__ndv"),
        )
        .filter(F.col(_FILE) != "")
        .withColumn("_bloom_bits", bits_expr)
        .drop("__ndv")
        # O(files) rows consumed twice below (the width join + the
        # final assembly): checkpoint so the corpus isn't re-scanned
        .localCheckpoint(eager=True)
    )
    pos = F.explode(
        F.array(
            *_file_bloom_positions(
                F.col(column), F.col("_bloom_bits") - 1, hashes
            )
        )
    ).alias("pos")
    word_idx, mask = _bloom_word(F.col("pos"))
    words = (
        df.filter(F.col(column).isNotNull())
        .select(F.input_file_name().alias(_FILE), F.col(column))
        .join(F.broadcast(files.select(_FILE, "_bloom_bits")), _FILE)
        .select(_FILE, pos)
        .select(_FILE, word_idx, mask)
        .groupBy(_FILE, "word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .groupBy(_FILE)
        .agg(
            F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias(
                f"{column}__bloom"
            )
        )
    )
    # the left join leaves an all-null file's map NULL — the probe's
    # coalesce(element_at(...), 0) reads that as "no bit set", which is
    # exactly the file's truth
    return (
        files.join(words, _FILE, "left")
        .withColumn("_bloom_hashes", F.lit(hashes))
    )


def _bloom_hash_count(bloom_maps: DataFrame) -> int | None:
    """The index's own hash-family size — one bounded head(1) pull; the
    build stamps every row identically and refresh re-uses this, so the
    first row speaks for all (widths vary per file by design; the
    NUMBER of hashes cannot, because it fixes the probe's expression
    count). None for an empty index."""
    head = bloom_maps.select("_bloom_hashes").head(1)
    return head[0][0] if head else None


def prune_files_bloom(
    bloom_maps: DataFrame, column: str, values: Sequence
) -> DataFrame:
    """The surviving subset of the bloom index under an equality probe
    ``column IN values``: a file survives when for AT LEAST ONE probe
    value all k hash bits are set in its map (sparse lookup — an
    untouched word reads as 0; each row masks against its OWN
    ``_bloom_bits`` width). False positives pass (the residual filter
    removes their rows); false negatives are impossible for any file
    the index stats — so the pruned read equals the plain filtered read
    by construction. Probe values must be non-null (equality with NULL
    matches nothing — raise rather than silently drop)."""
    vals = list(values)
    if not vals:
        raise ValueError("prune_files_bloom needs at least one probe value")
    if any(v is None for v in vals):
        raise ValueError("bloom probe values must be non-null")
    if f"{column}__bloom" not in bloom_maps.columns:
        raise ValueError(
            f"bloom index has no filter for column {column!r} — rebuild "
            "file_bloom_maps with it"
        )
    hashes = _bloom_hash_count(bloom_maps)
    if hashes is None:
        return bloom_maps
    # DEDUPE the probe list: the membership test below counts matched
    # probe rows per (file, value) against exactly k — a duplicated
    # value would double its rows and break the count
    vals = list(dict.fromkeys(vals))
    # The probe is a HASH JOIN, not a per-row map lookup: Spark's
    # element_at on a map is a LINEAR key scan, so an expression-side
    # probe pays O(map entries) per (row, value, hash) — measured
    # 10-14 s against a 64-file index whose auto-sized maps hold ~131 k
    # words each, with the 0.9 s full 20 M-row scan standing right next
    # to it. Exploding the maps once and hash-joining a tiny broadcast
    # probe table costs O(index words + matches) instead, independent
    # of both map width and probe-list length.
    #
    # The probe table is (distinct widths × values × k) rows — widths,
    # not files: bit positions depend only on (value, width), so a
    # million-file index with one width probes through one row per
    # (value, hash).
    spark = bloom_maps.sparkSession
    vals_df = spark.createDataFrame([(v,) for v in vals]).toDF("__v")
    widths = bloom_maps.select("_bloom_bits").distinct()
    pos_arr = F.array(
        *_file_bloom_positions(F.col("__v"), F.col("_bloom_bits") - 1, hashes)
    )
    probes = (
        widths.crossJoin(F.broadcast(vals_df))
        .select("_bloom_bits", "__v", F.posexplode(pos_arr).alias("_h", "_p"))
    )
    word_idx, mask = _bloom_word(F.col("_p"))
    probes = probes.select("_bloom_bits", "__v", word_idx, mask)
    words = bloom_maps.select(
        _FILE, "_bloom_bits", F.explode(F.col(f"{column}__bloom"))
    ).toDF(_FILE, "_bloom_bits", "word_idx", "word")
    # a word row absent for a probed word_idx means the bit is unset —
    # the inner join drops it, so the per-(file, value) match count
    # reaches k iff EVERY hash's bit is set (duplicate positions within
    # one value's hashes stay safe: each probe row passes or fails on
    # its own bit, and the count target is the row count k)
    hits = (
        words.join(F.broadcast(probes), ["_bloom_bits", "word_idx"])
        .filter(F.col("word").bitwiseAND(F.col("mask")) != 0)
        .groupBy(_FILE, "__v")
        .agg(F.count(F.lit(1)).alias("_nset"))
        .filter(F.col("_nset") == hashes)
    )
    surviving = hits.select(_FILE).distinct()
    return bloom_maps.join(F.broadcast(surviving), _FILE, "semi")


def read_pruned_bloom(
    spark: SparkSession,
    bloom_maps: DataFrame,
    column: str,
    values: Sequence,
    schema,
) -> DataFrame:
    """Point-lookup read through the bloom index: prune the file list,
    scan ONLY the survivors, re-apply ``column IN values`` exactly as
    the residual — same superset-selector contract as
    :func:`read_pruned` (a stale index raises via the same existence
    check; correctness never depends on the pruning). The 100 TB case
    this serves: "fetch these 20 order keys" against a date-clustered
    table opens a handful of files instead of every footer in the
    table."""
    survivors = [
        r[0] for r in prune_files_bloom(bloom_maps, column, values)
        .select(_FILE).collect()
    ]
    if not survivors:
        return spark.createDataFrame([], schema)
    _require_files_exist(spark, survivors)
    residual = F.col(column).isin(list(values))
    return spark.read.schema(schema).parquet(*survivors).filter(residual)


def refresh_bloom_maps(
    bloom_maps: DataFrame, df: DataFrame, column: str
) -> DataFrame:
    """Incrementally extend the bloom index after an APPEND: stat only
    ``df``'s files the index doesn't know, under the INDEX'S OWN hash
    family (never a caller-supplied one — a family mismatch between
    rows would be a silent false negative on probe); each new file
    auto-sizes its own width from its own ndv, exactly as the build
    does. Append-only tables refresh at the cost of the new files;
    rebuild after compaction, as with zone maps."""
    hashes = _bloom_hash_count(bloom_maps)
    if hashes is None:
        return file_bloom_maps(df, column)
    # checkpoint the O(files) name list — same
    # MULTI_SOURCES_UNSUPPORTED_FOR_EXPRESSION guard as
    # refresh_zone_maps: the index may itself be parquet-persisted
    known = bloom_maps.select(F.col(_FILE).alias("__known")).localCheckpoint(
        eager=True
    )
    fresh = (
        df.withColumn(_FILE, F.input_file_name())
        .join(F.broadcast(known), F.col(_FILE) == F.col("__known"), "left_anti")
        .drop(_FILE)
    )
    return bloom_maps.unionByName(
        file_bloom_maps(fresh, column, hashes=hashes)
    )
