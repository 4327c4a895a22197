"""Deterministic, oracle-checkable sketch operators.

Spark ships opaque sketch aggregates (``approx_count_distinct`` = HLL++,
``percentile_approx`` = GK) whose *bits* are engine-specific — x22 checks
those via accuracy bounds. This module is the complementary surface: the
sketches a 100 TB curation pipeline wants to *own* — build once, persist,
merge across days, probe cheaply — implemented from scratch on md5-derived
hashes so every register/counter/bit is an exact integer that DuckDB can
reproduce, making the whole sketch value-hash checkable (not just
bound-checkable).

Scale design (all three):
- sketch state is FIXED SIZE (m registers / d×w counters / m-bit bitmap),
  so the build is a map-side partial aggregation over bounded key space —
  the shuffle moves O(sketch) bytes per partition, never O(rows);
- sketches are MERGEABLE (max / sum / bit_or), i.e. daily sketches union
  into monthly ones with the same aggregation expression;
- probes are map-only against a broadcast (driver pull is the sketch
  itself — kilobytes, the same bounded-pull contract as the IVF
  centroids in similarity.py).

Reference parity note: the reference's only sketch is a 350-sample
latency reservoir (flink-job SentinelMetrics.java:35-38); these operators
are engine extensions (SURVEY §2.6) designed for the training-data
pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared md5-derived hash columns (Spark side). The DuckDB twin of
#   _hex_slice(c, pos, n)           is  substr(md5(c), pos, n)
#   _hash_int(c, pos, n)            is  CAST(('0x' || substr(md5(c), pos, n)) AS BIGINT)
# Both engines parse the same hex digits of the same md5, so every derived
# integer is identical by construction. n ≤ 15 keeps the value < 2^60
# (positive in a signed 64-bit long on both engines).
# ---------------------------------------------------------------------------


def _hash_int(col, pos: int, n: int):
    """Integer value of md5(col)[pos : pos+n] (1-based, n hex digits)."""
    return F.conv(F.substring(F.md5(col), pos, n), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) with explicit registers.
# ---------------------------------------------------------------------------

HLL_M = 256          # registers (p = 8 bits = 2 hex digits)
_HLL_SUFFIX_BITS = 48  # 12 hex digits of hash tail used for the rho scan
_HLL_RHO_EMPTY = _HLL_SUFFIX_BITS + 1  # all-zero suffix


def _hll_alpha_m2_scaled() -> float:
    """alpha_m * m^2 * 2^(SUFFIX_BITS+1) as one double literal.

    The harmonic denominator is kept as the exact integer
    S = Σ 2^(49 - rho_j)  (empty registers contribute 2^49), so the raw
    estimate is a SINGLE IEEE division C / S — bit-identical on any
    engine that parses the same decimal literal for C.
    """
    m = HLL_M
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (_HLL_SUFFIX_BITS + 1))


def hll_rho(suffix_hex):
    """Position of the leftmost 1-bit (1-based) in the 48-bit value spelled
    by 12 hex digits — computed with *integer/string ops only* (no log2:
    float logs are not guaranteed bit-identical across engines).

    nibble-level scan: strip leading '0' hex digits, then a 4-way CASE on
    the first surviving digit. rho = 4·(zero nibbles) + lz(nibble) + 1.
    """
    stripped = F.regexp_replace(suffix_hex, "^0+", "")
    nz = F.length(stripped)                      # surviving hex digits
    first = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    nib_lz = (
        F.when(first >= 8, 0)
        .when(first >= 4, 1)
        .when(first >= 2, 2)
        .otherwise(3)
    )
    return (
        F.when(nz == 0, F.lit(_HLL_RHO_EMPTY))
        .otherwise((12 - nz) * 4 + nib_lz + 1)
        .cast("int")
    )


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group HLL register table: (group…, register, max_rho).

    At most ``HLL_M`` rows per group regardless of input size — the
    groupBy's partial aggregation collapses each map partition to the
    register table before the shuffle, so this is the O(sketch)-shuffle
    path that replaces COUNT(DISTINCT)'s row expansion at scale. Register
    tables for disjoint inputs MERGE with the same max() aggregation.
    """
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rho = hll_rho(F.substring(h, 3, 12))
    return (
        df.select(*group_cols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Register table → (group…, hll_estimate, registers_zero, harmonic_scaled).

    Deterministic across engines: the harmonic denominator is an exact
    integer; the raw estimate is one literal/integer division; the
    small-range (linear counting) branch rounds m·ln(m/V) to a whole
    count, so the only float transcendental is followed by an integer
    round (V takes at most m distinct values — divergence would need two
    correctly-rounded ln implementations to differ by ~1e-10 exactly at
    a .5 boundary).
    """
    c_lit = F.lit(_hll_alpha_m2_scaled())
    per_group = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(
            # python-side shiftleft requires a literal shift; the SQL
            # function form takes a column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SUFFIX_BITS + 1} - max_rho)")
        ).alias("_s_present"),
    )
    v = (F.lit(HLL_M) - F.col("_present")).alias("registers_zero")
    s = (
        F.col("_s_present")
        + (HLL_M - F.col("_present")) * F.lit(1 << (_HLL_SUFFIX_BITS + 1)).cast("long")
    ).alias("harmonic_scaled")
    raw = c_lit / F.col("harmonic_scaled")
    linear = F.round(HLL_M * F.log(F.lit(float(HLL_M)) / F.col("registers_zero")))
    est = (
        F.when(
            (F.col("registers_zero") > 0) & (raw <= 2.5 * HLL_M), linear
        )
        .otherwise(F.round(raw))
        .cast("long")
        .alias("hll_estimate")
    )
    return per_group.select(*group_cols, v, s).select(
        *group_cols, est, "registers_zero", "harmonic_scaled"
    )


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """End-to-end per-group approximate distinct count with explicit,
    engine-portable HLL registers (m=256, rsd ≈ 6.5 %)."""
    return hll_estimate(hll_registers(df, group_cols, value_col), group_cols)


def hll_oracle_sql(
    table: str, group_col: str, value_col: str, out_name: str | None = None
) -> str:
    """DuckDB twin of :func:`hll_distinct` (same registers, same branch).
    ``group_col`` may be any SQL expression; ``out_name`` names the
    emitted group column. It defaults to the expression text, which is
    only valid SQL for a bare identifier — so a non-identifier
    expression REQUIRES ``out_name`` (asserted here rather than letting
    DuckDB fail on ``SELECT g AS <expression>``)."""
    assert out_name or group_col.isidentifier(), (
        f"group_col {group_col!r} is an expression: pass out_name to name "
        "the emitted group column"
    )
    c = repr(_hll_alpha_m2_scaled())
    scale = 1 << (_HLL_SUFFIX_BITS + 1)
    return f"""
    WITH h AS (
      SELECT {group_col} AS g, md5(CAST({value_col} AS VARCHAR)) AS hx
      FROM {table}),
    rho AS (
      SELECT g,
             CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS register,
             CASE WHEN length(regexp_replace(substr(hx, 3, 12), '^0+', '')) = 0
                  THEN {_HLL_RHO_EMPTY}
                  ELSE (12 - length(regexp_replace(substr(hx, 3, 12), '^0+', ''))) * 4
                       + (CASE
                            WHEN CAST(('0x' || substr(regexp_replace(substr(hx, 3, 12), '^0+', ''), 1, 1)) AS INT) >= 8 THEN 0
                            WHEN CAST(('0x' || substr(regexp_replace(substr(hx, 3, 12), '^0+', ''), 1, 1)) AS INT) >= 4 THEN 1
                            WHEN CAST(('0x' || substr(regexp_replace(substr(hx, 3, 12), '^0+', ''), 1, 1)) AS INT) >= 2 THEN 2
                            ELSE 3
                          END) + 1
             END AS rho
      FROM h),
    regs AS (
      SELECT g, register, MAX(rho) AS max_rho FROM rho GROUP BY 1, 2),
    agg AS (
      SELECT g,
             {HLL_M} - COUNT(*) AS registers_zero,
             CAST(SUM((CAST(1 AS BIGINT) << ({_HLL_SUFFIX_BITS + 1} - max_rho)))
               + ({HLL_M} - COUNT(*)) * CAST({scale} AS BIGINT) AS BIGINT)
               AS harmonic_scaled
      FROM regs GROUP BY 1)
    SELECT g AS {out_name or group_col},
           CAST(CASE WHEN registers_zero > 0
                      AND {c} / harmonic_scaled <= {2.5 * HLL_M}
                     THEN ROUND({HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / registers_zero))
                     ELSE ROUND({c} / harmonic_scaled)
                END AS BIGINT) AS hll_estimate,
           registers_zero, harmonic_scaled
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 4096  # 3 hex digits


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """(depth, bucket, counter) count-min table over the rows of ``df``.

    ≤ depth × width rows total (16 384 here) whatever the input size:
    the explode multiplies rows by depth *inside the map stage*, and the
    bounded-cardinality groupBy collapses them to the sketch before the
    shuffle. Sketches from disjoint inputs merge by summing counters.
    """
    key = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("depth"),
        key.alias("_k"),
    )
    bucket = _hash_int(
        F.concat(F.lit("cm"), F.col("depth").cast("string"), F.lit(":"), F.col("_k")),
        1,
        3,
    )
    return (
        rows.select("depth", bucket.alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-estimate each key's count: min over the depth rows.

    The SKETCH is the broadcast side (bounded at depth × width rows),
    so ``keys`` may be arbitrarily large — each probe row left-joins
    its depth positions locally. Estimates are exact-or-over
    (one-sided error), never under — pinned in tests.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("depth"),
    ).select(
        key_col,
        "depth",
        _hash_int(
            F.concat(
                F.lit("cm"),
                F.col("depth").cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            ),
            1,
            3,
        ).alias("bucket"),
    )
    return (
        # LEFT join from the probe side with counter->0 on miss: a
        # never-inserted key whose buckets are all untouched must
        # estimate 0, not vanish from the output (and a key with SOME
        # empty buckets must min against 0, not only the occupied
        # counters). The sketch is bounded (depth x width rows) so it
        # is the broadcast side.
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0).cast("long"))).alias(
                "cms_estimate"
            )
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter build + map-only probe (join pruning).
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # 65 536 bits = 1 024 longs = 8 KiB
BLOOM_K = 3


def _bloom_positions(key, hashes: int = BLOOM_K):
    """k bit positions in [0, BLOOM_BITS) for a key, from native
    ``xxhash64(key, seed_i)`` masked to 16 bits.

    Unlike the HLL/CMS hashes, these are deliberately NOT the portable
    md5 construction: the bloom's correctness contract (zero false
    negatives ⇒ pruned-join ≡ unpruned-join) is oracle-checked THROUGH
    the join result, so the bit positions never need cross-engine
    reproduction — and the JVM-native hash makes the probe ~6× faster
    (measured 0.9 s vs 5.8 s over 600 k rows: md5 allocates a hex
    string per row per hash; xxhash64 stays in codegen registers)."""
    return [
        F.xxhash64(key, F.lit(i)).bitwiseAND(F.lit(BLOOM_BITS - 1))
        for i in range(hashes)
    ]


def bloom_build(df: DataFrame, key_col: str) -> list[int]:
    """Aggregate the build side into a 1 024-word bitmap and pull it to
    the driver (8 KiB — the same bounded-pull contract as IVF centroids;
    this IS how Spark's own runtime bloom filters ship: an aggregated
    bitmap broadcast to the probe side)."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.expr("shiftrightunsigned(pos, 6)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    bitmap = [0] * (BLOOM_BITS // 64)
    for r in words:
        bitmap[r["word_idx"]] = r["word"]
    return bitmap


def bloom_prune(df: DataFrame, key_col: str, bitmap: list[int]) -> DataFrame:
    """Filter ``df`` to rows whose key might be in the build set — a
    map-only membership test against the literal bitmap (array lookup +
    bit ops, pure codegen: no join, no shuffle). False positives pass
    (removed by the real join downstream); false negatives are
    impossible — so `bloom_prune(probe) ⋈ build ≡ probe ⋈ build`,
    which is what makes the pruned join exactly oracle-checkable."""
    # one array LITERAL (not CreateArray of 1024 child expressions —
    # that costs a per-row array materialization, measured +2.5 s/600 k)
    arr = F.lit([int(w) for w in bitmap])
    out = df.withColumn("_bl_arr", arr)
    names = []
    for i, pos in enumerate(_bloom_positions(F.col(key_col))):
        names.append(f"_bl_pos{i}")
        out = out.withColumn(names[-1], pos)
    # bitwise & 1, not % 2: Spark's % keeps the dividend's sign, so a
    # still-negative word (bit 63 set, shift 0) would test -1, never 1
    cond = " AND ".join(
        f"(shiftrightunsigned(element_at(_bl_arr,"
        f" CAST(shiftrightunsigned({n}, 6) + 1 AS INT)),"
        f" CAST({n} % 64 AS INT)) & CAST(1 AS BIGINT)) = 1"
        for n in names
    )
    return out.filter(F.expr(cond)).drop("_bl_arr", *names)
