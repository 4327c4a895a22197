"""Deterministic sampling operators for dataset curation/mixing.

Training-data pipelines need samples that are REPRODUCIBLE across runs,
engines, and partitionings — `rand()` is none of those. Both operators
here derive the decision from the row's own identity:

- hash sampling: keep a row iff a hash of its id lands under the rate
  cutoff. md5-based so the DuckDB oracle computes the identical bits;
  stable under repartitioning, resumable, and mergeable across
  incremental runs (the sample of a union is the union of samples).
- quota sampling: keep at most N rows per group under a deterministic
  total order (e.g. newest-first) — ROW_NUMBER over the group, one
  shuffle, the standard cap-per-domain curation step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(id_col: str, salt: str) -> Column:
    """Uniform 32-bit bucket from md5(salt ‖ id) — the shared decision
    variable of every sampling operator here. Engine-portable: the
    first 8 hex chars as an integer, reproducible in any SQL engine as
    ``('0x' || substr(md5(salt || id), 1, 8))::BIGINT`` (the generated
    oracles depend on this exact construction — change it in ONE place
    or nowhere)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep ≈ ``rate`` of rows, decided by md5(salt ‖ id) — deterministic
    and engine-portable. Different salts give independent samples."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cutoff = int(rate * (1 << 32))
    return df.filter(_md5_bucket(id_col, salt) < F.lit(cutoff))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing primitive
    (e.g. keep 100% of books, 10% of web crawl, 1% of logs). Same
    md5-bucket decision as :func:`hash_sample`, but the cutoff comes
    from the row's stratum; strata not listed in ``fractions`` fall back
    to ``default_rate`` (0 = drop).

    Scale: map-only — the per-row decision is a hash compare against a
    CASE over the (small, broadcast-as-literals) fractions map; no
    shuffle, no per-stratum pass, stable under repartitioning, and the
    mix of incremental runs is the run of the mixed inputs. The same
    salt across strata reuses one hash computation per row.
    """
    for stratum, rate in fractions.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    bucket = _md5_bucket(id_col, salt)
    cutoff = F.lit(int(default_rate * (1 << 32)))
    for stratum, rate in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * (1 << 32)))
        ).otherwise(cutoff)
    return df.filter(bucket < cutoff)


def quota_per_key(
    df: DataFrame,
    key: Column,
    order_by: list[Column],
    n: int,
) -> DataFrame:
    """At most ``n`` rows per key under the given total order (caller
    must make it total — include a unique id as the last order column so
    the kept set is deterministic)."""
    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        df.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= n)
        .drop("__qr")
    )
