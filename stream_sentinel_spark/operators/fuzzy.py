"""Fuzzy string matching via symmetric deletes (SymSpell blocking).

The scalable alternative to a levenshtein cross join: two strings
within edit distance 1 always share a member of each other's
deletion neighborhood (the string itself plus every single-character
deletion) — substitution at i makes both i-deletions equal; an
insertion's deletion recovers the shorter string verbatim. So the
candidate set is an EQUI-join on the exploded variant key (fixed
(len+1)-fold fan-out per row), and exact ``levenshtein`` verifies only
the candidates. The cross join is O(n²) levenshtein evaluations; this
is O(n·len) variants hashed plus O(candidates) verifications — the
shuffle key is the variant string, so Catalyst plans an ordinary hash
join at any scale.

Guaranteed recall (the SymSpell property): two strings within edit
distance k always share a member of their ≤k-deletion neighborhoods —
each substitution deletes its position from both sides, each
insertion/deletion deletes the extra character from the longer side —
so the equi-join on the exploded variant key is a complete candidate
generator at any k, and exact ``levenshtein`` removes the false
collisions. Implemented for k ∈ {1, 2}: the neighborhood grows as
O(len^k) (len+1 variants at k=1, ~len²/2 at k=2 — ~330 for a 25-char
name), which is the practical entity-matching range; beyond that the
variant fan-out and candidate multiplicity dominate and
:mod:`stream_sentinel_spark.operators.dedup` n-gram Jaccard is the
right family.

Everything stays JVM-side: variant generation is sequence+transform
(codegen'd), verification is the built-in ``levenshtein``.

Reference parity note: the reference engine has no string-similarity
surface (SURVEY §2.6); this extends the dedup family (entity/vocab
matching for training-data curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_sentinel_spark.operators.partitioning import spread_pairs, spread_small


def deletion_variants(text: F.Column | str) -> F.Column:
    """array<string>: the string itself + every single-char deletion,
    de-duplicated (repeated characters produce identical deletions)."""
    t = F.col(text) if isinstance(text, str) else text
    dels = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.concat(
            t.substr(F.lit(1), i - 1), t.substr(i + 1, F.length(t))
        ),
    )
    return F.array_distinct(F.concat(F.array(t), dels))


def deletion_variants_k(text: F.Column | str, k: int) -> F.Column:
    """array<string>: the ≤k-deletion neighborhood. Each expansion round
    applies :func:`deletion_variants` to every current variant (which
    includes the identity, so round i yields ALL deletions of ≤i chars),
    de-duplicated. Runtime string compute, not plan literals — the
    expression stays codegen-sized at any k."""
    cur = deletion_variants(text)
    for _ in range(k - 1):
        cur = F.array_distinct(F.flatten(F.transform(cur, deletion_variants)))
    return cur


def fuzzy_pairs(
    df: DataFrame, id_col: str, text_col: str, max_distance: int = 1
) -> DataFrame:
    """All pairs (a_id < b_id) with ``levenshtein(a, b) <= max_distance``
    — exact result, never a cross join. ``max_distance`` ∈ {1, 2} (see
    module docstring for why larger radii belong to the n-gram family)."""
    if max_distance not in (1, 2):
        raise NotImplementedError(
            "symmetric-delete blocking implemented for max_distance in "
            "{1, 2}; use n-gram Jaccard for coarser matching"
        )
    # spread before the explode: a dimension-sized input scans as one
    # partition and would serialize the variant fan-out, the collision
    # join AND the levenshtein verify onto one core (measured at sf0.1:
    # every x24 stage ran (0+1)/1 — 5.0 s single-task vs 1.9 s spread)
    base = spread_small(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    )
    variants = base.select(
        "id",
        "txt",
        F.explode(deletion_variants_k(F.col("txt"), max_distance)).alias("variant"),
    )
    a = variants.select(
        F.col("id").alias("a_id"), F.col("txt").alias("a_txt"), "variant"
    )
    b = variants.select(
        F.col("id").alias("b_id"), F.col("txt").alias("b_txt"), "variant"
    )
    return (
        a.join(b, "variant")
        .filter(F.col("a_id") < F.col("b_id"))
        # dedup BEFORE the verify: a true pair collides on 2-3 shared
        # variants (one per deletable difference position) and repeated
        # characters add distance-2 false collisions, so the raw
        # collision stream carries each pair ~3x — running the DP-cost
        # levenshtein on the distinct pairs instead was measured 3x
        # cheaper at sf0.1 (977k collisions -> ~330k distinct pairs).
        # The texts ride through the distinct so no re-join is needed.
        .select("a_id", "b_id", "a_txt", "b_txt")
        .distinct()
        # re-spread after the distinct: AQE coalesces that exchange by
        # BYTES, which would run the DP-cost levenshtein single-task
        # (same layout fix as the minhash/cosine verify stages)
        .transform(spread_pairs)
        .withColumn("dist", F.levenshtein("a_txt", "b_txt"))
        .filter(F.col("dist") <= max_distance)
        .select("a_id", "b_id", "dist")
    )
