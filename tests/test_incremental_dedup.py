"""Cross-frame (incremental) near-dup detection: the old×new candidate
join, its salted twin, and the per-new-doc roll-up."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_sentinel_spark.operators.dedup import (
    _banded_keys,
    _hot_salted_pair_join,
    incremental_neardups,
    minhash_pairs_between,
    minhash_verified_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_cross_frame_finds_planted_neardup(spark):
    old = _docs(spark, [(0, BASE), (2, "completely different content here x")])
    new = _docs(spark, [(1, BASE + "!"), (3, "nothing like anything before zz")])
    pairs = minhash_pairs_between(old, new, "doc_id", "text").collect()
    assert [(r["a_id"], r["b_id"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] >= 0.8


def test_cross_frame_ignores_within_frame_dups(spark):
    # two identical docs INSIDE old must not pair; only old×new pairs emit
    old = _docs(spark, [(0, BASE), (2, BASE)])
    new = _docs(spark, [(1, "unrelated text that matches nothing at all")])
    assert minhash_pairs_between(old, new, "doc_id", "text").count() == 0


def test_cross_frame_matches_union_selfjoin_restriction(spark):
    """old×new pairs must equal the union self-join's verified pairs
    restricted to cross pairs — the correctness contract that makes the
    incremental mode a safe substitute for re-running the batch job."""
    texts = [
        BASE, BASE + " extra", "some other document body entirely",
        BASE + " extra!", "some other document body entirely.",
        "a third unrelated cluster of words",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = _docs(spark, rows)
    old = df.filter(F.col("doc_id") % 2 == 0)
    new = df.filter(F.col("doc_id") % 2 == 1)
    got = {
        (r["a_id"], r["b_id"])
        for r in minhash_pairs_between(old, new, "doc_id", "text").collect()
    }
    full = minhash_verified_pairs(
        df, "doc_id", "text", num_hashes=32, bands=8
    ).collect()
    want = {
        (r["a_id"], r["b_id"]) if r["a_id"] % 2 == 0 else (r["b_id"], r["a_id"])
        for r in full
        if r["a_id"] % 2 != r["b_id"] % 2
    }
    assert got == want and got  # non-empty: the planted dups crossed


def test_salted_pair_join_equals_plain(spark):
    a = spark.createDataFrame(
        [(i, i % 3, 0) for i in range(30)], "id long, band int, bucket long"
    )
    b = spark.createDataFrame(
        [(100 + i, i % 3, 0) for i in range(20)], "id long, band int, bucket long"
    )
    plain = {
        (r["a_id"], r["b_id"])
        for r in _hot_salted_pair_join(a, b, ["band", "bucket"]).collect()
    }
    salted = {
        (r["a_id"], r["b_id"])
        for r in _hot_salted_pair_join(a, b, ["band", "bucket"], cutoff=2).collect()
    }
    assert plain == salted
    assert len(plain) == 10 * 7 + 10 * 7 + 10 * 6  # per-band products


def test_incremental_rollup(spark):
    old = _docs(spark, [(0, BASE), (2, BASE + " v2"), (4, "unrelated junk")])
    new = _docs(spark, [(1, BASE + " "), (3, "nothing shared here at all qq")])
    out = incremental_neardups(old, new, "doc_id", "text", threshold=0.5)
    rows = {r["new_id"]: r for r in out.collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert r["n_matches"] >= 1 and r["first_match"] == 0
    assert 0.5 <= r["best_jaccard"] <= 1.0


def test_banded_keys_band_count(spark):
    df = _docs(spark, [(0, BASE)])
    from stream_sentinel_spark.operators.dedup import minhash_signatures

    sig = minhash_signatures(df, "doc_id", "text", num_hashes=32)
    assert _banded_keys(sig, 32, 8).count() == 8
