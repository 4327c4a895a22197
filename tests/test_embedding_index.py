"""Persisted LSH embedding index (build once / match per batch).

The production-ingest claim behind x78 ("store the old side's band keys")
made a tested artifact: build_lsh_index persists band keys (bucketed by
the join key), vectors+norms, per-bucket counts, and signature params;
match_lsh_index must (1) reproduce cosine_pairs_lsh_incremental
bit-for-bit, and (2) plan the per-batch join so the corpus side is a
bucketed FileScan — no Exchange, no signature recompute, no corpus-sized
count re-aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.operators.similarity import (
    build_lsh_index,
    cosine_pairs_lsh_incremental,
    index_candidates,
    match_lsh_index,
)
from stream_sentinel_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def frames(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    # same split + threshold as the x78 corpus entry: the fixture's
    # cosines are diffuse, so 0.40 is where matches actually exist
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    return old, new


@pytest.fixture(scope="module")
def index(spark, frames):
    old, _ = frames
    build_lsh_index(old, "emb_idx")
    yield "emb_idx"
    for suffix in ("bands", "vecs", "bandstats", "meta"):
        spark.sql(f"DROP TABLE IF EXISTS emb_idx_{suffix}")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _rows(df):
    return sorted(
        (r.new_id, r.n_matches, r.best_cos, r.first_match)
        for r in df.collect()
    )


def test_match_equals_one_shot_incremental(spark, frames, index):
    old, new = frames
    got = _rows(match_lsh_index(spark, new, index, threshold=0.40))
    want = _rows(cosine_pairs_lsh_incremental(old, new, threshold=0.40))
    assert len(want) > 0, "fixture split produced no matches — test is vacuous"
    assert got == want  # bit-equal: same cosine kernel, stored norms


def test_per_batch_plan_touches_only_new_side_signatures(
    spark, frames, index, no_broadcast
):
    _, new = frames
    plan = plan_of(index_candidates(spark, new, index))
    # corpus side: the stored bands table scans with its bucket spec
    # exploited — no Exchange above it; the ONLY (band, val) shuffle in
    # the plan is the small new side aligning to the bucket layout (the
    # second Exchange in the plan belongs to the final distinct on ids)
    assert "Bucketed: true" in plan, plan
    # formatted mode prints the node and its Arguments on separate
    # lines, so count the partitioning expression itself
    assert plan.count("hashpartitioning(band") == 1, plan
    # no signature recompute anywhere in the per-batch plan: the new
    # side's signatures were materialized by the checkpoint inside
    # _banded_chunks, the old side's come from the index — the match
    # plan itself must contain zero signature arithmetic
    assert "shiftleft" not in plan and "shiftright" not in plan, plan
    # the salting probe ran eagerly against the STORED counts; the
    # chosen cold plan references neither the stats table nor a
    # corpus-sized count re-aggregation
    assert "emb_idx_bandstats" not in plan


def test_hot_salted_regime_engages_and_agrees(spark, frames, index):
    """Forcing the pair-product cutoff to 1 makes every bucket 'hot', so
    the salted plan runs (regime engagement asserted by plan shape, per
    the regime-test-vacuity lesson) and must emit the same candidates."""
    _, new = frames
    cold = index_candidates(spark, new, index)
    hot = index_candidates(spark, new, index, cutoff=1)
    hot_plan = plan_of(hot)
    assert "pmod" in hot_plan, hot_plan  # salt chunking actually planned
    assert "pmod" not in plan_of(cold)
    a = sorted((r.old_id, r.new_id) for r in cold.collect())
    b = sorted((r.old_id, r.new_id) for r in hot.collect())
    assert a == b and len(a) > 0


def test_meta_makes_index_self_describing(spark, frames, index):
    """match reads bits/bands/dim/seed from the stored meta row — a
    caller can't silently mismatch signature params between build and
    match."""
    meta = spark.table("emb_idx_meta").head()
    assert (meta.bits, meta.bands, meta.dim, meta.seed) == (16, 4, 64, 42)


# ---------------------------------------------------------------------------
# APPEND — the production ingest loop (round 6): N sequential appends
# must be indistinguishable from one rebuild, and the per-batch match
# plan must stay Exchange-free on the corpus side as the index grows.
# ---------------------------------------------------------------------------


def _drop(spark, name):
    for suffix in ("bands", "vecs", "bandstats", "meta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")


@pytest.fixture(scope="module")
def appended_index(spark, frames):
    """Index built on a THIRD of the corpus, then grown by two appends
    — ends logically identical to `index` (built on all of old)."""
    from stream_sentinel_spark.operators.similarity import append_lsh_index

    old, _ = frames
    build_lsh_index(old.filter(F.col("vec_id") % 6 == 0), "emb_app")
    append_lsh_index(old.filter(F.col("vec_id") % 6 == 2), "emb_app")
    append_lsh_index(old.filter(F.col("vec_id") % 6 == 4), "emb_app")
    yield "emb_app"
    _drop(spark, "emb_app")


def test_appends_equal_rebuild_bit_for_bit(spark, frames, index, appended_index):
    _, new = frames
    got = _rows(match_lsh_index(spark, new, appended_index, threshold=0.40))
    want = _rows(match_lsh_index(spark, new, index, threshold=0.40))
    assert len(want) > 0, "fixture split produced no matches — test is vacuous"
    assert got == want  # appended norms/signatures use the same kernels


def test_appended_tables_are_row_identical(spark, index, appended_index):
    """The grown index holds exactly the rebuild's rows (band keys and
    merged stats) — appends add rows, never mutate or drop them."""
    bands = lambda t: sorted(
        (r.old_id, r.band, r.val) for r in spark.table(f"{t}_bands").collect()
    )
    from stream_sentinel_spark.operators.similarity import _read_bandstats

    # the stats table is an append LOG (base + per-append deltas);
    # the contract is the aggregated per-key counts
    stats = lambda t: sorted(
        (r.band, r.val, r._na)
        for r in _read_bandstats(spark, f"{t}_bandstats", ["band", "val"]).collect()
    )
    assert bands(appended_index) == bands(index)
    assert stats(appended_index) == stats(index)


def test_plan_still_exchange_free_after_appends(
    spark, frames, appended_index, no_broadcast
):
    """Appends write bucket-aligned files into the existing layout, so
    the corpus side of the candidate join still scans Bucketed with no
    Exchange — the property that makes per-batch cost flat."""
    _, new = frames
    plan = plan_of(index_candidates(spark, new, appended_index))
    assert "Bucketed: true" in plan, plan
    assert plan.count("hashpartitioning(band") == 1, plan


def test_append_meta_carries_bucket_count(spark, frames, index):
    """The meta row records the bucket count appends/compaction follow.
    Default builds auto-size it to the corpus (auto_num_buckets); an
    explicit num_buckets always wins and is recorded verbatim."""
    from stream_sentinel_spark.sources.bucketing import auto_num_buckets

    old, _ = frames
    assert (
        spark.table(f"{index}_meta").head().num_buckets
        == auto_num_buckets(old.count())
    )
    try:
        build_lsh_index(old, "emb_explicit_nb", num_buckets=32)
        assert spark.table("emb_explicit_nb_meta").head().num_buckets == 32
    finally:
        for suffix in ("bands", "vecs", "bandstats", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS emb_explicit_nb_{suffix}")


def test_compaction_resets_files_and_preserves_matches(spark, frames):
    """compact_lsh_index: the embedding twin of the minhash compaction
    test — append-grown tables rewritten to ≤1 file per bucket (proof
    the rewrite was bucket-aligned and Exchange-free), matches
    bit-identical, bucket spec intact after the catalog swap."""
    from stream_sentinel_spark.operators.similarity import (
        append_lsh_index,
        compact_lsh_index,
    )

    old, new = frames
    try:
        build_lsh_index(old.filter(F.col("vec_id") % 6 == 0), "emb_cmp")
        append_lsh_index(old.filter(F.col("vec_id") % 6 == 2), "emb_cmp")
        append_lsh_index(old.filter(F.col("vec_id") % 6 == 4), "emb_cmp")
        meta = spark.table("emb_cmp_meta").head()
        pre_files = len(spark.table("emb_cmp_bands").inputFiles())
        pre = _rows(match_lsh_index(spark, new, "emb_cmp", threshold=0.40))
        assert len(pre) > 0

        counts = compact_lsh_index(spark, "emb_cmp")

        assert counts["emb_cmp_bands"] <= meta.num_buckets < pre_files
        assert counts["emb_cmp_vecs"] <= meta.num_buckets
        post = _rows(match_lsh_index(spark, new, "emb_cmp", threshold=0.40))
        assert post == pre
    finally:
        for suffix in ("bands", "vecs", "bandstats", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS emb_cmp_{suffix}")
        spark.sql("DROP TABLE IF EXISTS emb_cmp_bands__compacting")
        spark.sql("DROP TABLE IF EXISTS emb_cmp_vecs__compacting")


def test_hot_bucket_build_warning(spark, frames):
    """build_lsh_index warns when the hottest band bucket exceeds the
    bound (the round-7 stress's measured 163M-candidate cliff at 16/4
    on clustered corpora), and stays silent above the bound or when
    disabled."""
    import warnings as _w

    old, _ = frames
    try:
        # sf0.001 has ~dozens of vectors per band bucket at 4-bit keys;
        # a bound of 1 must fire, the 10k default must not
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            build_lsh_index(old, "emb_hot", hot_bucket_warn=1)
        msgs = [str(r.message) for r in rec if r.category is UserWarning]
        assert any("hottest band bucket" in m for m in msgs), msgs
        for s in ("bands", "vecs", "bandstats", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS emb_hot_{s}")
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            build_lsh_index(old, "emb_hot")  # default 10_000: silent
        assert not any(
            "hottest band bucket" in str(r.message) for r in rec
        )
    finally:
        for s in ("bands", "vecs", "bandstats", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS emb_hot_{s}")


# slow tier: 3000-vector skewed-cluster sizing sweep of the bits='auto' probe; the probe's no-probe-on-explicit-bits contract and hot-bucket warning run at default size in test_hot_bucket_build_warning
@pytest.mark.slow
def test_auto_bits_widens_on_clustered_corpus(spark):
    """bits="auto" (VERDICT r08 item 5): a corpus with a tight hot
    cluster auto-selects ≥8-bit band keys (the cluster's hottest bucket
    exceeds the bound at every trial width, so the probe lands on the
    widest candidate), a diffuse corpus keeps the 16/4 default, and an
    explicit bits never probes."""
    from stream_sentinel_spark.operators.similarity import _auto_lsh_bits
    from stream_sentinel_spark.testing import make_skewed_embeddings

    e = make_skewed_embeddings(
        spark, n_vecs=3000, hot_cluster=1000, planted_pairs=200,
        n_queries=10,
    )
    vecs = e.vectors.localCheckpoint(eager=True)
    # clustered: the 1000-vector hot cluster holds one band bucket at
    # every width (measured hottest 1158/1000/970 at 16/32/64) — the
    # probe must walk past the 4-bit default to the widest key
    assert _auto_lsh_bits(vecs, "vec_id", "embedding", 4, 64, 42, 500) == 64
    # diffuse (background-only, measured hottest 209 at 16 bits): the
    # first candidate fits and the loop exits after ONE trial
    diffuse = vecs.filter(F.col("vec_id") >= 1400)
    assert (
        _auto_lsh_bits(diffuse, "vec_id", "embedding", 4, 64, 42, 500) == 16
    )
    # end-to-end: the auto build stamps the chosen width into _meta,
    # and match never takes signature params so the choice is sticky
    try:
        build_lsh_index(
            vecs, "emb_auto", bits="auto", hot_bucket_warn=500,
        )
        assert spark.table("emb_auto_meta").head().bits == 64
    finally:
        for s in ("bands", "vecs", "bandstats", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS emb_auto_{s}")
    # explicit params always win
    import pytest as _pt

    with _pt.raises(ValueError, match="auto"):
        build_lsh_index(vecs, "emb_bad", bits="wide")
