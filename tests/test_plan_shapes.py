"""Physical-plan shape assertions — the 100 TB guarantees.

Correctness tests prove the small-SF answer; these prove the PLAN is
the one that survives a 1000-executor scale-up: filters reach the
parquet scan, projections prune the read schema, small dimensions
broadcast instead of shuffling the fact table, top-k never global-sorts,
and the detection pipeline keeps exactly one shuffle per stateful rule
branch with no Python in the hot path.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.plans import corpus
from stream_sentinel_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_to_scan(spark):
    """q03 threshold predicate must reach the parquet reader."""
    df = corpus.queries()["q03_threshold_rule"](spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,250.0)]" in plan, plan


def test_column_pruning(spark):
    """q01 projects 3 of 6 event columns; ReadSchema must not include
    the others (props is the big one)."""
    df = corpus.queries()["q01_scan_projection"](spark, SF_DIR)
    plan = plan_of(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "event_type" not in read_schema, read_schema


def test_broadcast_join_for_small_dim(spark):
    """q11/q12: dimension tables broadcast — the fact table must never
    shuffle for the join itself."""
    for name in ("q11_join_orders_customer", "q12_tpch_q3_topk"):
        plan = plan_of(corpus.queries()[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan}"
        assert "SortMergeJoin" not in plan, f"{name}: unexpected SMJ\n{plan}"


def test_topk_avoids_global_sort(spark):
    """q17 LIMIT+ORDER BY must plan as TakeOrderedAndProject (per-
    partition top-k + merge), not a global Sort+Exchange."""
    plan = plan_of(corpus.queries()["q17_topk_orders"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_detection_pipeline_no_python(spark):
    """The whole 3-rule batch pipeline stays JVM-side: no Python eval
    nodes (UDFs) anywhere in the physical plan."""
    plan = plan_of(corpus.queries()["detect_pipeline"](spark, SF_DIR))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python in hot path: {marker}\n{plan}"


def test_detection_pipeline_shuffle_count(spark):
    """Each stateful rule branch shuffles once on the key; the threshold
    branch shuffles zero times. 3 rules (rate, threshold, statistical)
    → exactly 2 key exchanges in the whole union plan."""
    plan = plan_of(corpus.queries()["detect_pipeline"](spark, SF_DIR))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 2, f"expected 2 key shuffles, got {n_exchanges}\n{plan}"


def test_whole_stage_codegen_on_detector_branches(spark):
    """Detector filters/projections live inside WholeStageCodegen spans."""
    plan = plan_of(corpus.queries()["q04_threshold_alert_details"](spark, SF_DIR))
    # formatted mode marks codegen'd operators with [codegen id : N]
    assert "[codegen id :" in plan, plan


def test_statistical_uses_single_window_pass(spark):
    """q08: one Window node computing all three frame aggregates — not
    one shuffle per aggregate."""
    df = corpus.queries()["q08_statistical_rule"](spark, SF_DIR)
    plan = plan_of(df)
    n_windows = len(re.findall(r"\(\d+\) Window", plan))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_windows == 1, f"expected 1 Window node, got {n_windows}\n{plan}"
    assert n_exchanges == 1, f"expected 1 shuffle, got {n_exchanges}\n{plan}"


# Bucketed-join plan shape lives in tests/test_bucketing.py.


def test_partition_pruning_friendly_scan(spark):
    """Scans carry no unexpected extra exchange: a plain projection is
    scan → project with zero shuffles."""
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "Exchange" not in plan, plan


def test_tpch_q5_broadcasts_dims_and_pushes_region_filter(spark):
    """q26 (TPC-H Q5): the region filter must reach its scan as a pushed
    filter, nation/region must broadcast (never shuffle the fact side
    for a dimension), and the date range must be pushed to the orders
    scan."""
    df = corpus._QUERIES["q26_tpch_q5_volume"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan
    assert re.search(r"PushedFilters:.*r_name.*ASIA", plan) or re.search(
        r"PushedFilters:.*EqualTo\(r_name", plan
    ), plan
    assert re.search(r"PushedFilters:.*o_orderdate", plan), plan


def test_tpch_q1_is_two_phase_agg_with_pruned_scan(spark):
    """q25 (TPC-H Q1): partial→final hash aggregation (map-side combine
    before the shuffle) and a read schema pruned to the referenced
    columns only."""
    df = corpus._QUERIES["q25_tpch_q1_pricing"](spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = m.group(1)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert "l_shipdate" in cols and "l_quantity" in cols, cols


def test_salted_agg_two_hash_aggregates(spark):
    """x21: the salted aggregate really is two-phase on the PHYSICAL
    plan — (key, salt) aggregation, then the per-key merge — with the
    salt never reaching the output."""
    df = corpus._QUERIES["x21_salted_hot_key_agg"](spark, SF_DIR)
    plan = plan_of(df)
    # 2 logical phases x (partial+final) = 4 hash aggregate operators
    assert plan.count("HashAggregate") >= 4, plan
    assert "__ss_salt" not in df.columns


def test_tpch_q6_full_pushdown_single_row_agg(spark):
    """q33 (TPC-H Q6): all four predicates reach the parquet scan and
    the aggregate is two-phase (map-side partial before the single-row
    gather)."""
    plan = plan_of(corpus._QUERIES["q33_tpch_q6_forecast"](spark, SF_DIR))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    assert plan.count("HashAggregate") >= 2, plan


def test_tpch_q4_plans_semi_join(spark):
    """q34 (TPC-H Q4): the EXISTS compiles to a LeftSemi hash join — the
    probe side never duplicates order rows no matter how many lineitems
    match."""
    plan = plan_of(corpus._QUERIES["q34_tpch_q4_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan, plan


def test_tpch_q10_broadcasts_nation_and_pushes_filters(spark):
    """q35 (TPC-H Q10): nation broadcasts; the returnflag and date-range
    filters reach their scans; the top-20 never global-sorts."""
    plan = plan_of(corpus._QUERIES["q35_tpch_q10_returns"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert re.search(r"PushedFilters:.*l_returnflag", plan), plan
    assert re.search(r"PushedFilters:.*o_orderdate", plan), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q18_broadcasts_having_survivors(spark):
    """q37 (TPC-H Q18): the HAVING-filtered big-order set drives the
    joins as the broadcast side, so orders/customer never reshuffle."""
    plan = plan_of(corpus._QUERIES["q37_tpch_q18_volume"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q19_derives_single_table_filters(spark):
    """q38 (TPC-H Q19): Catalyst infers single-table conjuncts from the
    cross-table OR — the lineitem scan carries the pushed OR-of-quantity
    ranges and the part scan the brand/size disjunction, so the join
    probes a fraction of both tables."""
    plan = plan_of(corpus._QUERIES["q38_tpch_q19_disjunctive"](spark, SF_DIR))
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(l_quantity", plan), plan
    assert re.search(r"PushedFilters:.*EqualTo\(p_brand", plan), plan


def test_range_join_never_nested_loop(spark):
    """x23: the banded range join must plan as a hash-partitioned
    equi-join on the bucket id — a non-equi formulation would fall to
    BroadcastNestedLoopJoin / CartesianProduct, which is O(|L| x |R|)
    and dies at scale."""
    plan = plan_of(corpus.queries()["x23_range_join_neighbors"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_degenerate_vocab_allpairs_bounded_by_doc_count(spark, monkeypatch):
    """The small-vocab all-pairs/bitmask regimes are quadratic in the
    DOCUMENT count no matter how small the vocabulary is — a repetitive
    100 TB corpus has a tiny shingle vocab and billions of docs, and an
    unbounded vocab-only switch would plan a BroadcastNestedLoopJoin
    over trillions of pairs. Above the doc cap the operators must fall
    through to the prefix-filter / LSH plans: keyed equi-joins only."""
    from stream_sentinel_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # the fixture vocabulary IS degenerate (small word pool), so with the
    # cap lowered below the fixture's doc count only the doc-count guard
    # separates the two regimes
    monkeypatch.setattr(dedup, "_ALLPAIRS_MAX_DOCS", 10)

    jac = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
    plan = plan_of(jac)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    ver = dedup.minhash_verified_pairs(docs, "doc_id", "text", threshold=0.8)
    plan = plan_of(ver)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    # and under the cap the degenerate regime still picks the bitmask
    # broadcast plan (the fast path for small corpora)
    monkeypatch.setattr(dedup, "_ALLPAIRS_MAX_DOCS", 100_000)
    jac_small = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
    assert "BroadcastNestedLoopJoin" in plan_of(jac_small)


def test_cosine_pairs_lsh_never_nested_loop(spark):
    """x07's measured path must be the banded equi-join + broadcast
    verify — the quadratic a_id < b_id product (BroadcastNestedLoopJoin)
    is exactly what the scale path exists to avoid."""
    plan = plan_of(corpus.queries()["x07_embedding_cosine_pairs"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_c4_filters_map_only(spark):
    """x42 is pure column expressions: zero exchanges, zero Python, one
    whole-stage-codegen span over the scan."""
    plan = plan_of(corpus.queries()["x42_c4_filters"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # NB: the higher-order-function lambdas keep the Project out of
    # WholeStageCodegen — it is still a single JVM map over the scan,
    # which is the scale property this test pins.
    assert "Project" in plan and "Scan parquet" in plan, plan


def test_random_projection_map_only(spark):
    """x44 (JL projection + posexplode) must not shuffle or leave the
    JVM — it's the scan-speed prelude to banding, at any scale."""
    plan = plan_of(corpus.queries()["x44_random_projection"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_boilerplate_removal_no_bnlj_and_pruned_scan(spark):
    """x41: the doc-frequency filter must be an anti hash-join on the
    line (never a nested loop), and the documents scan must prune to
    (doc_id, text)."""
    plan = plan_of(corpus.queries()["x41_boilerplate_removal"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all(
        "lang" not in l and "source" not in l for l in read_schemas
    ), read_schemas


def test_unigram_logprob_scalar_is_broadcast(spark):
    """x43's corpus-total N must join as a broadcast of a one-row agg,
    not shuffle the token stream against it."""
    plan = plan_of(corpus.queries()["x43_unigram_logprob"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_shard_manifest_single_shuffle(spark):
    """x45: one partial-agg hash shuffle on the shard key — nothing
    else. (The md5 bucket is computed map-side twice rather than
    shuffling rows wider.)"""
    plan = plan_of(corpus.queries()["x45_shard_manifest"](spark, SF_DIR))
    assert plan.count("Exchange") - plan.count("AQEShuffleRead") <= 2, plan
    assert "HashAggregate" in plan, plan
    assert "Python" not in plan, plan


# ---------------------------------------------------------------------------
# round-3 additions: event analytics, indexing, rebalance, skew report
# ---------------------------------------------------------------------------


def _hash_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_funnel_single_event_shuffle(spark):
    """x47: every funnel step is a conditional window min over ONE user
    partitioning, and the per-user roll-up reuses it — exactly one
    hash exchange over the event log no matter how many steps."""
    df = corpus.queries()["x47_funnel_conversion"](spark, SF_DIR)
    assert _hash_exchanges(df) == 1, df._jdf.queryExecution().executedPlan().toString()


def test_retention_cohorts_single_corpus_shuffle(spark):
    """x48: one user-key shuffle of the event log (map-side combined
    collect_set), one tiny roll-up exchange — never a second shuffle
    of the activity frame."""
    df = corpus.queries()["x48_retention_cohorts"](spark, SF_DIR)
    assert _hash_exchanges(df) == 2, df._jdf.queryExecution().executedPlan().toString()


def test_ewma_single_shuffle_no_python(spark):
    """x53: the weighted fold is codegen'd array arithmetic — one user
    shuffle, zero Python evals."""
    df = corpus.queries()["x53_ewma_user_value"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan


def test_pmi_topk_no_global_sort_two_corpus_passes(spark):
    """x51: the top-k cut is TakeOrderedAndProject; the corpus is
    scanned exactly twice (unigram + bigram aggs) — every visible scan
    beyond the two pinned checkpoints would be a corpus re-read."""
    df = corpus.queries()["x51_pmi_collocations"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # both corpus passes live behind the localCheckpoint barriers; a
    # parquet scan in THIS plan means a consumer re-derived the lineage
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan, plan


def test_temperature_rebalance_broadcasts_plan(spark):
    """x52: the decision pass joins the corpus against the broadcast
    group-plan; the distribution pass is pinned — exactly one visible
    corpus scan."""
    df = corpus.queries()["x52_language_rebalance"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_bag_of_words_dedup_single_shuffle(spark):
    """x54: normalized-fingerprint dedup costs the same single hash
    shuffle as byte-exact dedup."""
    df = corpus.queries()["x54_bag_of_words_dedup"](spark, SF_DIR)
    assert _hash_exchanges(df) == 1, df._jdf.queryExecution().executedPlan().toString()


def test_skew_report_ranks_aggregated_frame_only(spark):
    """x55: the ranking window runs on the per-key COUNT frame — one
    hash exchange for the counts; the window's own exchange is the
    single-partition collapse of |keys| rows, not a second shuffle of
    the input."""
    df = corpus.queries()["x55_skew_report"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange SinglePartition") >= 1, plan


def test_bm25_topk_plan_shape(spark):
    """x117: the top-k cut is TakeOrderedAndProject (no global sort);
    df and (N, avgdl) attach as broadcasts — the corpus-sized side is
    never shuffled for a scalar attachment; no Python in the plan."""
    df = corpus.queries()["x117_bm25_keyword_search"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_bloom_prune_plan_shape(spark, tmp_path):
    """x116's prune step is a HASH JOIN over the exploded index — never
    a per-row map lookup (Spark's element_at on a map is a linear key
    scan; the expression-side formulation measured 10-14 s against
    131 k-word maps where the full data scan took 0.9 s). The probe
    table and the survivor list broadcast; nothing touches the data
    files; no CartesianProduct (the widths × values seed is a
    broadcast NLJ of two tiny frames), no Python."""
    from stream_sentinel_spark.sources.skipping import (
        file_bloom_maps,
        prune_files_bloom,
    )

    path = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id % 7 AS key").write.parquet(path)
    bm = file_bloom_maps(
        spark.read.schema("id long, key long").parquet(path), "key"
    ).localCheckpoint(eager=True)
    plan = prune_files_bloom(bm, "key", [3])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "Scan parquet" not in plan, plan


def test_stream_parts_sizes_to_data_and_restores(spark):
    """_stream_parts derives the stateful-stream partition count from
    the input volume (ceil(rows/target), floor, capped at the session
    value — production-sized inputs keep the session's scale-out) and
    restores the session setting on exit."""
    from stream_sentinel_spark.plans.corpus import _stream_parts

    old = spark.conf.get("spark.sql.shuffle.partitions")
    cap = int(old)
    with _stream_parts(spark, 100, target_rows=25_000) as p:
        assert p == min(cap, 4)  # floor
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(p)
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with _stream_parts(spark, 10**9, target_rows=25_000) as p:
        assert p == cap  # capped at the session's configured parallelism
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with _stream_parts(spark, 100_000, target_rows=12_500, floor=8) as p:
        assert p == min(cap, 8)
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
