"""SemDeDup invariants (similarity.semantic_dedup): per-doc coverage,
cluster-representative survival, and drop justification against the
exhaustive pair baseline. Cross-engine value parity is x35 in
test_oracle_parity.py."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from stream_sentinel_spark.operators import similarity
from stream_sentinel_spark.sources.batch import load_table

SF = os.environ.get("SS_SKETCH_SF", "/root/testdata/sf0.001")
TAU = 0.25


@pytest.fixture(scope="module")
def result(spark):
    emb = load_table(spark, SF, "embeddings")
    out = similarity.semantic_dedup(
        emb, "vec_id", "embedding", threshold=TAU, cluster_bits=8
    ).cache()
    return emb, out


def test_one_row_per_document(spark, result):
    emb, out = result
    assert out.count() == emb.count()
    assert out.select("id").distinct().count() == emb.count()


def test_cluster_min_id_survives(spark, result):
    _, out = result
    # the keep-min-id rule means each cluster's smallest id is never dropped
    bad = (
        out.groupBy("cluster")
        .agg(F.min("id").alias("rep"))
        .join(out, (F.col("rep") == F.col("id")) & F.col("dropped"))
        .count()
    )
    assert bad == 0


def test_drops_justified_by_exhaustive_pairs(spark, result):
    emb, out = result
    # ground truth: all pairs ≥ TAU from the exhaustive quadratic baseline,
    # restricted to same-cluster — dropped set must match exactly
    pairs = similarity.cosine_pairs(emb, "vec_id", "embedding", threshold=TAU)
    clusters = out.select("id", "cluster")
    truth = (
        pairs.join(clusters.withColumnRenamed("id", "a_id")
                   .withColumnRenamed("cluster", "ca"), "a_id")
        .join(clusters.withColumnRenamed("id", "b_id")
              .withColumnRenamed("cluster", "cb"), "b_id")
        .filter(F.col("ca") == F.col("cb"))
        .select(F.col("b_id").alias("id"))
        .distinct()
    )
    got = out.filter("dropped").select("id")
    assert truth.exceptAll(got).count() == 0
    assert got.exceptAll(truth).count() == 0
