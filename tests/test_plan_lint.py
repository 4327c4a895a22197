"""Blanket plan-hygiene lint over EVERY corpus query: the two nodes
that never survive a 100 TB scale-up must not appear anywhere.

- ``CartesianProduct``: an unbounded all-pairs product. The corpus's
  deliberate small-side cross joins (one-row scalar attachment, the
  guarded degenerate-dedup regime) all pin their build side with a
  broadcast hint precisely so the planner emits
  BroadcastNestedLoopJoin — which is bounded by the broadcast limit —
  instead of a partition-product CartesianProduct.
- ``BatchEvalPython``: row-at-a-time (non-Arrow) Python evaluation.
  Every Python kernel in the engine is Arrow-batched
  (``ArrowEvalPython`` / ``MapInPandas``); a plain UDF sneaking into a
  plan is a 10-100x regression waiting for scale.

Known blind spot: stages upstream of a ``localCheckpoint`` barrier
appear as pinned ``Scan ExistingRDD`` nodes, so the lint sees only the
plan AFTER the last barrier of checkpoint-using queries; the operators
that checkpoint (the dedup family, PMI, shard export) carry their own
pre-barrier plan-shape pins in test_plan_shapes.py. For everything
else this sweep guarantees no FUTURE corpus entry regresses the two
invariants silently.
"""

from __future__ import annotations

import pytest

from stream_sentinel_spark.plans import corpus

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(corpus.queries()))
def test_no_forbidden_plan_nodes(spark, name):
    df = corpus.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [w for w in FORBIDDEN if w in plan]
    assert not hits, f"{name}: forbidden plan nodes {hits}\n{plan}"
