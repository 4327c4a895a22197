"""Graph operators over event-derived graphs: edge extraction and
fixed-iteration PageRank.

The near-dup family already contains one graph algorithm (min-label
connected components, ``dedup.py:cluster_neardups``); this module adds
the weighted-centrality side: build an interaction graph from an event
log, then rank nodes by PageRank. The reference engine has no graph
surface (SURVEY §2 — it is a per-key detection pipeline); this extends
the training-data family, where PageRank-style centrality over a
similarity or citation graph is a standard document-quality prior
(e.g. harmonic-centrality filtering in Common Crawl curation).

Scale notes: edges come from a window ``lag`` (one shuffle on the
partition key); each PageRank iteration is one hash-shuffle join of the
rank vector against the edge list plus one aggregation — the classic
synchronous (Jacobi) formulation. Iterations are a FIXED count chosen
by the caller: the driver never inspects convergence, so there is no
driver-side collect in the loop and the whole plan is N chained
shuffles. At 100 TB the edge list partitioning is reused across
iterations via the same join key (rank vector is the small side and
AQE broadcast-joins it when it fits).

Cross-engine determinism: rank updates are sums of IEEE doubles whose
order differs between engines; compared values round to 6 decimals
(~1e7 margin over the 1e-13 accumulation wobble at this scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def handoff_edges(
    events: DataFrame,
    key_col: str = "user_id",
    part_col: str = "event_type",
    time_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Directed interaction edges: within each ``part_col`` stream,
    consecutive distinct ``key_col`` values (ordered by time, tie-broken
    by ``order_cols``) form an edge prev → next — "who acts after whom"
    in the same event stream. Self-loops (same key acts twice in a row)
    are dropped; parallel edges are collapsed with a weight count.

    One shuffle (the window on ``part_col``) + one edge aggregation.
    """
    w = Window.partitionBy(part_col).orderBy(time_col, *order_cols)
    return (
        events.select(
            F.lag(key_col).over(w).alias("src"),
            F.col(key_col).alias("dst"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """Fixed-iteration synchronous PageRank over a weighted directed
    edge list ``(src, dst, weight)``.

    Semantics (documented contract, mirrored by the generated oracle):

    - the node set is every id appearing as src OR dst;
    - ranks start uniform at ``1/N``;
    - each iteration: ``pr'(v) = (1-d)/N + d * Σ_{u→v} pr(u) *
      weight(u,v) / outweight(u)`` — weighted out-degree normalization;
    - dangling nodes (no out-edges) do NOT redistribute their mass (the
      simple formulation; total mass is then < 1, which only rescales
      ranks uniformly and preserves the ordering).

    Output: ``(node, rank)`` with rank rounded to ``round_to``.

    The loop body builds one logical plan of ``iterations`` chained
    join+agg stages — no driver-side materialization between
    iterations. For large ``iterations`` insert checkpoints upstream;
    3-5 iterations (the curation-prior regime) needs none.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    out_w = edges.groupBy("src").agg(F.sum("weight").cast("double").alias("outweight"))
    norm_edges = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("outweight")).alias("share")
    )
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            norm_edges.join(ranks, norm_edges["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("incoming"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("incoming"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", round_to).alias("rank"))


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
    round_to: int = 6,
) -> str:
    """The DuckDB mirror of :func:`pagerank`: the fixed iteration count
    unrolls into a chain of CTEs (recursive CTEs can't re-aggregate the
    whole frontier per step, so unrolling IS the faithful translation).
    ``edges_cte`` must select ``(src, dst, weight)``.
    """
    d = damping
    sql = [
        f"WITH edges AS ({edges_cte}),",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_nodes FROM nodes),",
        "ow AS (SELECT src, CAST(SUM(weight) AS DOUBLE) AS outweight"
        " FROM edges GROUP BY 1),",
        "ne AS (SELECT e.src, e.dst, e.weight / ow.outweight AS share"
        " FROM edges e JOIN ow USING (src)),",
        "r0 AS (SELECT node, 1.0 / nn.n_nodes AS rank FROM nodes, nn),",
    ]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        sql.append(
            f"c{i} AS (SELECT ne.dst, SUM({prev}.rank * ne.share) AS incoming"
            f" FROM ne JOIN {prev} ON ne.src = {prev}.node GROUP BY 1),"
        )
        sql.append(
            f"{cur} AS (SELECT nodes.node,"
            f" (1.0 - {d}) / nn.n_nodes"
            f" + {d} * COALESCE(c{i}.incoming, 0.0) AS rank"
            f" FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.dst, nn),"
        )
    last = sql.pop().rstrip(",")
    sql.append(last)
    sql.append(
        f"SELECT node, round(rank, {round_to}) AS rank FROM r{iterations}"
    )
    return "\n".join(sql)
