"""Graph analytics over the materialized KG node/edge tables.

The north rule ends at "materialized as deduplicated node/edge tables";
these operators are what a KG consumer runs NEXT — degree centrality
(hub detection over the canonical graph) and fixed-iteration PageRank
(GraphFrames-style iterative DataFrame joins, the same per-iteration
``localCheckpoint`` discipline as ``operators/canonicalize.py``).
No reference analogue (sherlock stops at per-document annotation).

Scale notes (10^12-turn KG => 10^9+ canonical edges):

- ``degree_stats`` is ONE shuffle: the edge table is unpivoted
  (union of the two endpoint projections — map-side, no join) and
  hash-aggregated on node_id with map-side partial aggregation.
- ``pagerank`` is one shuffle per iteration (contribution sum on dst),
  plus a scalar dangling-mass aggregate that Catalyst broadcasts as a
  single-row cross join — no driver-side collect in the loop. The
  rank-vector lineage is cut with an eager ``localCheckpoint`` every
  iteration; without it the plan doubles per iteration exactly as the
  connected-components loop's docstring measures. Edge/out-degree
  tables are checkpointed ONCE before the loop and re-read by every
  iteration. Skewed in-degree (a celebrity node) is a groupBy hot key
  -> partial aggregation already combines per-partition, and AQE skew
  handling covers the residual; there is no per-key state beyond the
  running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame) -> DataFrame:
    """edges(subj_id, pred, obj_id, n_evidence) ->
    (node_id, out_degree, in_degree, n_evidence).

    Degrees count distinct edge-table rows (the canonical edge table is
    already deduplicated per (subj, pred, obj)); ``n_evidence`` totals
    the supporting evidence over ALL incident edges, both directions.
    Unpivot + single hash aggregate — no self-join.
    """
    unpivoted = edges.select(
        F.col("subj_id").alias("node_id"),
        F.lit(1).alias("out_e"),
        F.lit(0).alias("in_e"),
        "n_evidence",
    ).unionAll(
        edges.select(
            F.col("obj_id").alias("node_id"),
            F.lit(0).alias("out_e"),
            F.lit(1).alias("in_e"),
            "n_evidence",
        )
    )
    return unpivoted.groupBy("node_id").agg(
        F.sum("out_e").cast("long").alias("out_degree"),
        F.sum("in_e").cast("long").alias("in_degree"),
        F.sum("n_evidence").cast("long").alias("n_evidence"),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over directed edges(subj_id, obj_id).

    Returns (node_id, pr) with the UNROUNDED double rank — callers
    round for presentation. Fixed iteration count (not convergence-
    tested) so the result is a deterministic closed form the DuckDB
    oracle replays exactly (``queries._pagerank_sql`` unrolls the same
    recurrence as chained CTEs). Dangling-node mass is redistributed
    uniformly each iteration — the standard stochastic-matrix fix, and
    a scalar aggregate here (single-row cross join, broadcast).

    Multigraph edges (same (subj, obj) under two predicates) are
    collapsed with ``distinct`` so the transition matrix is 0/1 —
    matching the usual unweighted-PageRank definition.
    """
    e = (
        edges.select(F.col("subj_id").alias("src"), F.col("obj_id").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col("node").alias("node_id"), F.lit(0.0).alias("pr")
        )
    outdeg = e.groupBy("src").agg(
        F.count("*").cast("double").alias("outdeg")
    )
    # contribution edges carry 1/outdeg so the loop join is single-key
    ew = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_outdeg"))
        .localCheckpoint(eager=True)
    )
    src_nodes = outdeg.select(F.col("src").alias("node")).localCheckpoint(
        eager=True
    )

    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            ranks.join(ew, ranks.node == ew.src)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum(F.col("pr") * F.col("inv_outdeg")).alias("contrib"))
        )
        dangling = ranks.join(src_nodes, "node", "left_anti").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling")
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.node2, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n_nodes))
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("node").alias("node_id"), "pr")
