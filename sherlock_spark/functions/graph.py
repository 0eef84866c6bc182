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
    # the DANGLING SET is static (nodes with no out-edges) — flag it
    # ONCE before the loop, so each iteration's dangling-mass term is a
    # filter + scalar aggregate over the rank vector instead of an
    # anti-join against the out-degree table
    flagged = (
        nodes.join(
            outdeg.select(
                F.col("src").alias("node"), F.lit(True).alias("_has_out")
            ),
            "node",
            "left",
        )
        .select("node", F.col("_has_out").isNull().alias("is_dangling"))
        .localCheckpoint(eager=True)
    )

    ranks = flagged.withColumn("pr", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            ranks.join(ew, ranks.node == ew.src)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum(F.col("pr") * F.col("inv_outdeg")).alias("contrib"))
        )
        dangling = ranks.filter("is_dangling").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling")
        )
        ranks = (
            flagged.join(contrib, flagged.node == contrib.node2, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_dangling",
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


def bfs_depths(
    edges: DataFrame,
    max_hops: int = 6,
    source: str | None = None,
    undirected: bool = True,
) -> DataFrame:
    """Level-synchronous BFS: (node_id, dist) for every node within
    ``max_hops`` of the source (default: the lexicographic-min node —
    deterministic without a caller-supplied id).

    Fixed hop bound (not run-to-frontier-empty) so the result is a
    closed form the DuckDB oracle replays as ``max_hops`` unrolled
    CTE steps. Each hop is ONE join of the (small) frontier against
    the checkpointed edge table plus an anti-join against the visited
    set — the frontier never exceeds the reachable node count, and the
    visited set grows monotonically, so per-hop cost is bounded by
    |frontier| x avg-degree. Per-hop eager ``localCheckpoint`` cuts the
    lineage exactly like the PageRank/CC loops (without it the visited
    plan doubles per hop). At 10^9 edges the frontier join shuffles on
    node id and the edge table is re-read from checkpoint blocks — no
    driver-side state beyond the loop counter.
    """
    e = edges.select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    if undirected:
        e = e.unionAll(
            edges.select(
                F.col("obj_id").alias("src"), F.col("subj_id").alias("dst")
            )
        )
    e = e.distinct().localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).distinct()
    if source is None:
        row = nodes.agg(F.min("node").alias("m")).first()
        if row is None or row["m"] is None:
            return e.sparkSession.createDataFrame(
                [], "node_id string, dist int"
            )
        source = row["m"]
    visited = (
        e.sparkSession.createDataFrame([(source, 0)], "node string, dist int")
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited.select(F.col("node").alias("node_id"), "dist")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph:
    (node_id, n_triangles), nodes in >= 1 triangle only.

    Degree-ordered orientation (each undirected edge points from the
    lower-(degree, id) endpoint to the higher) bounds the wedge
    explosion: a degree-d hub generates wedges only from its ORIENTED
    out-edges, and orientation caps every out-degree at O(sqrt(|E|))
    for any graph — the standard fix that makes the wedge join
    skew-safe where naive id-ordering lets one low-id celebrity emit
    O(d^2) candidates. Each triangle is then found exactly once
    (its unique orientation-respecting wedge + closing edge), so
    per-node counts are a map-side explode + one hash aggregate.
    Total cost: two shuffles (wedge self-join, closure join) over the
    oriented edge table.
    """
    und = (
        edges.select(
            F.least("subj_id", "obj_id").alias("a"),
            F.greatest("subj_id", "obj_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(lower_first, F.col("deg_b"))
            .otherwise(F.col("deg_a"))
            .alias("dst_deg"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = oriented.select(
        F.col("src").alias("s"),
        F.col("dst").alias("v1"),
        F.col("dst_deg").alias("d1"),
    )
    e2 = oriented.select(
        F.col("src").alias("s"),
        F.col("dst").alias("v2"),
        F.col("dst_deg").alias("d2"),
    )
    # wedge (s, v1, v2) with rank(v1) < rank(v2) in the same
    # (degree, id) order the orientation used — each unordered pair of
    # out-neighbours enumerated once
    wedges = e1.join(e2, "s").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("src").alias("v1"), F.col("dst").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("s", "v1", "v2")
    return (
        tris.select(
            F.explode(F.array("s", "v1", "v2")).alias("node_id")
        )
        .groupBy("node_id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def kcore(edges: DataFrame, k: int = 2, max_rounds: int = 8) -> DataFrame:
    """k-core decomposition (fixed peel bound): iteratively remove
    nodes of degree < k from the undirected simple graph; return the
    surviving nodes with their within-core degree.

    Peeling converges in at most |V| rounds but in practice a handful
    (each round removes a full "shell"); ``max_rounds`` caps the loop
    so the result is a closed form the oracle can unroll, with an
    early exit when a round removes nothing (observationally identical
    to running the remaining no-op rounds, so the fixed-bound oracle
    and the early-exiting loop agree whenever convergence happens
    within the bound — asserted by the node-count fixpoint check the
    caller can do, and documented as the contract at scale). Each
    round is one degree aggregation + two semi-joins, lineage cut per
    round; no driver-side state beyond the previous round's node count.
    """
    e = (
        edges.select(
            F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_nodes = -1
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node").localCheckpoint(
            eager=True
        )
        n = keep.count()
        if n == prev_nodes:
            break
        prev_nodes = n
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("core_degree"))
    )
    return deg.filter(F.col("core_degree") >= k).select(
        F.col("node").alias("node_id"), "core_degree"
    )


def conflicting_objects(edges: DataFrame) -> DataFrame:
    """Functional-predicate conflict detection with evidence-weighted
    resolution — the KG-cleaning pass run after extraction: a (subject,
    predicate) asserting more than one distinct object is inconsistent
    for functional relations (born_in, headquartered_in, ...); report
    each conflict with the object the evidence supports best.

    Output per conflicted (subj_id, pred): the number of competing
    objects, total evidence weight, and the winner object (max
    n_evidence, ties to the lexicographically smallest obj_id so the
    resolution is deterministic across engines and runs) — expressed
    as min_by over the (-evidence, obj_id) struct so the whole query
    is ONE hash aggregation on (subj, pred): partial-aggregatable,
    no window, no self-join; the n_objs > 1 filter applies
    post-aggregate.
    """
    winner_key = F.struct(
        (-F.col("n_evidence")).cast("long").alias("neg_ev"),
        F.col("obj_id").alias("o"),
    )
    return (
        edges.groupBy("subj_id", "pred")
        .agg(
            F.count_distinct("obj_id").cast("long").alias("n_objs"),
            F.sum("n_evidence").cast("long").alias("total_evidence"),
            F.min_by("obj_id", winner_key).alias("winner_obj"),
        )
        .filter(F.col("n_objs") > 1)
    )
