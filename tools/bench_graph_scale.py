"""Fixed-iteration PageRank timing at 10^6+ edges with a skewed hub.

Backs the scale claim in ``functions/graph.py``: each iteration is one
shuffle (contribution sum on dst) plus a broadcast scalar for dangling
mass, with per-iteration localCheckpoint lineage cuts. The graph is the
worst realistic shape for the contribution aggregate: one celebrity
node receiving half of all edges (a single hot reduce key — partial
aggregation must absorb it), the rest a uniform random graph.

Correctness at scale is checked structurally: sum(pr) == 1 within 1e-6
(the dangling redistribution keeps rank a probability distribution —
any join/dedup/checkpoint bug breaks this invariant), the celebrity
node must carry the max rank, and the iteration count is fixed by
construction.

Run: ``python tools/bench_graph_scale.py [--edges 1000000] [--cores 32]``
Prints one JSON line with wall time, edges/sec, and the invariants.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sherlock_spark.session import get_spark  # noqa: E402
from sherlock_spark.functions.graph import pagerank  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--cores", type=int, default=None)
    parser.add_argument("--iterations", type=int, default=10)
    args = parser.parse_args()

    spark = get_spark("bench_graph_scale", cores=args.cores)
    spark.range(1000).count()  # spin up

    n_hub = args.edges // 2
    n_rand = args.edges - n_hub
    n_nodes = max(args.edges // 10, 1000)

    def node(col):
        return F.concat(F.lit("n"), F.lpad(col.cast("string"), 9, "0"))

    # half the edges point AT one celebrity node (hot reduce key);
    # the other half connect xxhash-derived pseudo-random node pairs
    hub = spark.range(n_hub).select(
        node(F.col("id") % n_nodes).alias("subj_id"),
        F.lit("celebrity").alias("obj_id"),
    )
    rand = spark.range(n_rand).select(
        node(F.abs(F.xxhash64("id", F.lit(1))) % n_nodes).alias("subj_id"),
        node(F.abs(F.xxhash64("id", F.lit(2))) % n_nodes).alias("obj_id"),
    )
    edges = hub.union(rand).filter(
        F.col("subj_id") != F.col("obj_id")
    ).localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.time()
    ranks = pagerank(edges, iterations=args.iterations).localCheckpoint(
        eager=True
    )
    wall = time.time() - t0

    agg = ranks.agg(
        F.sum("pr").alias("total"),
        F.count("*").alias("n"),
        F.max_by("node_id", "pr").alias("top_node"),
    ).first()

    print(
        json.dumps(
            {
                "edges": n_edges,
                "nodes": agg["n"],
                "iterations": args.iterations,
                "wall_sec": round(wall, 2),
                "edges_per_sec_per_iter": round(
                    n_edges * args.iterations / wall
                ),
                "pr_sum": round(float(agg["total"]), 8),
                "pr_sum_ok": abs(float(agg["total"]) - 1.0) < 1e-6,
                "top_node": agg["top_node"],
                "top_node_ok": agg["top_node"] == "celebrity",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
