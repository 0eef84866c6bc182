"""k-core peel at 10^6 edges with a skewed hub, cross-checked against
an independent single-process Python peel (0 mismatches required).

Backs the scale claim in ``functions/graph.py::kcore``: each peel
round is one degree aggregation (hash agg, partial-combinable) plus
two semi-joins, lineage cut per round. The graph is a dense random
core (everything survives k=2) plus two-hop pendant tails attached to
it (two peel shells by construction: tail tips fall in round 1, tail
midpoints in round 2) and a celebrity hub absorbing a large slice of
edges (one hot aggregation key — partial aggregation must absorb it).

Peel-round caveat measured here, documented in the operator: rounds =
number of shells, and a LONG pendant path peels only from its ends
(O(length) rounds) — the known worst case of peeling. This workload's
shells are 2 by construction; pathological inputs need the max_rounds
bound plus the fixpoint early-exit the operator ships.

Run: ``python tools/bench_kcore.py [--edges 1000000] [--cores 32]``
Prints one JSON line.
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
from sherlock_spark.functions.graph import kcore  # noqa: E402


def synth(spark, n_edges: int):
    """~80% dense-core edges over n_edges/20 nodes (10% of those onto
    hub node 0), ~20% forming pendant 2-paths core->mid->tip."""
    n_core = n_edges // 5
    n_nodes = n_edges // 20
    core = spark.range(n_edges - 2 * n_core).select(
        F.when(
            F.col("id") % 10 == 0, F.lit(0)
        ).otherwise(F.abs(F.xxhash64("id", F.lit("a"))) % n_nodes).alias(
            "sa"
        ),
        (F.abs(F.xxhash64("id", F.lit("b"))) % n_nodes).alias("sb"),
    )
    tails = spark.range(n_core).select(
        (F.abs(F.xxhash64("id", F.lit("c"))) % n_nodes).alias("anchor"),
        (F.lit(n_nodes) + F.col("id")).alias("mid"),
        (F.lit(n_nodes) + n_core + F.col("id")).alias("tip"),
    )
    edges = (
        core.select(F.col("sa").alias("u"), F.col("sb").alias("v"))
        .unionAll(tails.select(F.col("anchor").alias("u"), F.col("mid").alias("v")))
        .unionAll(tails.select(F.col("mid").alias("u"), F.col("tip").alias("v")))
    )
    return edges.select(
        F.col("u").cast("string").alias("subj_id"),
        F.lit("p").alias("pred"),
        F.col("v").cast("string").alias("obj_id"),
    )


def python_peel(pairs, k: int) -> dict[str, int]:
    edges = {(a, b) if a < b else (b, a) for a, b in pairs if a != b}
    while True:
        deg: dict[str, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {e for e in edges if e[0] in keep and e[1] in keep}
        if nxt == edges:
            break
        edges = nxt
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--k", type=int, default=2)
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args()

    spark = get_spark("bench_kcore", cores=args.cores)
    spark.range(1000).count()
    edges = synth(spark, args.edges).localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.time()
    got = {
        r["node_id"]: r["core_degree"]
        for r in kcore(edges, k=args.k, max_rounds=16).collect()
    }
    wall = time.time() - t0

    pairs = [
        (r["subj_id"], r["obj_id"]) for r in edges.collect()
    ]
    expected = python_peel(pairs, args.k)
    mismatches = sum(
        1 for n in set(got) | set(expected) if got.get(n) != expected.get(n)
    )

    print(
        json.dumps(
            {
                "edges": n_edges,
                "k": args.k,
                "core_nodes": len(got),
                "peeled_nodes": len(expected) and len(
                    set(python_peel(pairs, 1)) - set(expected)
                ),
                "wall_s": round(wall, 2),
                "edges_per_sec": round(n_edges / wall),
                "mismatches": mismatches,
            }
        )
    )


if __name__ == "__main__":
    main()
