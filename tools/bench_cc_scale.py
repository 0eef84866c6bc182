"""Connected-components timing at 10^6+ edges with a skewed hub.

Backs the scale claim in ``operators/canonicalize.py``: the CC loop is
O(diameter) rounds of (join + min-agg), each one shuffle, with
per-iteration localCheckpoint lineage cuts; a hub ("user" mega-entity)
star is the worst-case skew and converges in 2 rounds.

Run: ``python tools/bench_cc_scale.py [--edges 1000000] [--cores 32]``
Prints one JSON line with wall time, iteration count, and the verified
component count.
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
from sherlock_spark.operators.canonicalize import connected_components  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--cores", type=int, default=None)
    parser.add_argument("--chain", type=int, default=12)
    args = parser.parse_args()

    spark = get_spark("bench_cc_scale", cores=args.cores)
    spark.range(1000).count()  # spin up

    n_hub = args.edges // 2  # half the edges form one giant skewed star
    n_pairs = args.edges // 2 - args.chain

    def zpad(col):
        return F.lpad(col.cast("string"), 9, "0")

    hub = spark.range(n_hub).select(
        F.concat(F.lit("s"), zpad(F.col("id"))).alias("src"),
        F.lit("hub").alias("dst"),
    )
    pairs = spark.range(n_pairs).select(
        F.concat(F.lit("p"), zpad(F.col("id") * 2)).alias("src"),
        F.concat(F.lit("p"), zpad(F.col("id") * 2 + 1)).alias("dst"),
    )
    chain = spark.range(args.chain).select(
        F.concat(F.lit("c"), zpad(F.col("id"))).alias("src"),
        F.concat(F.lit("c"), zpad(F.col("id") + 1)).alias("dst"),
    )
    edges = hub.union(pairs).union(chain).localCheckpoint(eager=True)
    n_edges = edges.count()

    stats: dict = {}
    started = time.time()
    comp = connected_components(edges, max_iterations=40, stats=stats)
    n_components = comp.select("component").distinct().count()
    elapsed = time.time() - started

    # closed-form verification (distributed, no collect)
    bad = (
        comp.filter(
            (F.col("node").startswith("s") | (F.col("node") == "hub"))
            & (F.col("component") != "hub")
        ).count()
        + comp.filter(
            F.col("node").startswith("c")
            & (F.col("component") != "c000000000")
        ).count()
    )

    print(
        json.dumps(
            {
                "metric": "connected-components wall time (skewed hub graph)",
                "value": round(elapsed, 3),
                "unit": "sec",
                "edges": int(n_edges),
                "components": int(n_components),
                "expected_components": 1 + n_pairs + 1,
                "iterations": stats["iterations"],
                "diameter": args.chain,
                "mismatched_nodes": int(bad),
                "edges_per_sec": round(n_edges / elapsed, 1),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
