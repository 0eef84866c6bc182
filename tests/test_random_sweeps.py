"""Seeded random sweeps of the round-4 primitives against pure-Python
references — one Spark job per operator over a union of many generated
cases (per-example Spark jobs would be prohibitively slow), so the
coverage is property-style while the runtime stays test-suite-sized.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sherlock_spark.functions.graph import kcore
from sherlock_spark.functions.interval import interval_join
from sherlock_spark.functions.packing import pack_chunks

SEED = 20260817


def test_interval_join_random_sweep(spark):
    rng = random.Random(SEED)
    points, intervals = [], []
    for case in range(12):
        key_base = case * 10
        for pid in range(rng.randint(1, 25)):
            points.append(
                (case * 1000 + pid, key_base + rng.randint(0, 2),
                 rng.randint(0, 500))
            )
        for iid in range(rng.randint(1, 10)):
            s = rng.randint(0, 480)
            intervals.append(
                (case * 1000 + iid, key_base + rng.randint(0, 2),
                 s, s + rng.randint(0, 300))
            )
    expected = sorted(
        (pid, iid)
        for pid, pk, t in points
        for iid, ik, s, e in intervals
        if pk == ik and s <= t <= e
    )
    p = spark.createDataFrame(points, "pid long, k long, t long")
    iv = spark.createDataFrame(intervals, "iid long, k long, s long, e long")
    out = interval_join(
        p, iv, point_col="t", start_col="s", end_col="e", keys=["k"],
        bucket_width=64,
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == expected


def test_pack_chunks_random_sweep(spark):
    rng = random.Random(SEED)
    docs = [(i, rng.randint(0, 40)) for i in range(300)]
    capacity, buckets = 17, 7

    streams: dict[int, int] = {}
    expected = {}
    for doc_id, nt in sorted(docs):
        b = doc_id % buckets
        start = streams.get(b, 0)
        end = start + nt
        streams[b] = end
        expected[doc_id] = (
            b,
            start // capacity,
            start % capacity,
            (max(end, start + 1) - 1) // capacity - start // capacity,
        )

    df = spark.createDataFrame(docs, "doc_id long, nt long")
    got = {
        r["doc_id"]: (
            r["bucket"], r["chunk_id"], r["chunk_offset"],
            r["n_boundary_crossings"],
        )
        for r in pack_chunks(
            df, capacity=capacity, buckets=buckets, tokens=F.col("nt")
        ).collect()
    }
    assert got == expected
    # structural invariants: offsets always inside the window
    assert all(0 <= v[2] < capacity for v in got.values())


def _peel_reference(edge_set: set[tuple[str, str]], k: int) -> dict[str, int]:
    edges = set(edge_set)
    while True:
        deg: dict[str, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


def test_kcore_random_sweep(spark):
    rng = random.Random(SEED)
    rows = []
    expected = {}
    for case in range(8):
        n = rng.randint(4, 16)
        nodes = [f"c{case}n{i}" for i in range(n)]
        edge_set = set()
        for _ in range(rng.randint(n, 3 * n)):
            a, b = rng.sample(nodes, 2)
            edge_set.add((min(a, b), max(a, b)))
        k = rng.randint(2, 3)
        for node, d in _peel_reference(edge_set, k).items():
            expected[(case, node)] = d
        rows += [(a, "p", b, 1, case, k) for a, b in edge_set]

    # run per-case (k varies); ONE session, tiny frames
    df = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, "
        "n_evidence long, case long, k int"
    )
    got = {}
    for case, k in sorted({(r[4], r[5]) for r in rows}):
        sub = df.filter(F.col("case") == case)
        for r in kcore(sub, k=k, max_rounds=64).collect():
            got[(case, r["node_id"])] = r["core_degree"]
    assert got == expected
