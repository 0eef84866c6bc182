"""Graph analytics (degree, PageRank) and near-dup cluster assignment.

PageRank is pinned against an independent NumPy power-iteration on the
same graph; dedup_clusters against a hand-computed transitive closure
with a chain (A-B, B-C must all collapse to one cluster) plus a
singleton; TF-IDF against closed-form ln() arithmetic.
"""

from __future__ import annotations

import math

import pytest

from sherlock_spark.functions.dedup import dedup_clusters
from sherlock_spark.functions.graph import degree_stats, pagerank
from sherlock_spark.functions.textstats import tfidf_top_terms


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string, n_evidence long"
    )


def test_degree_stats(spark):
    edges = _edges(
        spark,
        [
            ("a", "p1", "b", 3),
            ("a", "p2", "b", 1),
            ("b", "p1", "c", 2),
        ],
    )
    got = {
        r["node_id"]: (r["out_degree"], r["in_degree"], r["n_evidence"])
        for r in degree_stats(edges).collect()
    }
    assert got == {
        "a": (2, 0, 4),
        "b": (1, 2, 6),
        "c": (0, 1, 2),
    }


def _numpy_pagerank(edge_list, iterations=10, damping=0.85):
    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in set(edge_list):
        out.setdefault(s, set()).add(d)
    pr = [1.0 / n] * n
    for _ in range(iterations):
        nxt = [0.0] * n
        dangling = sum(
            pr[idx[v]] for v in nodes if v not in out
        )
        for s, ds in out.items():
            share = pr[idx[s]] / len(ds)
            for d in ds:
                nxt[idx[d]] += share
        pr = [
            (1 - damping) / n + damping * (nxt[i] + dangling / n)
            for i in range(n)
        ]
    return {v: pr[idx[v]] for v in nodes}


def test_pagerank_matches_power_iteration(spark):
    # hub, chain, dangling node, and a duplicate-pred multi-edge that
    # must collapse to one transition
    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("a", "b"),  # duplicate
        ("c", "e"),              # e dangles
    ]
    edges = spark.createDataFrame(
        [(s, "p", d, 1) for s, d in edge_list],
        "subj_id string, pred string, obj_id string, n_evidence long",
    )
    got = {
        r["node_id"]: r["pr"]
        for r in pagerank(edges.select("subj_id", "obj_id")).collect()
    }
    want = _numpy_pagerank(edge_list)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    # ranks stay a probability distribution (dangling mass recycled)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_graph(spark):
    edges = _edges(spark, [])
    assert pagerank(edges.select("subj_id", "obj_id")).count() == 0


def test_dedup_clusters_chain_and_singleton(spark):
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 9, 10, 40)], "doc_id long"
    )
    # chain 1-2-3 (transitive), pair 9-40; 10 is a singleton. 9-40 also
    # checks the zero-padding: lexicographic "40" < "9" must NOT win.
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.85), (40, 9, 0.88)],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_kept"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got == {
        1: (1, 1),
        2: (1, 0),
        3: (1, 0),
        9: (9, 1),
        40: (9, 0),
        10: (10, 1),
    }


def test_tfidf_top_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["score"])
        )
    for v in by_doc.values():
        v.sort()
    ln3 = math.log(3.0)
    ln15 = math.log(1.5)
    assert by_doc[1] == [
        (1, "apple", round(2 * ln3, 6)),
        (2, "banana", round(1 * ln15, 6)),
    ]
    assert by_doc[3] == [(1, "durian", round(3 * ln3, 6))]
    # doc 2: both terms tf=1; cherry (df=1) outscores banana (df=2)
    assert [t for _, t, _ in by_doc[2]] == ["cherry", "banana"]


# -- property: cluster assignment == union-find closure ------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _union_find_clusters(doc_ids, pair_list):
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, then label every doc with its root (= min id)
    return {d: find(d) for d in doc_ids}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0,
        max_size=25,
    )
)
def test_dedup_clusters_matches_union_find(spark, pair_list):
    doc_ids = sorted(set(range(8)) | {d for p in pair_list for d in p})
    docs = spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pair_list] or [],
        "doc_a long, doc_b long, jaccard double",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got == _union_find_clusters(doc_ids, pair_list)


def test_bfs_depths_min_source_and_bound(spark):
    from sherlock_spark.functions.graph import bfs_depths

    # path a-b-c-d-e plus triangle x-y-z bridged at c; source = min
    # node "a"; max_hops=3 must exclude e (dist 4) and include x at 3
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
         ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")],
        "subj_id string, obj_id string",
    )
    got = {r["node_id"]: r["dist"] for r in bfs_depths(edges, max_hops=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "x": 3}
    # undirected: reverse-direction edges reachable too
    rev = spark.createDataFrame(
        [("b", "a")], "subj_id string, obj_id string"
    )
    got2 = {r["node_id"]: r["dist"] for r in bfs_depths(rev).collect()}
    assert got2 == {"a": 0, "b": 1}


def test_triangle_counts(spark):
    from sherlock_spark.functions.graph import triangle_counts

    # K4 on {a,b,c,d}: each node is in C(3,2)=3 triangles; plus a
    # pendant edge d-e (e in none) and a duplicate/reversed edge
    # (must not double-count)
    k4 = [(u, v) for u in "abcd" for v in "abcd" if u < v]
    edges = spark.createDataFrame(
        k4 + [("d", "e"), ("b", "a"), ("a", "b")],
        "subj_id string, obj_id string",
    )
    got = {
        r["node_id"]: r["n_triangles"]
        for r in triangle_counts(edges).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_peels_tails_keeps_triangle(spark):
    # Triangle a-b-c (2-core) with a pendant chain c-d-e and an isolated
    # pair f-g: the chain and pair peel away (degree < 2 after each
    # round), the triangle survives with within-core degree 2 each.
    from sherlock_spark.functions.graph import kcore

    edges = _edges(
        spark,
        [
            ("a", "p", "b", 1),
            ("b", "p", "c", 1),
            ("c", "p", "a", 1),
            ("c", "p", "d", 1),
            ("d", "p", "e", 1),
            ("f", "p", "g", 1),
        ],
    )
    got = {r["node_id"]: r["core_degree"] for r in kcore(edges, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_early_exit_matches_fixed_bound(spark):
    # A long chain peels one shell per round from both ends; the
    # early-exiting loop and a generous fixed bound must agree (the
    # contract the unrolled SQL oracle relies on).
    from sherlock_spark.functions.graph import kcore

    chain = [(str(i), "p", str(i + 1), 1) for i in range(6)]
    chain += [("x", "p", "y", 1), ("y", "p", "z", 1), ("z", "p", "x", 1)]
    edges = _edges(spark, chain)
    a = sorted(map(tuple, kcore(edges, k=2, max_rounds=4).collect()))
    b = sorted(map(tuple, kcore(edges, k=2, max_rounds=10).collect()))
    assert a == b == [("x", 2), ("y", 2), ("z", 2)]


def test_conflicting_objects_winner_and_ties(spark):
    from sherlock_spark.functions.graph import conflicting_objects

    edges = _edges(
        spark,
        [
            ("s1", "born_in", "berlin", 5),
            ("s1", "born_in", "paris", 2),
            ("s1", "works_at", "acme", 9),      # single object: no conflict
            ("s2", "born_in", "rome", 3),
            ("s2", "born_in", "oslo", 3),       # evidence tie -> min obj_id
        ],
    )
    got = {
        (r["subj_id"], r["pred"]): (
            r["n_objs"], r["total_evidence"], r["winner_obj"]
        )
        for r in conflicting_objects(edges).collect()
    }
    assert got == {
        ("s1", "born_in"): (2, 7, "berlin"),
        ("s2", "born_in"): (2, 6, "oslo"),
    }
