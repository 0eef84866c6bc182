"""Connected components at nontrivial scale, against closed forms.

The round-2 review noted the only CC graph ever exercised had 73 edges;
this pins behavior on a synthetic graph large enough to exercise the
distributed shape (hundreds of thousands of edges here; the 10^6-edge
timing run lives in ``tools/bench_cc_scale.py``):

- a HUB star (the "user" mega-entity risk from SURVEY §7): one node
  connected to ``n_hub`` spokes — the worst skew case for the
  neighbor-min aggregation;
- ``n_pairs`` disjoint 2-node components — the common case, closed-form
  component ids;
- one CHAIN of known diameter — pins iteration count ≈ diameter (the
  min-label propagates one hop per round).

Everything is built with ``spark.range`` (distributed, no driver-side
edge lists) and asserted with distributed anti-joins, never a collect
of the full node set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sherlock_spark.operators.canonicalize import connected_components

N_HUB = 100_000
N_PAIRS = 50_000
CHAIN_LEN = 12


def _zpad(col, width=7):
    return F.lpad(col.cast("string"), width, "0")


def build_graph(spark, n_hub=N_HUB, n_pairs=N_PAIRS, chain_len=CHAIN_LEN):
    hub = spark.range(n_hub).select(
        F.concat(F.lit("s"), _zpad(F.col("id"))).alias("src"),
        F.lit("hub").alias("dst"),
    )
    pairs = spark.range(n_pairs).select(
        F.concat(F.lit("p"), _zpad(F.col("id") * 2)).alias("src"),
        F.concat(F.lit("p"), _zpad(F.col("id") * 2 + 1)).alias("dst"),
    )
    chain = spark.range(chain_len).select(
        F.concat(F.lit("c"), _zpad(F.col("id"))).alias("src"),
        F.concat(F.lit("c"), _zpad(F.col("id") + 1)).alias("dst"),
    )
    return hub.union(pairs).union(chain)


def test_cc_scale_components_match_closed_form(spark):
    edges = build_graph(spark)
    stats: dict = {}
    comp = connected_components(edges, max_iterations=40, stats=stats).persist()

    # every spoke and the hub itself collapse to the lexicographic min
    # of the star = "c..."? no — hub component contains only s* + "hub",
    # min is "hub" (h < s)
    bad_hub = comp.filter(
        (F.col("node").startswith("s") | (F.col("node") == "hub"))
        & (F.col("component") != "hub")
    ).count()
    assert bad_hub == 0

    # each 2-node pair keeps its even-indexed node as the component id
    pair_nodes = comp.filter(F.col("node").startswith("p"))
    expected = F.concat(
        F.lit("p"),
        _zpad(
            (F.substring("node", 2, 7).cast("long") / 2).cast("long") * 2
        ),
    )
    assert pair_nodes.filter(F.col("component") != expected).count() == 0

    # the chain collapses to its head
    chain_nodes = comp.filter(F.col("node").startswith("c"))
    assert (
        chain_nodes.filter(F.col("component") != "c0000000").count() == 0
    )
    assert chain_nodes.count() == CHAIN_LEN + 1

    # total component count: hub + pairs + chain
    n_components = comp.select("component").distinct().count()
    assert n_components == 1 + N_PAIRS + 1

    # iteration count tracks the diameter: the chain (diameter
    # CHAIN_LEN) is the long pole; min-propagation needs ~diameter
    # rounds plus the final no-change round. The star alone would
    # converge in 2.
    assert stats["iterations"] <= CHAIN_LEN + 2
    assert stats["iterations"] >= 3
    comp.unpersist()


def test_cc_star_converges_in_constant_rounds(spark):
    """A pure star (max skew, min diameter) converges in 2-3 rounds
    regardless of spoke count — the scale claim for hub entities."""
    hub = spark.range(200_000).select(
        F.concat(F.lit("s"), _zpad(F.col("id"))).alias("src"),
        F.lit("hub").alias("dst"),
    )
    stats: dict = {}
    comp = connected_components(hub, max_iterations=10, stats=stats)
    assert comp.filter(F.col("component") != "hub").count() == 0
    assert stats["iterations"] <= 3


def test_cc_high_diameter_chain_logarithmic_rounds(spark):
    """A path graph of diameter 1000 — the adversarial case for plain
    min-label propagation (O(diameter) rounds would blow past any sane
    iteration bound). Pointer jumping makes it O(log diameter): the
    chain must collapse to its head within ~log2(1000) + slack rounds,
    well inside the default max_iterations=25."""
    n = 1000
    chain = spark.range(n).select(
        F.concat(F.lit("c"), _zpad(F.col("id"))).alias("src"),
        F.concat(F.lit("c"), _zpad(F.col("id") + 1)).alias("dst"),
    )
    stats: dict = {}
    comp = connected_components(chain, stats=stats, local_threshold=0)
    assert comp.filter(F.col("component") != "c0000000").count() == 0
    assert comp.count() == n + 1
    assert stats["converged"] is True
    assert stats["iterations"] <= 14  # ~log2(1000)=10 plus slack


def test_cc_unconverged_raises(spark):
    """Exhausting max_iterations without convergence must raise — an
    unconverged label table is silently wrong."""
    import pytest as _pytest

    chain = spark.range(40).select(
        F.concat(F.lit("c"), _zpad(F.col("id"))).alias("src"),
        F.concat(F.lit("c"), _zpad(F.col("id") + 1)).alias("dst"),
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        # shortcut off + 3 iterations cannot cover diameter 40
        connected_components(chain, max_iterations=3, shortcut=False, local_threshold=0)


def test_cc_local_fast_path_matches_distributed(spark):
    """The round-6 small-graph fast path (driver union-find under
    ``local_threshold`` edges) must be byte-identical to the
    distributed loop on the same graph — same (node, component) pairs,
    component = lexicographic min."""
    chain = spark.range(50).select(
        F.concat(F.lit("c"), _zpad(F.col("id"))).alias("src"),
        F.concat(F.lit("c"), _zpad(F.col("id") + 1)).alias("dst"),
    )
    pairs = spark.range(30).select(
        F.concat(F.lit("p"), _zpad(F.col("id") * 2)).alias("src"),
        F.concat(F.lit("p"), _zpad(F.col("id") * 2 + 1)).alias("dst"),
    )
    edges = chain.union(pairs)
    stats_local: dict = {}
    local = {
        (r.node, r.component)
        for r in connected_components(edges, stats=stats_local).collect()
    }
    assert stats_local["mode"] == "local"
    dist = {
        (r.node, r.component)
        for r in connected_components(edges, local_threshold=0).collect()
    }
    assert local == dist
