"""Cross-conversation entity canonicalization via connected components.

Not present in the reference (its linking is per-document,
``entity_fishing.py:70-110``); required by the north rule: coreferent
entities must merge *across* conversations. Graph: bipartite
alias-surface <-> kb-id edges from the link table; components computed
with iterative DataFrame min-label propagation PLUS pointer jumping
(label-through-label shortcutting — the same distance-doubling idea as
large-star/small-star), so convergence is O(log diameter): shallow
alias graphs converge in 2-4 rounds and even a pathological 10^3-link
chain needs ~11. Iterations are bounded, convergence is *measured*
(non-convergence raises — an unconverged label table is silently
wrong), not assumed.

Scale notes: each iteration is one shuffle on the node id; lineage is
cut with an eager ``localCheckpoint`` EVERY iteration. Anything laxer
is catastrophic: ``comp_{i+1}`` references ``comp_i`` twice (once in
the neighbor-min join, once in the update join), so an uncheckpointed
plan doubles in size per iteration — 3 deferred iterations re-execute
the base plan 8x and each duplicated join spawns its own
broadcast-build job (measured: 67 s for a 10-node graph with
checkpoint-every-3 vs ~4 s with per-iteration checkpoints at
sf0.1/local[32]). Per-iteration materialization is O(V) rows — the
same discipline GraphFrames uses. A hub alias ("user" linked
everywhere) creates a giant star — harmless for min-propagation
(depth 2); the skew-sensitive part is the *join back*, handled by AQE
skew join. Demonstrated beyond toy size by
``tests/test_canonicalize_scale.py`` / ``tools/bench_cc_scale.py``
(10^6-edge hub graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    stats: dict | None = None,
    shortcut: bool = True,
    local_threshold: int = 65536,
) -> DataFrame:
    """edges(src string, dst string) -> (node string, component string).

    Component id = lexicographic min node id in the component.
    Deterministic. Each iteration does (1) neighbor-min propagation and
    (2, when ``shortcut``) pointer jumping — re-mapping each node's
    label through the label table (``c(v) <- c(c(v))``), which doubles
    the propagated distance per round. Propagation alone is O(diameter)
    rounds (fine for shallow alias graphs, catastrophic for a 10^3-link
    chain); with shortcutting the bound is O(log diameter), so the
    default ``max_iterations=25`` covers diameters past 10^6 — the
    documented bound. A loop that exhausts ``max_iterations`` without
    converging returns WRONG labels, so it raises instead.

    Small-graph fast path (round-6): a graph at or under
    ``local_threshold`` edges is collected and union-found on the
    driver — semantics identical (min label per component), but the
    distributed loop's 5-6 tiny Spark jobs PER ITERATION (two
    checkpoints, a convergence count, the join builds) are pure
    fixed overhead there: the 18-node alias graph of the KG pipeline
    spent ~7 s of a cold run on job latency alone, the local path
    milliseconds. The size probe is a bounded ``limit(n+1).count()``
    over the already-checkpointed edge list, so a billion-edge graph
    pays one short-circuited scan and takes the distributed loop
    exactly as before; 65536 edges collect to a few MB on the driver,
    far under any sane ``maxResultSize``. Pass ``local_threshold=0``
    to force the distributed loop (the scale tests pin its iteration
    bounds and non-convergence error).

    When a ``stats`` dict is passed, ``stats["iterations"]`` records the
    number of rounds actually run (scale tests pin this against the
    graph diameter; the local path records 0 with ``mode="local"``).
    """
    # materialize the edge list once — its lineage may contain the whole
    # upstream extraction pipeline, which must not be recomputed on
    # every iteration's join
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    if local_threshold:
        n_edges = edges.limit(local_threshold + 1).count()
        if n_edges <= local_threshold:
            return _connected_components_local(edges, stats)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    comp = nodes.withColumn("component", F.col("node"))

    iterations_run = 0
    converged = False
    for _iteration in range(max_iterations):
        iterations_run += 1
        neighbor_min = (
            sym.join(comp, sym.src == comp.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = comp.join(
            neighbor_min, comp.node == F.col("node2"), "left"
        ).select(
            "node",
            "component",
            F.least(
                F.col("component"),
                F.coalesce(F.col("neighbor_component"), F.col("component")),
            ).alias("new_component"),
        )
        # Eager checkpoint per step: cuts the comp-referenced-twice
        # plan doubling (see module docstring) and stores the blocks, so
        # the self-join below and the convergence scan are cheap local
        # reads, not recomputes. One extra no-op iteration runs past
        # convergence.
        updated = updated.localCheckpoint(eager=True)
        if shortcut:
            # pointer jumping: labels are node ids, so the label table
            # maps them too — c(v) <- min(c(v), c(c(v))) halves every
            # node's distance to its component's min each round
            label_of = updated.select(
                F.col("node").alias("label_node"),
                F.col("new_component").alias("label_comp"),
            )
            updated = updated.join(
                label_of,
                updated.new_component == label_of.label_node,
                "left",
            ).select(
                "node",
                "component",
                F.least(
                    F.col("new_component"),
                    F.coalesce(F.col("label_comp"), F.col("new_component")),
                ).alias("new_component"),
            )
            updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.filter(F.col("new_component") != F.col("component"))
            .limit(1)
            .count()
        )
        comp = updated.select(
            "node", F.col("new_component").alias("component")
        )
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["iterations"] = iterations_run
        stats["converged"] = converged
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations; with shortcut={shortcut} that covers diameters "
            f"up to ~{'2**' + str(max_iterations) if shortcut else max_iterations}"
            f" — raise max_iterations (an unconverged label table is "
            f"silently wrong, so this is an error, not a warning)"
        )
    return comp


def _connected_components_local(
    edges: DataFrame, stats: dict | None
) -> DataFrame:
    """Driver-side union-find over a small collected edge list —
    byte-identical output contract to the distributed loop: (node,
    component) with component = lexicographic min node id. Only
    reachable through ``connected_components``' bounded size probe."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in edges.collect():
        for node in (row[0], row[1]):
            if node not in parent:
                parent[node] = node
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            parent[ra] = rb
    component_min: dict[str, str] = {}
    for node in parent:
        root = find(node)
        cur = component_min.get(root)
        if cur is None or node < cur:
            component_min[root] = node
    rows = [(node, component_min[find(node)]) for node in sorted(parent)]
    if stats is not None:
        stats["iterations"] = 0
        stats["converged"] = True
        stats["mode"] = "local"
    return edges.sparkSession.createDataFrame(
        rows, "node string, component string"
    )


def canonicalize(link_table: DataFrame) -> DataFrame:
    """link table (ment_norm, ment_label, kb_id nullable) -> mapping
    (ment_norm, ment_label, canonical_id).

    Nodes: ``a:<type>:<norm>`` for surfaces, ``k:<kb_id>`` for KB ids.
    Surfaces sharing a KB id (directly or transitively through shared
    ids/aliases) get one canonical id; unlinked surfaces canonicalize to
    themselves.
    """
    surfaces = link_table.select(
        F.concat(F.lit("a:"), "ment_label", F.lit(":"), "ment_norm").alias("src"),
        F.when(
            F.col("kb_id").isNotNull(), F.concat(F.lit("k:"), "kb_id")
        ).alias("dst"),
        "ment_norm",
        "ment_label",
    ).distinct()

    edges = surfaces.filter(F.col("dst").isNotNull()).select("src", "dst")
    components = connected_components(edges)

    return (
        surfaces.join(components, surfaces.src == components.node, "left")
        .select(
            "ment_norm",
            "ment_label",
            F.coalesce(F.col("component"), F.col("src")).alias("canonical_id"),
        )
        .distinct()
    )


def resolve_canonical_ids(
    triples: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    """Resolve every triple's subject/object surface to its canonical
    node id (falling back to a deterministic per-surface id when the
    surface never linked) — the shared step under the node/edge
    materialization and any evidence-level aggregation (edge temporal
    extents, conflict audits) that needs resolved ids but not the
    deduplicated tables.
    """
    with_subj = triples.withColumn(
        "subj_norm", F.lower(F.col("subj_text"))
    ).withColumn("obj_norm", F.lower(F.col("obj_text")))
    return resolve_canonical_ids_normed(with_subj, canonical_map)


def resolve_canonical_ids_normed(
    normed: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    """``resolve_canonical_ids`` over a table that already carries
    (subj_norm, subj_type, obj_norm, obj_type) — the shared core, also
    consumed directly by aggregate-before-resolve callers
    (``materialize_graph``) whose input rows are pre-collapsed tuples
    rather than raw triples."""
    subj_map = canonical_map.select(
        F.col("ment_norm").alias("subj_norm"),
        F.col("ment_label").alias("subj_type"),
        F.col("canonical_id").alias("subj_id"),
    )
    obj_map = canonical_map.select(
        F.col("ment_norm").alias("obj_norm"),
        F.col("ment_label").alias("obj_type"),
        F.col("canonical_id").alias("obj_id"),
    )
    # No broadcast hint: the canonical map is the full distinct surface
    # vocabulary — data-sized, a driver-OOM at 10^12 turns if forced to
    # broadcast. AQE picks broadcast when the map is actually small and
    # falls back to a (skew-handled) shuffle join when it isn't; for
    # co-located repeats, bucket both sides on the norm key upstream.
    resolved = (
        normed.join(subj_map, ["subj_norm", "subj_type"], "left")
        .join(obj_map, ["obj_norm", "obj_type"], "left")
        .withColumn(
            "subj_id",
            F.coalesce(
                F.col("subj_id"),
                F.concat(F.lit("a:"), "subj_type", F.lit(":"), "subj_norm"),
            ),
        )
        .withColumn(
            "obj_id",
            F.coalesce(
                F.col("obj_id"),
                F.concat(F.lit("a:"), "obj_type", F.lit(":"), "obj_norm"),
            ),
        )
    )
    return resolved


def materialize_graph(
    triples: DataFrame, canonical_map: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Triples + canonical map -> deduplicated (nodes, edges) tables.

    nodes(canonical_id, label, surface_forms); edges(subj_id, pred,
    obj_id, n_evidence) — n_evidence aggregates duplicate assertions
    instead of dropping them silently.

    Aggregate-before-resolve (round-6): evidence rows are first counted
    on the surface-NORM key (subj_norm, subj_type, pred, obj_norm,
    obj_type) — a partial-aggregatable hash agg that collapses the
    evidence table to its distinct assertion tuples BEFORE anything is
    joined or shuffled wide. Rows with equal norm tuples always resolve
    to the same canonical ids (the map joins on exactly those keys), so
    resolving the collapsed table and summing the carried counts yields
    the identical edges/nodes tables while the resolve joins and the
    final aggregations see distinct-tuple cardinality instead of
    evidence cardinality (7.5M evidence rows -> a few hundred tuples on
    the bench corpus).
    """
    counts = (
        triples.groupBy(
            F.lower(F.col("subj_text")).alias("subj_norm"),
            "subj_type",
            "pred",
            F.lower(F.col("obj_text")).alias("obj_norm"),
            "obj_type",
        ).agg(F.count("*").alias("n_evidence"))
    )
    resolved = resolve_canonical_ids_normed(counts, canonical_map)
    edges = (
        resolved.groupBy("subj_id", "pred", "obj_id")
        .agg(F.sum("n_evidence").alias("n_evidence"))
    )
    nodes = (
        resolved.select(
            F.col("subj_id").alias("canonical_id"),
            F.col("subj_type").alias("label"),
            F.col("subj_norm").alias("surface"),
        )
        .union(
            resolved.select(
                F.col("obj_id"), F.col("obj_type"), F.col("obj_norm")
            )
        )
        .groupBy("canonical_id", "label")
        .agg(F.array_sort(F.collect_set("surface")).alias("surface_forms"))
    )
    return nodes, edges
