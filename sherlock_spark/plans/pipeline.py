"""The extract -> link -> canonicalize -> materialize DAG.

Spark shape of the reference ``Pipeline`` (``sherlock/pipeline.py:14-60``:
a hand-ordered processor list with provenance stamping), rebuilt as
checkpointed DataFrame stages (SURVEY.md §3.2). Each stage materializes
to a table with per-partition lineage; rerunning after a failure skips
completed stages (idempotent resume).

Skew handling: input is repartitioned by ``hash(conv_id, salt)`` with
``salt = turn_idx // chunk_turns`` (``salt_by_conv``): oversized
conversations split into bounded contiguous chunks while normal ones
stay whole. Turn-level work is embarrassingly parallel, so splitting a
conversation is safe — only ordering-sensitive consumers re-sort by
(conv_id, turn_idx).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sherlock_spark.model_stub import (
    DEFAULT_NER_LEXICON,
    DEFAULT_RC_LABELS,
)
from sherlock_spark.operators.canonicalize import canonicalize, materialize_graph
from sherlock_spark.operators.linking import linked_mentions, make_alias_df
from sherlock_spark.operators.ner import annotate_mentions
from sherlock_spark.operators.rc import extract_triples
from sherlock_spark.plans.checkpoint import CheckpointManager


def salt_by_conv(
    df: DataFrame,
    chunk_turns: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """Spread long conversations: partition key (conv_id,
    ``turn_idx // chunk_turns``) — the SURVEY §4 skew safeguard.

    Chunked (not modulo) salting: a conversation with at most
    ``chunk_turns`` turns gets ONE salt value (0) and stays whole — no
    fragmentation of normal conversations — while a mega-conversation
    (the agent-transcript skew case: one conv_id with 10^5+ turns)
    splits into ``ceil(turns / chunk_turns)`` contiguous chunks that
    hash to different tasks. No heavy-key detection pass is needed: the
    salt is a pure per-row expression, costs nothing when no key is
    heavy, and bounds the largest per-task key block at ``chunk_turns``
    rows by construction. Turn-level stages (tokenize/NER/pair-explode)
    are embarrassingly parallel, so splitting a conversation is safe —
    only ordering-sensitive consumers re-sort by (conv_id, turn_idx).

    The partition count is explicit — downstream stages are
    compute-bound (pair explode + model UDFs), and AQE's byte-based
    coalescing would otherwise collapse a small-by-bytes shuffle onto
    one task.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(
        num_partitions,
        F.col("conv_id"),
        F.floor(F.col("turn_idx") / F.lit(chunk_turns)),
    )


def run_kg_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    ner_lexicon: Optional[dict[str, str]] = None,
    rc_labels: Optional[list[str]] = None,
    rc_rule_map: Optional[dict[tuple[str, str], str]] = None,
    aliases: Optional[list[tuple[str, str, str]]] = None,
    entity_handling: str = "mark_entity",
    max_length: int = 128,
    max_mentions: int = 16,
    chunk_turns: int = 256,
) -> dict[str, DataFrame]:
    """Run (or resume) the full KG-construction DAG. Returns the stage
    DataFrames: triples, links, canonical_map, nodes, edges.
    """
    manager = CheckpointManager(spark, out_dir)
    lexicon = DEFAULT_NER_LEXICON if ner_lexicon is None else ner_lexicon
    labels = DEFAULT_RC_LABELS if rc_labels is None else rc_labels

    def build_annotated() -> DataFrame:
        # The NER model stage — the dominant cost of the whole DAG at
        # scale — materialized ONCE and consumed by every downstream
        # builder. Round 5 rebuilt ``annotate_mentions`` inside the
        # triples, links, AND pair-overflow builders, so a cold
        # pipeline run paid the model forward over the full corpus
        # three times; checkpointing the annotated table makes it
        # exactly once per cold run (and zero on resume). Pruned to the
        # columns downstream stages read (conv_id/turn_idx identity,
        # words for surface slicing, ments) — text/raw columns stay out
        # of the stage table.
        salted = salt_by_conv(transcripts, chunk_turns)
        return annotate_mentions(spark, salted, lexicon).select(
            "conv_id", "turn_idx", "words", "ments"
        )

    annotated = manager.run_stage(
        "annotated",
        build_annotated,
        dedup_keys=["conv_id", "turn_idx"],
        repartition_by="conv_id",
    )

    def build_triples() -> DataFrame:
        return extract_triples(
            spark,
            annotated,
            labels=labels,
            rule_map=rc_rule_map,
            entity_handling=entity_handling,
            max_length=max_length,
            max_mentions=max_mentions,
        )

    triples = manager.run_stage(
        "triples",
        build_triples,
        dedup_keys=["conv_id", "turn_idx", "head_idx", "tail_idx"],
        repartition_by="conv_id",
    )

    def build_pair_overflow() -> DataFrame:
        # counted overflow, not silent truncation (SURVEY §4): the
        # max_mentions cap in enumerate_pairs is accounted for in a
        # metrics-table row the lineage output carries
        from sherlock_spark.operators.metrics import pair_overflow_stats

        return pair_overflow_stats(annotated, max_mentions)

    pair_overflow = manager.run_stage(
        "pair_overflow_metrics", build_pair_overflow
    )

    alias_rows = aliases if aliases is not None else default_aliases(lexicon)
    alias_df = make_alias_df(spark, alias_rows)

    def build_links() -> DataFrame:
        return linked_mentions(annotated, alias_df)

    links = manager.run_stage(
        "links",
        build_links,
        dedup_keys=["conv_id", "turn_idx", "ment_idx"],
        repartition_by="conv_id",
    )

    canonical_map = manager.run_stage(
        "canonical_map",
        lambda: canonicalize(links),
        dedup_keys=["ment_norm", "ment_label"],
    )

    def build_nodes() -> DataFrame:
        nodes, _ = materialize_graph(triples, canonical_map)
        return nodes

    def build_edges() -> DataFrame:
        _, edges = materialize_graph(triples, canonical_map)
        return edges

    nodes = manager.run_stage("nodes", build_nodes, dedup_keys=["canonical_id", "label"])
    edges = manager.run_stage(
        "edges", build_edges, dedup_keys=["subj_id", "pred", "obj_id"]
    )

    return {
        "annotated": annotated,
        "triples": triples,
        "links": links,
        "canonical_map": canonical_map,
        "nodes": nodes,
        "edges": edges,
        "pair_overflow_metrics": pair_overflow,
        "lineage": manager.all_lineage(),
    }


def default_aliases(lexicon: dict[str, str]) -> list[tuple[str, str, str]]:
    """One KB id per lexicon surface (types from the BIO tag); gives the
    link stage full coverage on synthetic corpora.
    """
    rows = []
    for word, tag in lexicon.items():
        if tag.startswith("B-"):
            ent_type = tag[2:]
            rows.append((word, f"Q-{word.upper()}", ent_type))
    return rows
