"""Sequence packing — concat-and-chunk assignment of documents to
fixed-capacity context windows (the GPT-style pretraining layout:
documents concatenated in a deterministic order, the stream split
every ``capacity`` tokens).

Scale shape: documents hash to ``buckets`` independent packing streams
(a distributed packer never packs globally — one global stream would
be a single-partition prefix sum), each stream is ONE window prefix
sum ordered by doc_id, and every derived quantity (chunk id, offset,
boundary crossings) is closed-form integer arithmetic on that prefix
sum. One shuffle (the window's hash partitioning on bucket), no
Python, no iteration. Determinism: same inputs => same layout, so a
resumed packing job reproduces the exact byte offsets — the property
checkpointed tokenizer pipelines rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sherlock_spark.functions.textstats import token_count


def pack_chunks(
    documents: DataFrame,
    capacity: int = 512,
    buckets: int = 32,
    tokens: Column | None = None,
) -> DataFrame:
    """Assign each document its place in the packed token stream:
    (bucket, chunk_id, chunk_offset, n_tokens, n_boundary_crossings).

    ``chunk_id`` is the context window holding the document's FIRST
    token; ``n_boundary_crossings`` counts how many window boundaries
    the document straddles (0 = fits inside its window — the fraction
    of split documents is the packing-quality metric). ``tokens``
    overrides the token counter (e.g. a precomputed BPE length column);
    defaults to the regex token count. Bucketing is ``doc_id % buckets``
    so the oracle replays it exactly; at scale swap in any deterministic
    hash — the layout contract only needs the bucket to be a pure
    function of the document.
    """
    toks = tokens if tokens is not None else token_count(F.col("text"))
    sized = documents.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(buckets)).cast("long").alias("bucket"),
        toks.cast("long").alias("n_tokens"),
    )
    window = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stream_end = F.sum("n_tokens").over(window)
    start = (stream_end - F.col("n_tokens")).alias("start")
    out = sized.select("doc_id", "bucket", "n_tokens", start,
                       stream_end.alias("stream_end"))
    chunk = F.floor(F.col("start") / capacity)
    last_chunk = F.floor(
        (F.greatest(F.col("stream_end"), F.col("start") + 1) - 1) / capacity
    )
    return out.select(
        "doc_id",
        "bucket",
        chunk.cast("long").alias("chunk_id"),
        F.pmod(F.col("start"), F.lit(capacity)).cast("long").alias(
            "chunk_offset"
        ),
        "n_tokens",
        (last_chunk - chunk).cast("long").alias("n_boundary_crossings"),
    )
