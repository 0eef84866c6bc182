"""Structured Streaming variant of the extraction pipeline."""

from sherlock_spark.streaming.stream import (
    stream_extract_triples,
    stream_triple_rates,
)

__all__ = ["stream_extract_triples", "stream_triple_rates"]
