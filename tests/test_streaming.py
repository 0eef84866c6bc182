"""Structured Streaming extraction: backlog processing, incremental
batches without duplicates, and windowed aggregation."""

import os

import pytest

from sherlock_spark.model_stub import (
    FIXTURE_NER_LEXICON,
    FIXTURE_RC_LABELS,
    FIXTURE_RC_RULES,
)
from sherlock_spark.sources import synth_transcripts_from_fixtures
from sherlock_spark.streaming import stream_extract_triples, stream_triple_rates


def test_streaming_extraction_incremental(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    checkpoint_dir = str(tmp_path / "ckpt")

    batch1 = synth_transcripts_from_fixtures(spark, n_convs=3, turns_per_conv=2)
    batch1.write.mode("append").parquet(input_dir)

    query = stream_extract_triples(
        spark, input_dir, output_dir, checkpoint_dir,
        ner_lexicon=FIXTURE_NER_LEXICON,
        rc_labels=FIXTURE_RC_LABELS,
        rc_rule_map=FIXTURE_RC_RULES,
    )
    query.awaitTermination(120)

    first = spark.read.parquet(output_dir)
    n_first = first.count()
    assert n_first > 0
    assert set(first.columns) >= {"conv_id", "turn_idx", "subj_text", "pred", "obj_text"}

    # second wave of files: new conversations; rerun with the same
    # checkpoint — only the new files are processed, no duplicates
    batch2 = (
        synth_transcripts_from_fixtures(spark, n_convs=3, turns_per_conv=2)
        .selectExpr(
            "concat('new-', conv_id) as conv_id", "turn_idx", "role",
            "text", "tool", "ts",
        )
    )
    batch2.write.mode("append").parquet(input_dir)

    query2 = stream_extract_triples(
        spark, input_dir, output_dir, checkpoint_dir,
        ner_lexicon=FIXTURE_NER_LEXICON,
        rc_labels=FIXTURE_RC_LABELS,
        rc_rule_map=FIXTURE_RC_RULES,
    )
    query2.awaitTermination(120)

    result = spark.read.parquet(output_dir)
    assert result.count() == 2 * n_first
    dups = (
        result.groupBy("conv_id", "turn_idx", "head_idx", "tail_idx")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0


def test_streaming_windowed_rates(spark, tmp_path):
    input_dir = str(tmp_path / "in2")
    checkpoint_dir = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "rates")

    synth_transcripts_from_fixtures(spark, n_convs=2, turns_per_conv=12).write.mode(
        "append"
    ).parquet(input_dir)

    rates = stream_triple_rates(
        spark, input_dir, checkpoint_dir, ner_lexicon=FIXTURE_NER_LEXICON
    )
    query = (
        rates.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    # append mode emits only watermark-closed windows; with availableNow
    # over a finite backlog the final windows stay open, so assert the
    # aggregation ran and the schema is right (rows may be 0)
    result = spark.read.parquet(out_dir)
    assert set(result.columns) == {"window_start", "conv_id", "n_mentions", "n_turns"}
