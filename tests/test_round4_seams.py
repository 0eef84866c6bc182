"""Round-4 seam tests: stale-bundle detection, the optional-import
real-model path, and dedup_model_inputs memory discipline."""

from __future__ import annotations

import time

import pytest

from sherlock_spark.model_stub import FIXTURE_RC_LABELS


CONLL_FIXTURE = "/root/reference/tests/fixtures/datasets/conll.txt"


def test_salt_by_conv_spreads_mega_conversation(spark):
    """SURVEY §4 skew safeguard: one mega-conversation among uniform
    ones must not hot-spot a single task. With chunked salting
    (salt = turn_idx // chunk) no partition holds more than ~2x the
    mean row count, while unsalted conv_id partitioning necessarily
    pins the whole hot conversation on one task."""
    from pyspark.sql import functions as F

    from sherlock_spark.plans.pipeline import salt_by_conv
    from sherlock_spark.sources.transcripts import (
        synth_transcripts_from_fixtures,
    )

    n_parts = 8
    transcripts = synth_transcripts_from_fixtures(
        spark, n_convs=20, turns_per_conv=50, skew_conv_turns=20_000
    )
    total = 20 * 50 + 20_000
    mean = total / n_parts

    def partition_counts(df):
        rows = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        return [row["count"] for row in rows]

    # unsalted: the hot conversation's 20k rows land on ONE task
    unsalted = transcripts.repartition(n_parts, F.col("conv_id"))
    assert max(partition_counts(unsalted)) >= 20_000

    # salted: bounded chunks spread the hot conversation
    salted = salt_by_conv(
        transcripts, chunk_turns=256, num_partitions=n_parts
    )
    counts = partition_counts(salted)
    assert max(counts) <= 2 * mean, counts
    # row-preserving: salting is a repartition, never a filter
    assert sum(counts) == total

    # conversations at or under chunk_turns keep a single salt value —
    # normal conversations are not fragmented by the safeguard
    one_salt = (
        transcripts.filter(F.col("conv_id") != "conv-hot")
        .select(
            "conv_id",
            F.floor(F.col("turn_idx") / F.lit(256)).alias("salt"),
        )
        .groupBy("conv_id")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .agg(F.max("n_salts").alias("m"))
        .collect()[0]["m"]
    )
    assert one_salt == 1


def test_conll_reader_scale_shape(spark, tmp_path):
    """The CoNLL reader must parallelize per input file: no
    single-partition global window, no row-at-a-time Python UDF
    (the round-3 S3 `weak` finding). A directory of two files reads as
    two independent units with per-file guid numbering."""
    import shutil

    from sherlock_spark.sources.conll import read_conll2003

    # plan shape on the reference fixture
    df = read_conll2003(spark, CONLL_FIXTURE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan  # IOB1 decode is Arrow-batched
    assert "ArrowEvalPython" in plan

    # multi-file directory: each file is its own unit, guids restart
    corpus = tmp_path / "conll_corpus"
    corpus.mkdir()
    shutil.copyfile(CONLL_FIXTURE, corpus / "shard_a.txt")
    shutil.copyfile(CONLL_FIXTURE, corpus / "shard_b.txt")
    docs = read_conll2003(spark, str(corpus)).collect()
    assert len(docs) == 16  # 8 sentences per shard
    by_prefix = {}
    for doc in docs:
        prefix, n = doc.guid.rsplit("-", 1)
        by_prefix.setdefault(prefix, []).append(int(n))
    assert set(by_prefix) == {"shard_a.txt", "shard_b.txt"}
    assert sorted(by_prefix["shard_a.txt"]) == list(range(1, 9))
    assert sorted(by_prefix["shard_b.txt"]) == list(range(1, 9))
    # per-file content identical to the single-file read
    single = {
        doc.guid.split("-")[-1]: (doc.text, [tuple(m) for m in doc.ments])
        for doc in read_conll2003(spark, CONLL_FIXTURE).collect()
    }
    for doc in docs:
        n = doc.guid.rsplit("-", 1)[1]
        assert (doc.text, [tuple(m) for m in doc.ments]) == single[n]


def test_distribute_pretrained_retrained_in_place_raises(spark, tmp_path):
    """A model dir RETRAINED IN PLACE (same path, new content) must not
    short-circuit to the stale shipped bundle — executors resolve
    SparkFiles by name and would silently serve the first-shipped
    weights. The content digest makes this loud, AND the raise happens
    BEFORE sc.addFile: mutating an already-registered path breaks
    Spark's own dependency fetch for every later task ("exists and does
    not match contents", observed empirically), so the prior
    registration is simulated registry-side here instead of poisoning
    the shared test session with a real addFile + mutation."""
    import os

    from sherlock_spark.operators.features import (
        _DISTRIBUTED,
        _dir_digest,
        distribute_pretrained,
        save_rc_pretrained_dir,
    )

    model_dir = tmp_path / "rc_retrain_model"
    save_rc_pretrained_dir(str(model_dir), FIXTURE_RC_LABELS)
    norm = os.path.abspath(str(model_dir))

    key = (spark.sparkContext.applicationId, "rc_retrain_model")
    _DISTRIBUTED[key] = (norm, _dir_digest(norm))
    try:
        # unchanged content: benign short-circuit, addFile never reached
        assert (
            distribute_pretrained(spark, str(model_dir))
            == "rc_retrain_model"
        )

        # retrain in place: rewrite the vocab (clock bumped so the
        # stat-based digest must move even at coarse mtime resolution)
        time.sleep(0.01)
        save_rc_pretrained_dir(str(model_dir), ["no_relation", "per:other"])
        with pytest.raises(ValueError, match="content has changed"):
            distribute_pretrained(spark, str(model_dir))
        # the raise happened driver-side, before sc.addFile — session
        # alive and the poisonous registration never reached Spark
        assert spark.range(10).count() == 10
    finally:
        _DISTRIBUTED.pop(key, None)
