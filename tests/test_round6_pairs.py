"""Round-6 optimization seams: the constant pair-index literal and the
text-input fused NER UDF.

The pair explode was rebuilt from interpreted higher-order functions to
one constant-folded literal + ``element_at`` (rc.py pair_index_array),
and the fused NER UDF now takes raw ``text`` and re-splits in Python
instead of receiving the pre-split words array. Both are internal
reshapes whose outputs must be exactly the old ones; these tests pin
that without going through the (already-green) oracle gate.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sherlock_spark.model_stub import FIXTURE_NER_LEXICON
from sherlock_spark.operators.ner import annotate_mentions
from sherlock_spark.operators.rc import (
    _pair_index_sql,
    enumerate_pairs,
    pair_index_array,
)


def brute_force_pairs(m: int) -> list[tuple[int, int]]:
    """The reference enumeration the old transform/filter/flatten shape
    produced: every ordered (h, t), h != t, nested-loop order."""
    return [(h, t) for h in range(m) for t in range(m) if h != t]


def test_pair_index_literal_matches_bruteforce_for_every_m(spark):
    table = spark.sql(f"SELECT {_pair_index_sql(16)} AS t").collect()[0]["t"]
    assert len(table) == 17  # slots for m = 0..16
    for m in range(17):
        got = [(p["h"], p["t"]) for p in table[m]]
        assert got == brute_force_pairs(m), f"slot m={m} diverges"


def test_pair_index_array_constant_folds(spark):
    # the whole table must reach the executor as ONE literal — a plan
    # that still builds it per row would re-introduce the interpreted
    # walk this construction replaced
    df = spark.range(1).select(
        F.element_at(pair_index_array(16), F.lit(3)).alias("p")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "named_struct" not in plan, "literal did not constant-fold"


def _annotated_fixture(spark):
    rows = [
        ("c0", 0, "douglas flint works with stephen green"),  # 2 ments
        ("c0", 1, "nothing to see here"),  # 0 ments
        ("c0", 2, "douglas"),  # 1 ment -> no pairs
        ("c1", 0, "douglas flint douglas flint douglas flint"),  # repeats
    ]
    transcripts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    return annotate_mentions(spark, transcripts, FIXTURE_NER_LEXICON)


def test_enumerate_pairs_matches_bruteforce_on_fixture(spark):
    annotated = _annotated_fixture(spark)
    ments = {
        (r["conv_id"], r["turn_idx"]): len(r["ments"])
        for r in annotated.select("conv_id", "turn_idx", "ments").collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"], r["head_idx"], r["tail_idx"])
        for r in enumerate_pairs(annotated, max_mentions=16).collect()
    }
    expected = {
        (conv, turn, h, t)
        for (conv, turn), m in ments.items()
        for h, t in brute_force_pairs(min(m, 16))
    }
    assert got == expected
    # the fixture must actually exercise pairs (guard against a vacuous
    # pass if the lexicon ever changes)
    assert any(m >= 2 for m in ments.values())


def test_enumerate_pairs_caps_and_flags_overflow(spark):
    # 5 mentions capped at 3 -> pairs only over indices 0..2, flagged
    text = " ".join(["douglas"] * 5)
    transcripts = spark.createDataFrame(
        [("c", 0, text)], "conv_id string, turn_idx int, text string"
    )
    annotated = annotate_mentions(spark, transcripts, FIXTURE_NER_LEXICON)
    pairs = enumerate_pairs(annotated, max_mentions=3).collect()
    assert {(r["head_idx"], r["tail_idx"]) for r in pairs} == set(
        brute_force_pairs(3)
    )
    assert all(r["ments_overflow"] for r in pairs)


def test_fused_text_udf_matches_two_stage_words_path(spark):
    # the fused UDF re-splits `text` in Python; the two-stage debug path
    # still tags the JVM-split words array — identical mentions pins the
    # split-invariant equivalence the round-6 input change relies on
    rows = [
        ("c0", 0, "douglas flint works with stephen green"),
        ("c0", 1, ""),  # empty text: split yields [''], no mentions
        ("c1", 0, "julius baer and jeffrey white"),
    ]
    transcripts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    fused = (
        annotate_mentions(spark, transcripts, FIXTURE_NER_LEXICON)
        .select("conv_id", "turn_idx", "ments")
        .collect()
    )
    two_stage = (
        annotate_mentions(spark, transcripts, FIXTURE_NER_LEXICON, keep_bio=True)
        .select("conv_id", "turn_idx", "ments")
        .collect()
    )
    key = lambda r: (r["conv_id"], r["turn_idx"])
    assert {key(r): r["ments"] for r in fused} == {
        key(r): r["ments"] for r in two_stage
    }
