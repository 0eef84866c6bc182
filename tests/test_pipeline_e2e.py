"""End-to-end extraction: transcripts -> tokens -> NER -> pairs -> RC ->
triples, checked against the FIXTURES.md §6 gold triples (P/R gate).
"""

import pytest

from sherlock_spark.model_stub import (
    FIXTURE_NER_LEXICON,
    FIXTURE_RC_LABELS,
    FIXTURE_RC_RULES,
)
from sherlock_spark.operators.metrics import triple_prf
from sherlock_spark.operators.ner import annotate_mentions
from sherlock_spark.operators.rc import extract_triples
from sherlock_spark.sources import synth_transcripts_from_fixtures
from sherlock_spark.sources.transcripts import fixture_sentences

SENTENCES = fixture_sentences()


@pytest.fixture(scope="module")
def triples(spark):
    transcripts = synth_transcripts_from_fixtures(
        spark, n_convs=6, turns_per_conv=3, skew_conv_turns=5
    )
    annotated = annotate_mentions(spark, transcripts, FIXTURE_NER_LEXICON)
    return (
        extract_triples(
            spark,
            annotated,
            labels=FIXTURE_RC_LABELS,
            rule_map=FIXTURE_RC_RULES,
            entity_handling="mark_entity",
            max_length=128,
        ).cache(),
        transcripts,
    )


def gold_for_sentence(text):
    """FIXTURES.md §6: reference-semantics triples per fixture sentence."""
    if text == SENTENCES[0]:
        # mentions: Douglas Flint (PERSON), chairman (TITLE),
        # Stephen Green (PERSON); PERSON-PERSON -> no_relation dropped,
        # TITLE-* pairs unmatched in the rule map -> dropped.
        return [
            ("Douglas Flint", "per:title", "chairman"),
            ("Stephen Green", "per:title", "chairman"),
        ]
    if text == SENTENCES[1]:
        # mentions: Jeffrey White, Julius Baer (both PERSON) -> nothing
        return []
    if text == SENTENCES[2]:
        # mentions: PARIS (CITY), Montcourt (PERSON), Paris (CITY) —
        # the lexicon tags both "PARIS" (token 0) and "Paris" (token 25)
        return [
            ("Montcourt", "per:children", "PARIS"),
            ("Montcourt", "per:children", "Paris"),
        ]
    raise AssertionError(text)


def test_triples_match_reference_semantics(spark, triples):
    triples_df, transcripts = triples
    got = {
        (r.conv_id, r.turn_idx, r.subj_text, r.pred, r.obj_text)
        for r in triples_df.collect()
    }
    expected = set()
    for row in transcripts.collect():
        for subj, pred, obj in gold_for_sentence(row.text):
            expected.add((row.conv_id, row.turn_idx, subj, pred, obj))
    assert got == expected


def test_prf_gate(spark, triples):
    """The BASELINE.md correctness gate: P/R >= 0.95 on fixtures."""
    triples_df, transcripts = triples
    rows = []
    for row in transcripts.collect():
        for subj, pred, obj in gold_for_sentence(row.text):
            rows.append((row.conv_id, row.turn_idx, subj, pred, obj))
    gold_df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj_text string, pred string, obj_text string"
    )
    metrics = triple_prf(triples_df, gold_df)
    assert metrics["precision"] >= 0.95
    assert metrics["recall"] >= 0.95


def test_mentions_and_types(spark, triples):
    triples_df, _ = triples
    row = triples_df.filter(
        triples_df.subj_text == "Douglas Flint"
    ).first()
    assert row.subj_type == "PERSON"
    assert row.obj_type == "TITLE"
    assert row.head_idx != row.tail_idx


def test_no_relation_dropped(spark, triples):
    triples_df, _ = triples
    assert triples_df.filter(triples_df.pred == "no_relation").count() == 0


def test_skew_conversation_processed(spark, triples):
    triples_df, _ = triples
    assert triples_df.filter(triples_df.conv_id == "conv-hot").count() > 0
