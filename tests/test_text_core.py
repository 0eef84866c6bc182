"""Parity tests for the pure-Python semantic core against the reference
goldens (reference test files cited per case; fixtures loaded from
/root/reference/tests/fixtures, read-only).
"""

import json

import pytest

from sherlock_spark.text import (
    BertLikeTokenizer,
    bio_tags_to_spans,
    convert_ptb_token,
    create_mention_combinations,
    get_entities_conll,
    iob1_tags_to_spans,
    join_with_offsets,
    ner_as_bio,
    to_bioul,
    tokenize_with_entities,
)
from sherlock_spark.text.spans import spans_to_exclusive_sorted

FIXTURES = "/root/reference/tests/fixtures"


def load_tacred():
    with open(f"{FIXTURES}/datasets/tacred.json") as f:
        return json.load(f)


def make_tokenizer(examples):
    tok = BertLikeTokenizer(do_lower_case=True)
    extra = {"[HEAD_START]", "[HEAD_END]", "[TAIL_START]", "[TAIL_END]"}
    for ex in examples:
        extra.add("[HEAD=%s]" % ex["subj_type"].upper())
        extra.add("[TAIL=%s]" % ex["obj_type"].upper())
    tok.add_tokens(sorted(extra))
    return tok


def example_parts(ex):
    """Reader semantics (tacred.py:192-255): PTB-convert, join, mentions."""
    tokens = [convert_ptb_token(t) for t in ex["token"]]
    ments = [
        (ex["subj_start"], ex["subj_end"] + 1, ex["subj_type"]),
        (ex["obj_start"], ex["obj_end"] + 1, ex["obj_type"]),
    ]
    rels = [(0, 1, ex["relation"])]
    sents = [(0, len(tokens))]
    return tokens, ments, rels, sents


# --- tacred_test.py parity ---------------------------------------------

def test_ptb_conversion():
    # tests/dataset_readers/tacred_test.py:88-124
    assert convert_ptb_token("-LRB-") == "("
    assert convert_ptb_token("-rrb-") == ")"
    assert convert_ptb_token("-LSB-") == "["
    assert convert_ptb_token("-rcb-") == "}"
    assert convert_ptb_token("word") == "word"


def test_join_with_offsets_roundtrip():
    for ex in load_tacred():
        tokens = [convert_ptb_token(t) for t in ex["token"]]
        text, offsets = join_with_offsets(tokens)
        assert text == " ".join(tokens)
        for token, (s, e) in zip(tokens, offsets):
            assert text[s:e] == token


def test_ner_as_bio_inserts_argument_types():
    # tacred.py:317-346 semantics on fixture 1
    ex = load_tacred()[0]
    bio = ner_as_bio(
        ex["stanford_ner"],
        ex["subj_start"], ex["subj_end"],
        ex["obj_start"], ex["obj_end"],
        ex["subj_type"], ex["obj_type"],
    )
    assert bio[8] == "B-PERSON" and bio[9] == "I-PERSON"
    assert bio[12] == "B-TITLE"
    assert bio[15] == "B-PERSON" and bio[16] == "I-PERSON"
    assert bio[0] == "O"
    assert len(bio) == len(ex["token"])


# --- binary_rc_test.py golden sequences --------------------------------

GOLD_MARK_ENTITY = [
    "at", "the", "same", "time", ",", "chief", "financial", "officer",
    "[head_start]", "douglas", "flint", "[head_end]", "will", "become",
    "[tail_start]", "chairman", "[tail_end]", ",", "succeeding",
    "stephen", "green", "who", "is", "leaving", "to", "take", "a",
    "government", "job", ".",
]


def run_strategy(strategy, max_length=512):
    examples = load_tacred()
    tok = make_tokenizer(examples)
    ex = examples[0]
    tokens, ments, rels, sents = example_parts(ex)
    head_idx, tail_idx, label, sent_idx = create_mention_combinations(
        rels, ments, sents
    )[0]
    return tokenize_with_entities(
        tokens, ments, sents, head_idx, tail_idx, tok,
        entity_handling=strategy, max_length=max_length, sent_idx=sent_idx,
    )


def test_mark_entity_golden():
    # tests/feature_converters/binary_rc_test.py:167-204 (sans CLS/SEP)
    tokens, cutoff, truncated = run_strategy("mark_entity")
    assert tokens == GOLD_MARK_ENTITY
    assert not cutoff and not truncated


def test_mark_entity_append_ner_golden():
    # binary_rc_test.py:223-260
    tokens, cutoff, truncated = run_strategy("mark_entity_append_ner")
    assert tokens == GOLD_MARK_ENTITY + [
        "[SEP]", "[head=person]", "[SEP]", "[tail=title]",
    ]
    assert not cutoff and not truncated


def test_mask_entity_golden():
    # binary_rc_test.py:283-315
    tokens, cutoff, truncated = run_strategy("mask_entity")
    assert tokens == [
        "at", "the", "same", "time", ",", "chief", "financial", "officer",
        "[head=person]", "will", "become", "[tail=title]", ",",
        "succeeding", "stephen", "green", "who", "is", "leaving", "to",
        "take", "a", "government", "job", ".",
    ]
    assert not cutoff and not truncated


def test_mask_entity_append_text_golden():
    # binary_rc_test.py:334-371
    tokens, cutoff, truncated = run_strategy("mask_entity_append_text")
    assert tokens == [
        "at", "the", "same", "time", ",", "chief", "financial", "officer",
        "[head=person]", "will", "become", "[tail=title]", ",",
        "succeeding", "stephen", "green", "who", "is", "leaving", "to",
        "take", "a", "government", "job", ".", "[SEP]", "douglas",
        "flint", "[SEP]", "chairman",
    ]  # the final wrapping [SEP] is added by encode_plus, not the strategy
    assert not cutoff and not truncated


def test_truncation_at_19():
    # binary_rc_test.py:81-129: kept tokens end right after [tail_end]
    tokens, cutoff, truncated = run_strategy("mark_entity", max_length=19)
    assert truncated and not cutoff
    assert tokens == GOLD_MARK_ENTITY[:17]
    assert tokens[-1] == "[tail_end]"


def test_truncation_boundary_18_drops_all():
    # binary_rc_test.py:132-148: at max_length=18 every instance is cut off
    examples = load_tacred()
    tok = make_tokenizer(examples)
    for ex in examples:
        tokens, ments, rels, sents = example_parts(ex)
        for head_idx, tail_idx, label, sent_idx in create_mention_combinations(
            rels, ments, sents
        ):
            _, cutoff, _ = tokenize_with_entities(
                tokens, ments, sents, head_idx, tail_idx, tok,
                entity_handling="mark_entity", max_length=18,
                sent_idx=sent_idx,
            )
            assert cutoff


def test_encode_plus_wraps_and_pads():
    examples = load_tacred()
    tok = make_tokenizer(examples)
    tokens, _, _ = run_strategy("mark_entity")
    enc = tok.encode_plus_tokens(tokens, max_length=512)
    assert len(enc["input_ids"]) == 512
    assert len(enc["attention_mask"]) == 512
    assert len(enc["token_type_ids"]) == 512
    nonzero = [i for i in enc["input_ids"] if i != 0]
    assert tok.convert_ids_to_tokens(nonzero) == ["[CLS]"] + GOLD_MARK_ENTITY + ["[SEP]"]


# --- pair enumeration (binary_rc.py:290-325) ---------------------------

def test_pairs_use_gold_relations_when_present():
    ex = load_tacred()[0]
    tokens, ments, rels, sents = example_parts(ex)
    assert create_mention_combinations(rels, ments, sents) == [
        (0, 1, "per:title", None)
    ]


def test_pairs_permutations_within_sentence():
    ments = [(0, 1, "A"), (2, 3, "B"), (5, 6, "C")]
    sents = [(0, 4), (4, 8)]
    combos = create_mention_combinations([], ments, sents)
    assert combos == [
        (0, 1, None, 0), (1, 0, None, 0),
    ] + [(2, 2, None, 1)] * 0  # mention 2 alone in sentence 1 -> no pairs
    combos_all = create_mention_combinations([], ments, [])
    assert len(combos_all) == 6  # 3P2 document-wide fallback


# --- BIO span decoding -------------------------------------------------

def test_bio_tags_to_spans_allennlp_semantics():
    spans = sorted(bio_tags_to_spans(["B-PER", "I-PER", "O", "B-LOC"]))
    assert spans == [("LOC", (3, 3)), ("PER", (0, 1))]
    # I- with no active span starts a span (non-strict)
    spans = sorted(bio_tags_to_spans(["O", "I-PER", "I-PER"]))
    assert spans == [("PER", (1, 2))]
    # type switch inside I- run starts a new span
    spans = sorted(bio_tags_to_spans(["B-PER", "I-LOC"]))
    assert spans == [("LOC", (1, 1)), ("PER", (0, 0))]


def test_spans_exclusive_sorted():
    ents = spans_to_exclusive_sorted([("PER", (3, 4)), ("LOC", (0, 0))])
    assert ents == [
        {"start": 0, "end": 1, "label": "LOC"},
        {"start": 3, "end": 5, "label": "PER"},
    ]


def test_iob1_semantics():
    # B- separates adjacent same-type spans; I- after O starts
    spans = sorted(iob1_tags_to_spans(["I-PER", "B-PER", "I-PER", "O"]))
    assert spans == [("PER", (0, 0)), ("PER", (1, 2))]


def test_seqeval_get_entities_on_conll_fixture():
    # conll_2003.py:170-172 consumes seqeval get_entities on IOB1 tags
    ner = ["I-ORG", "O", "I-MISC", "O", "O", "O", "I-MISC", "O", "O"]
    assert get_entities_conll(ner) == [
        ("ORG", 0, 0), ("MISC", 2, 2), ("MISC", 6, 6),
    ]
    ner2 = ["I-PER", "I-PER"]
    assert get_entities_conll(ner2) == [("PER", 0, 1)]


def test_to_bioul():
    assert to_bioul(["I-PER", "I-PER", "O"], encoding="IOB1") == [
        "B-PER", "L-PER", "O",
    ]
    assert to_bioul(["I-PER", "O"], encoding="IOB1") == ["U-PER", "O"]
    with pytest.raises(Exception):
        to_bioul(["I-PER"], encoding="BIO")


# --- tokenizer behavior ------------------------------------------------

def test_tokenizer_basic():
    tok = BertLikeTokenizer()
    assert tok.tokenize("A") == ["a"]
    assert tok.tokenize("Hello, world!") == ["hello", ",", "world", "!"]
    assert tok.tokenize("café") == ["cafe"]
    assert tok.tokenize("") == []


def test_tokenizer_added_tokens_survive():
    tok = BertLikeTokenizer()
    tok.add_tokens(["[HEAD_START]", "[HEAD=PERSON]"])
    # lowercased at add time, matched whole in text
    assert tok.tokenize("[head_start]") == ["[head_start]"]
    assert tok.tokenize("x [head=person] y") == ["x", "[head=person]", "y"]
    assert tok.tokenize("[SEP]") == ["[SEP]"]


def test_tokenizer_wordpiece_with_vocab():
    vocab = {"un": 0, "##able": 1, "able": 2, "[UNK]": 3}
    tok = BertLikeTokenizer(vocab=vocab)
    assert tok.tokenize("unable") == ["un", "##able"]
    assert tok.tokenize("able") == ["able"]
    assert tok.tokenize("zzz") == ["[UNK]"]
