"""Mention-pair enumeration and entity-marking strategies.

Faithful reimplementation (semantics only — our data model is plain
tuples, not Document objects) of:

- ``sherlock/feature_converters/binary_rc.py:290-325``
  (``_create_mention_combinations``): gold relations win; otherwise all
  ordered mention pairs within a sentence (``sent.start <= ment.start <
  sent.end``); otherwise all ordered pairs document-wide.
- ``sherlock/feature_converters/binary_rc.py:378-493``
  (``_tokenize_with_entities``): four entity-handling strategies with
  joint tokenization of inter-marker segments, entity-cutoff detection
  and final truncation to ``max_length - n_special_tokens``.

Quirks preserved on purpose (they are observable in the goldens):

- at a position where several boundaries coincide, markers are emitted in
  the fixed order head_start, tail_start, head_end, tail_end;
- a mention ending exactly at the end of the token window emits no end
  marker (the loop never visits index ``len(input_tokens)``);
- ``entity_cutoff`` is (re)checked only right after a marker insertion,
  against ``len(tokens) + n_special_tokens > max_length``.
"""

from __future__ import annotations

from itertools import permutations
from typing import Optional

ENTITY_HANDLING_STRATEGIES = (
    "mark_entity",
    "mark_entity_append_ner",
    "mask_entity",
    "mask_entity_append_text",
)

Mention = tuple[int, int, str]  # (token_start, token_end_exclusive, label)
Combination = tuple[int, int, Optional[str], Optional[int]]


def create_mention_combinations(
    rels: list[tuple[int, int, str]],
    ments: list[Mention],
    sents: list[tuple[int, int]],
) -> list[Combination]:
    """(head_idx, tail_idx, label, sent_idx) tuples to classify."""
    combinations: list[Combination] = []
    if rels:
        for head_idx, tail_idx, label in rels:
            combinations.append((head_idx, tail_idx, label, None))
        return combinations
    if sents:
        for sent_idx, (sent_start, sent_end) in enumerate(sents):
            sent_ments = [
                idx
                for idx, ment in enumerate(ments)
                if sent_start <= ment[0] < sent_end
            ]
            for head_idx, tail_idx in permutations(sent_ments, r=2):
                combinations.append((head_idx, tail_idx, None, sent_idx))
        return combinations
    for head_idx, tail_idx in permutations(range(len(ments)), r=2):
        combinations.append((head_idx, tail_idx, None, None))
    return combinations


def tokenize_with_entities(
    token_texts: list[str],
    ments: list[Mention],
    sents: list[tuple[int, int]],
    head_idx: int,
    tail_idx: int,
    tokenizer,
    entity_handling: str = "mark_entity",
    max_length: Optional[int] = None,
    sent_idx: Optional[int] = None,
    sep_token: str = "[SEP]",
) -> tuple[list[str], bool, bool]:
    """Apply an entity-handling strategy and subword-tokenize.

    Returns (subword_tokens, entity_cutoff, truncated). ``tokenizer`` is
    any object with ``tokenize(str) -> list[str]`` and
    ``num_special_tokens_to_add()``; marker casing follows the
    tokenizer's lowercase probe exactly like the reference
    (``binary_rc.py:109,167-175``).
    """
    if entity_handling not in ENTITY_HANDLING_STRATEGIES:
        raise ValueError(f"Unknown entity handling '{entity_handling}'.")

    lower_cases = "a" in " ".join(tokenizer.tokenize("A"))
    n_special_tokens = tokenizer.num_special_tokens_to_add()
    if lower_cases:
        marker_tokens = ["[head_start]", "[head_end]", "[tail_start]", "[tail_end]"]
    else:
        marker_tokens = ["[HEAD_START]", "[HEAD_END]", "[TAIL_START]", "[TAIL_END]"]

    head_start, head_end, head_label = ments[head_idx]
    tail_start, tail_end, tail_label = ments[tail_idx]
    ner_head = f"[HEAD={head_label}]"
    ner_tail = f"[TAIL={tail_label}]"
    if lower_cases:
        ner_head = ner_head.lower()
        ner_tail = ner_tail.lower()

    if sent_idx is None:
        window = token_texts
    else:
        sent_start, sent_end = sents[sent_idx]
        window = token_texts[sent_start:sent_end]

    def check_cutoff(tokens: list[str]) -> bool:
        if max_length:
            return len(tokens) + n_special_tokens > max_length
        return False

    truncated_entity = False
    tokens: list[str] = []
    temporary: list[str] = []

    if entity_handling.startswith("mark_entity"):
        for i, token in enumerate(window):
            if i == head_start:
                tokens.extend(tokenizer.tokenize(" ".join(temporary)))
                temporary = []
                tokens.extend(tokenizer.tokenize(marker_tokens[0]))
                truncated_entity = check_cutoff(tokens)
            if i == tail_start:
                tokens.extend(tokenizer.tokenize(" ".join(temporary)))
                temporary = []
                tokens.extend(tokenizer.tokenize(marker_tokens[2]))
                truncated_entity = check_cutoff(tokens)
            if i == head_end:
                tokens.extend(tokenizer.tokenize(" ".join(temporary)))
                temporary = []
                tokens.extend(tokenizer.tokenize(marker_tokens[1]))
                truncated_entity = check_cutoff(tokens)
            if i == tail_end:
                tokens.extend(tokenizer.tokenize(" ".join(temporary)))
                temporary = []
                tokens.extend(tokenizer.tokenize(marker_tokens[3]))
                truncated_entity = check_cutoff(tokens)
            temporary.append(token)
        if temporary:
            tokens.extend(tokenizer.tokenize(" ".join(temporary)))
        if entity_handling == "mark_entity_append_ner":
            for special in (sep_token, ner_head, sep_token, ner_tail):
                tokens.extend(tokenizer.tokenize(special))
            truncated_entity = check_cutoff(tokens)
    else:
        head_tokens: list[str] = []
        tail_tokens: list[str] = []
        for i, token in enumerate(window):
            if i == head_start:
                tokens.extend(tokenizer.tokenize(" ".join(temporary)))
                temporary = []
                tokens.extend(tokenizer.tokenize(ner_head))
                truncated_entity = check_cutoff(tokens)
            if i == tail_start:
                tokens.extend(tokenizer.tokenize(" ".join(temporary)))
                temporary = []
                tokens.extend(tokenizer.tokenize(ner_tail))
                truncated_entity = check_cutoff(tokens)
            if head_start <= i < head_end:
                head_tokens.append(token)
            elif tail_start <= i < tail_end:
                tail_tokens.append(token)
            else:
                temporary.append(token)
        if temporary:
            tokens.extend(tokenizer.tokenize(" ".join(temporary)))
        if entity_handling == "mask_entity_append_text":
            tokens.extend(tokenizer.tokenize(sep_token))
            tokens.extend(tokenizer.tokenize(" ".join(head_tokens)))
            tokens.extend(tokenizer.tokenize(sep_token))
            tokens.extend(tokenizer.tokenize(" ".join(tail_tokens)))
            truncated_entity = check_cutoff(tokens)

    if max_length:
        truncated = len(tokens) > max_length
        return tokens[: max_length - n_special_tokens], truncated_entity, truncated
    return tokens, truncated_entity, False
