"""BIO / IOB1 / BIOUL tag-sequence codecs.

The reference delegates span decoding to two public libraries whose
semantics we replicate exactly (gated by adversarial parity tests):

- allennlp ``span_utils.bio_tags_to_spans`` / ``iob1_tags_to_spans`` —
  used by ``sherlock/dataset_preprocessors/utils.py:128-167`` (end made
  exclusive, spans sorted by start).
- seqeval ``get_entities`` (non-strict mode) — used by the CoNLL reader
  ``sherlock/dataset_readers/conll_2003.py:170-172`` on IOB1 data.

Also here: TACRED raw-tag -> BIO recoding with argument-type insertion
(``sherlock/dataset_readers/tacred.py:317-346``) and the IOB1 -> BIOUL
recode (``sherlock/dataset_readers/span_utils.py:21-124``).
"""

from __future__ import annotations

from typing import Optional

TypedSpan = tuple[str, tuple[int, int]]  # (label, (start, end_inclusive))


class InvalidTagSequence(Exception):
    pass


def _tag_and_type(string_tag: str) -> tuple[str, str]:
    return string_tag[0], string_tag[2:]


def bio_tags_to_spans(
    tag_sequence: list[str], classes_to_ignore: Optional[list[str]] = None
) -> list[TypedSpan]:
    """allennlp-exact BIO decode.

    Semantics: an ``I-`` tag whose type differs from the active span (or
    with no active span) *starts a new span* rather than raising; ``O``
    closes any active span. Returns inclusive-end spans, unordered.
    """
    ignore = set(classes_to_ignore or [])
    spans: set[TypedSpan] = set()
    span_start = 0
    span_end = 0
    active: Optional[str] = None
    for index, string_tag in enumerate(tag_sequence):
        bio_tag, conll_tag = _tag_and_type(string_tag)
        if bio_tag not in ("B", "I", "O"):
            raise InvalidTagSequence(tag_sequence)
        if bio_tag == "O" or conll_tag in ignore:
            if active is not None:
                spans.add((active, (span_start, span_end)))
            active = None
            continue
        if bio_tag == "B" or conll_tag != active:
            if active is not None:
                spans.add((active, (span_start, span_end)))
            active = conll_tag
            span_start = index
            span_end = index
        else:  # I- continuing the active span
            span_end += 1
    if active is not None:
        spans.add((active, (span_start, span_end)))
    return list(spans)


def iob1_tags_to_spans(
    tag_sequence: list[str], classes_to_ignore: Optional[list[str]] = None
) -> list[TypedSpan]:
    """allennlp-exact IOB1 decode: ``B-`` only separates two adjacent
    same-type spans; ``I-`` after ``O`` or a different type starts a span.
    """
    ignore = set(classes_to_ignore or [])
    spans: set[TypedSpan] = set()
    span_start = 0
    span_end = 0
    active: Optional[str] = None
    prev_bio = "O"
    prev_type: Optional[str] = None
    for index, string_tag in enumerate(tag_sequence):
        bio_tag, conll_tag = _tag_and_type(string_tag)
        if bio_tag not in ("B", "I", "O"):
            raise InvalidTagSequence(tag_sequence)
        if bio_tag == "O" or conll_tag in ignore:
            if active is not None:
                spans.add((active, (span_start, span_end)))
            active = None
        elif bio_tag == "B" or (
            bio_tag == "I" and not (prev_bio in ("B", "I") and prev_type == conll_tag)
        ):
            # starts a new span
            if active is not None:
                spans.add((active, (span_start, span_end)))
            active = conll_tag
            span_start = index
            span_end = index
        else:
            span_end += 1
        prev_bio, prev_type = bio_tag, conll_tag
    if active is not None:
        spans.add((active, (span_start, span_end)))
    return list(spans)


def spans_to_exclusive_sorted(spans: list[TypedSpan]) -> list[dict]:
    """Reference ``utils.get_entities`` post-processing
    (``dataset_preprocessors/utils.py:156-167``): end made exclusive,
    sorted by start, dict form.
    """
    entities = [
        {"start": span[0], "end": span[1] + 1, "label": label}
        for label, span in spans
    ]
    entities.sort(key=lambda entity: entity["start"])
    return entities


# --- seqeval (non-strict) semantics, used on CoNLL IOB1 data ------------

def _seqeval_end_of_chunk(prev_tag: str, tag: str, prev_type: str, type_: str) -> bool:
    if prev_tag in ("E", "S"):
        return True
    if prev_tag == "B" and tag in ("B", "S", "O"):
        return True
    if prev_tag == "I" and tag in ("B", "S", "O"):
        return True
    if prev_tag not in ("O", "."):
        if prev_type != type_:
            return True
    return False


def _seqeval_start_of_chunk(prev_tag: str, tag: str, prev_type: str, type_: str) -> bool:
    if tag in ("B", "S"):
        return True
    if prev_tag in ("E", "S") and tag in ("E", "I"):
        return True
    if prev_tag == "O" and tag in ("E", "I"):
        return True
    if tag not in ("O", "."):
        if prev_type != type_:
            return True
    return False


def get_entities_conll(seq: list[str]) -> list[tuple[str, int, int]]:
    """seqeval-exact ``get_entities`` (default, non-strict).

    Returns (type, start, end_inclusive) chunks; handles IOB1 input the
    way the CoNLL reader relies on (``conll_2003.py:170-172``).
    """
    prev_tag = "O"
    prev_type = ""
    begin_offset = 0
    chunks: list[tuple[str, int, int]] = []
    for i, chunk in enumerate(list(seq) + ["O"]):
        tag = chunk[0]
        type_ = chunk.split("-")[-1]
        if _seqeval_end_of_chunk(prev_tag, tag, prev_type, type_):
            chunks.append((prev_type, begin_offset, i - 1))
        if _seqeval_start_of_chunk(prev_tag, tag, prev_type, type_):
            begin_offset = i
        prev_tag = tag
        prev_type = type_
    return chunks


# --- TACRED raw tags -> BIO (tacred.py:317-346) -------------------------

def ner_as_bio(
    raw_tags: list[str],
    subj_start: int,
    subj_end_inclusive: int,
    obj_start: int,
    obj_end_inclusive: int,
    subj_type: str,
    obj_type: str,
    insert_argument_types: bool = True,
) -> list[str]:
    """Overwrite tags inside argument spans with argument types, then
    recode raw tags to BIO: ``B-`` on type change, ``I-`` on repetition.
    """
    tags = list(raw_tags)
    if insert_argument_types:
        for i in range(subj_start, subj_end_inclusive + 1):
            tags[i] = subj_type
        for i in range(obj_start, obj_end_inclusive + 1):
            tags[i] = obj_type
    bio_tags: list[str] = []
    prev: Optional[str] = None
    for tag in tags:
        if tag == "O":
            bio_tags.append(tag)
            prev = None
            continue
        prefix = "I-" if tag == prev else "B-"
        bio_tags.append(prefix + tag)
        prev = tag
    return bio_tags


# --- IOB1/BIO -> BIOUL (dataset_readers/span_utils.py:21-124) -----------

def to_bioul(tag_sequence: list[str], encoding: str = "IOB1") -> list[str]:
    if encoding not in ("IOB1", "BIO"):
        raise ValueError(f"Invalid encoding {encoding} passed to 'to_bioul'.")

    def relabel(full_label: str, new_label: str) -> str:
        head, sep, rest = full_label.partition("-")
        return new_label + sep + rest

    def process_stack(stack: list[str], out: list[str]) -> None:
        if len(stack) == 1:
            out.append(relabel(stack.pop(), "U"))
            return
        recoded = [relabel(stack.pop(), "L")]
        while len(stack) >= 2:
            recoded.append(relabel(stack.pop(), "I"))
        recoded.append(relabel(stack.pop(), "B"))
        recoded.reverse()
        out.extend(recoded)

    bioul: list[str] = []
    stack: list[str] = []
    for label in tag_sequence:
        if label == "O":
            if stack:
                process_stack(stack, bioul)
            bioul.append(label)
        elif label[0] == "I":
            if not stack:
                if encoding == "BIO":
                    raise InvalidTagSequence(tag_sequence)
                stack.append(label)
            elif label.partition("-")[2] == stack[-1].partition("-")[2]:
                stack.append(label)
            else:
                if encoding == "BIO":
                    raise InvalidTagSequence(tag_sequence)
                process_stack(stack, bioul)
                stack.append(label)
        elif label[0] == "B":
            if stack:
                process_stack(stack, bioul)
            stack.append(label)
        else:
            raise InvalidTagSequence(tag_sequence)
    if stack:
        process_stack(stack, bioul)
    return bioul
