"""O(1)-per-pair entity-marking length semantics via prefix sums.

``tokenize_with_entities`` (marking.py) rebuilds the full marked subword
sequence per mention pair — faithful but O(sentence) per pair, and the
downstream stub classifier only consumes (a) the entity-cutoff flag,
(b) the truncation flag, and (c) the entity pair itself. This module
computes exactly those flags in O(1) per pair after an O(sentence)
per-turn precomputation, relying on a provable property of the
whitespace-first tokenizer: ``tokenize(" ".join(seg)) ==
concat(tokenize(w) for w in seg)``, so segment lengths are prefix-sum
differences of per-word piece counts.

Faithfulness notes (mirrors marking.py, which mirrors
``binary_rc.py:378-493``):

- cutoff is the value of the *last* ``check_truncated_entity`` call;
  since the running length only grows, that is the length right after
  the final marker insertion (or after the appended NER/text block);
- a boundary at index == len(window) emits no marker (loop quirk);
- boundaries at the same index fire in order head_start, tail_start,
  head_end, tail_end;
- ``truncated`` compares the *full* marked length against max_length.

Parity with the reference path is pinned by tests/test_marking_fast.py
over the fixtures and randomized mention layouts.
"""

from __future__ import annotations

from typing import Optional


def piece_prefix_sums(
    piece_counts: list[int],
) -> list[int]:
    """P[i] = total subword pieces of words[0:i]; len = len(words)+1."""
    prefix = [0] * (len(piece_counts) + 1)
    total = 0
    for i, count in enumerate(piece_counts):
        total += count
        prefix[i + 1] = total
    return prefix


def marking_flags(
    prefix: list[int],
    n_words: int,
    head_start: int,
    head_end: int,
    head_label_pieces: int,
    tail_start: int,
    tail_end: int,
    tail_label_pieces: int,
    entity_handling: str,
    max_length: Optional[int],
    n_special_tokens: int = 2,
) -> tuple[bool, bool]:
    """Return (entity_cutoff, truncated) for one mention pair.

    ``head_label_pieces``/``tail_label_pieces`` are the piece counts of
    the ``[HEAD=T]``/``[TAIL=T]`` masks (1 when the tokenizer knows them
    as added tokens).
    """
    if max_length is None:
        return False, False

    head_pieces = prefix[head_end] - prefix[head_start]
    tail_pieces = prefix[tail_end] - prefix[tail_start]
    total_words_pieces = prefix[n_words]

    if entity_handling.startswith("mark_entity"):
        # events: (index, marker order) — markers are 1 piece each
        events = []
        for order, idx in enumerate((head_start, tail_start, head_end, tail_end)):
            if idx < n_words:  # index == n_words never fires (loop quirk)
                events.append((idx, order))
        events.sort()
        if entity_handling == "mark_entity_append_ner":
            # last check is after the [SEP] ner_head [SEP] ner_tail
            # append; ner mask piece counts come from the caller (1 when
            # they are added tokens, more when the tokenizer splits them)
            appended = 2 + head_label_pieces + tail_label_pieces
            last_len = total_words_pieces + len(events) + appended
            return (
                last_len + n_special_tokens > max_length,
                last_len > max_length,
            )
        if not events:
            return False, False
        # length right after the k-th marker: pieces of words before its
        # index that are *not yet buffered* = prefix[idx] + markers so far
        last_idx, _ = events[-1]
        last_len = prefix[last_idx] + len(events)
        full_len = total_words_pieces + len(events)
        return (
            last_len + n_special_tokens > max_length,
            full_len > max_length,
        )

    # mask strategies: masks replace entity words; markers only at starts
    events = []
    for order, (idx, mask_pieces) in enumerate(
        ((head_start, head_label_pieces), (tail_start, tail_label_pieces))
    ):
        if idx < n_words:
            events.append((idx, order, mask_pieces))
    events.sort(key=lambda e: (e[0], e[1]))

    # Coverage must be the UNION of the two spans: the reference loop's
    # if/elif assigns a token inside both spans to head only, so
    # subtracting head and tail independently double-counts the overlap.
    overlap_lo = max(head_start, tail_start)
    overlap_hi = min(head_end, tail_end)

    def union_covered_before(index: int) -> int:
        """pieces of entity-covered words with position < index
        (|head ∪ tail| clipped to [0, index))."""
        covered = 0
        for start, end in ((head_start, head_end), (tail_start, tail_end)):
            lo = min(start, index)
            hi = min(end, index)
            if hi > lo:
                covered += prefix[hi] - prefix[lo]
        lo = min(overlap_lo, index)
        hi = min(overlap_hi, index)
        if hi > lo:
            covered -= prefix[hi] - prefix[lo]
        return covered

    def pieces_outside_entities_before(index: int) -> int:
        """pieces of non-entity words with position < index."""
        return prefix[index] - union_covered_before(index)

    total_masked = (
        total_words_pieces
        - union_covered_before(n_words)
        + sum(e[2] for e in events)
    )
    if entity_handling == "mask_entity_append_text":
        # appended = [SEP] head_words [SEP] tail_words, where the
        # reference's if/elif puts overlap words in head_tokens only:
        # tail contributes pieces(tail \ head)
        overlap_pieces = (
            prefix[overlap_hi] - prefix[overlap_lo]
            if overlap_hi > overlap_lo
            else 0
        )
        appended = 2 + head_pieces + (tail_pieces - overlap_pieces)
        last_len = total_masked + appended
        return (
            last_len + n_special_tokens > max_length,
            last_len > max_length,
        )
    if not events:
        return False, total_masked > max_length
    # last check = right after the last mask insertion
    masks_so_far = sum(e[2] for e in events)
    last_idx = events[-1][0]
    last_len = pieces_outside_entities_before(last_idx) + masks_so_far
    return (
        last_len + n_special_tokens > max_length,
        total_masked > max_length,
    )
