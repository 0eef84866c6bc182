"""Whitespace re-join with character offsets.

Parity: reference ``sherlock/dataset_readers/tacred.py:196-231`` — text is
``" ".join(tokens)`` and each token's char span is assigned by a running
offset that skips exactly one space between tokens. This is the per-turn
text-equality invariant of the whole pipeline (BASELINE.json input_hint).
"""

from __future__ import annotations


def join_with_offsets(tokens: list[str]) -> tuple[str, list[tuple[int, int]]]:
    """Return (text, [(char_start, char_end), ...]) for a token list."""
    offsets: list[tuple[int, int]] = []
    start = 0
    for token in tokens:
        end = start + len(token)
        offsets.append((start, end))
        start = end + 1  # single separating space
    return " ".join(tokens), offsets
