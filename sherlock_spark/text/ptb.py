"""Penn-Treebank bracket-token normalization.

Parity: reference ``sherlock/dataset_readers/tacred.py:179-189`` — a
case-insensitive 6-entry lookup; unknown tokens pass through unchanged.
"""

from __future__ import annotations

PTB_TOKEN_MAP: dict[str, str] = {
    "-lrb-": "(",
    "-rrb-": ")",
    "-lsb-": "[",
    "-rsb-": "]",
    "-lcb-": "{",
    "-rcb-": "}",
}


def convert_ptb_token(token: str) -> str:
    return PTB_TOKEN_MAP.get(token.lower(), token)
