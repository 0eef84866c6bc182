"""Deterministic stand-in "models" for NER and relation classification.

The container ships no torch/transformers, and the reference's own test
suite never loads trained weights either (it tests converters, not
models). These stubs keep the full distributed inference *shape* —
iterator pandas UDFs, per-executor singleton load, sub-batching, logits
-> argmax decode — while making the forward pass a deterministic pure
function, so the whole extract pipeline has an exact cross-engine oracle
(the same functions are expressible in ANSI SQL for the DuckDB gate).

Decision functions
------------------
- NER: a broadcast lexicon maps a lowercased word to a type; tags are
  ``B-<TYPE>`` (single-word mentions) — the annotator still decodes via
  generic BIO span logic, so multi-word lexicon support is a data
  change, not a code change.
- RC: label index = ``md5_digit_bucket(subj_type|obj_type|subj|obj)``
  over the label vocabulary, with index 0 = ``no_relation`` dropped by
  the annotator exactly like the reference
  (``transformers_binary_rc.py:42-49``). ``md5_digit_bucket`` keeps only
  the decimal digits of the md5 hex so the same value is computable in
  both Spark SQL and DuckDB without engine-specific hashes.

On a real cluster the stub classes are swapped for HF models behind the
same ``predict_*`` interface; everything around them (batching, Arrow,
broadcast, decode) is production code.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_DIGITS = re.compile(r"[a-f]")
MD5_DIGIT_COUNT = 6


def md5_digit_bucket(key: str, n_buckets: int) -> int:
    """First 6 decimal digits of md5-hex(key), mod n_buckets.

    Portable definition (same result in Spark SQL and DuckDB):
    ``cast(substring(concat(regexp_replace(md5(key), '[a-f]', ''),
    '000000'), 1, 6) as int) % n_buckets``.
    """
    hex_digest = hashlib.md5(key.encode("utf-8")).hexdigest()
    digits = (_DIGITS.sub("", hex_digest) + "0" * MD5_DIGIT_COUNT)[:MD5_DIGIT_COUNT]
    return int(digits) % n_buckets


def md5_digit_bucket_sql(key_sql: str, n_buckets: int, dialect: str = "spark") -> str:
    """The same function as a SQL expression over expression ``key_sql``.

    Spark's ``regexp_replace`` is global; DuckDB needs the ``'g'`` flag.
    """
    if dialect == "duckdb":
        stripped = f"regexp_replace(md5({key_sql}), '[a-f]', '', 'g')"
    else:
        stripped = f"regexp_replace(md5({key_sql}), '[a-f]', '')"
    return (
        f"cast(substring(concat({stripped},"
        f" '000000'), 1, {MD5_DIGIT_COUNT}) as int) % {n_buckets}"
    )


# Default entity lexicon for synthetic transcript corpora (the driver's
# ``documents`` table text is built from a small data-engineering
# vocabulary; see FIXTURES.md §7). Keys are lowercase words, values are
# full BIO tags so multi-word mentions (B- followed by I-) work through
# the generic span decoder.
DEFAULT_NER_LEXICON: dict[str, str] = {
    "spark": "B-ENGINE",
    "window": "B-OPERATOR",
    "hash": "B-OPERATOR",
    "join": "B-OPERATOR",
    "scan": "B-OPERATOR",
    "sort": "B-OPERATOR",
    "merge": "B-OPERATOR",
    "stream": "B-SOURCE",
    "batch": "B-SOURCE",
    "table": "B-SOURCE",
}

# Lexicon reproducing the reference fixtures' gold mentions
# (FIXTURES.md §6): B-/I- adjacency forms the multi-word spans
# "Douglas Flint", "Stephen Green", "Jeffrey White", "Julius Baer".
FIXTURE_NER_LEXICON: dict[str, str] = {
    "douglas": "B-PERSON",
    "flint": "I-PERSON",
    "stephen": "B-PERSON",
    "green": "I-PERSON",
    "jeffrey": "B-PERSON",
    "white": "I-PERSON",
    "julius": "B-PERSON",
    "baer": "I-PERSON",
    "montcourt": "B-PERSON",
    "chairman": "B-TITLE",
    "paris": "B-CITY",
}

# Rule-based RC decision reproducing FIXTURES.md §6 gold triples:
# (Douglas Flint, per:title, chairman), (Montcourt, per:children, PARIS),
# PERSON-PERSON pairs -> no_relation (dropped).
FIXTURE_RC_RULES: dict[tuple[str, str], str] = {
    ("PERSON", "TITLE"): "per:title",
    ("PERSON", "CITY"): "per:children",
    ("PERSON", "PERSON"): "no_relation",
}

FIXTURE_RC_LABELS: list[str] = [
    "no_relation",
    "per:title",
    "per:children",
    "per:parents",
]

# Default RC label vocabulary for synthetic corpora; index 0 is the
# negative label (reference invariant: tacred.py:304-307).
DEFAULT_RC_LABELS: list[str] = [
    "no_relation",
    "op:reads_from",
    "op:feeds",
    "op:colocated_with",
    "op:optimizes",
]


class StubNerModel:
    """Vectorized lexicon tagger with a logits-shaped output.

    ``predict_tags(batch_of_token_lists) -> list[list[str]]`` mirrors the
    argmax(axis=2) decode of the reference token-classification head
    (``transformers_token_clf.py:29-40``): we emit per-token label ids
    via the lexicon, then turn ids back into BIO tags.
    """

    def __init__(self, lexicon: dict[str, str] | None = None) -> None:
        self.lexicon = DEFAULT_NER_LEXICON if lexicon is None else lexicon

    def predict_tags(self, token_lists: list[list[str]]) -> list[list[str]]:
        lexicon = self.lexicon
        return [
            [lexicon.get(word.lower(), "O") for word in words]
            for words in token_lists
        ]


class StubRcModel:
    """Deterministic pair classifier emitting logits over a label vocab.

    ``forward(keys) -> np.ndarray[n, n_labels]``: one-hot-ish logits
    whose argmax is ``md5_digit_bucket(key, n_labels)``. The annotator
    applies ``argmax(axis=1)`` exactly like the reference
    (``transformers_binary_rc.py:42``).
    """

    def __init__(
        self,
        labels: list[str] | None = None,
        rule_map: dict[tuple[str, str], str] | None = None,
    ) -> None:
        self.labels = DEFAULT_RC_LABELS if labels is None else labels
        self.label_to_id = {label: i for i, label in enumerate(self.labels)}
        # optional (subj_type, obj_type) -> label rules; unmatched pairs
        # fall back to the md5 bucket. Mirrors the reference's
        # relation->entity-type rule map (add_ner_annotation.py:20-210)
        # used in reverse as a deterministic classifier.
        self.rule_map = rule_map

    @staticmethod
    def pair_key(subj_type: str, obj_type: str, subj_text: str, obj_text: str) -> str:
        return f"{subj_type}|{obj_type}|{subj_text}|{obj_text}"

    def _label_id(self, subj_type: str, obj_type: str, key: str) -> int:
        if self.rule_map is not None:
            label = self.rule_map.get((subj_type, obj_type))
            if label is not None:
                return self.label_to_id[label]
            return 0  # unmatched pair -> negative label
        return md5_digit_bucket(key, len(self.labels))

    def forward_pairs(
        self, pairs: list[tuple[str, str, str, str]]
    ) -> np.ndarray:
        """(subj_type, obj_type, subj_text, obj_text) batch -> logits."""
        n_labels = len(self.labels)
        logits = np.full((len(pairs), n_labels), -10.0, dtype=np.float64)
        for row, (subj_type, obj_type, subj_text, obj_text) in enumerate(pairs):
            key = self.pair_key(subj_type, obj_type, subj_text, obj_text)
            logits[row, self._label_id(subj_type, obj_type, key)] = 10.0
        return logits
