"""Pure-Python semantic core, shared verbatim between Spark UDFs and tests.

Everything in this package is deterministic, dependency-free, and
import-shared so the exact same bytes run inside pandas UDFs and in the
pytest parity suite (SURVEY.md §7 "hard parts": tokenizer equality).
"""

from sherlock_spark.text.ptb import PTB_TOKEN_MAP, convert_ptb_token
from sherlock_spark.text.whitespace import join_with_offsets
from sherlock_spark.text.spans import (
    bio_tags_to_spans,
    get_entities_conll,
    iob1_tags_to_spans,
    ner_as_bio,
    to_bioul,
)
from sherlock_spark.text.bert_like import BertLikeTokenizer
from sherlock_spark.text.marking import (
    ENTITY_HANDLING_STRATEGIES,
    create_mention_combinations,
    tokenize_with_entities,
)

__all__ = [
    "PTB_TOKEN_MAP",
    "convert_ptb_token",
    "join_with_offsets",
    "bio_tags_to_spans",
    "iob1_tags_to_spans",
    "get_entities_conll",
    "to_bioul",
    "ner_as_bio",
    "BertLikeTokenizer",
    "ENTITY_HANDLING_STRATEGIES",
    "create_mention_combinations",
    "tokenize_with_entities",
]
