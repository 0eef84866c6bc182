"""Mention-pair enumeration + binary relation classification stage.

Reference semantics: pair enumeration ``binary_rc.py:290-325`` (gold
relations win, else ordered permutations within a sentence), feature
conversion ``binary_rc.py:378-493`` (entity marking + subword
tokenization + cutoff detection), model decode
``transformers_binary_rc.py:42-49`` (argmax, drop ``no_relation``), and
the guid join-back ``transformers_binary_rc.py:59-69`` — which is a
no-op here because pairs never leave their source row's partition.

Spark shape: pair enumeration is a row-local double ``posexplode`` (no
shuffle, quadratic-per-turn blowup bounded by ``max_mentions`` with the
overflow *counted*, never silently dropped — SURVEY.md §4); the
classifier is one iterator pandas UDF that runs the full feature
conversion (shared pure code, byte-identical to the parity goldens) and
a vectorized stub forward per Arrow batch.
"""

from __future__ import annotations

import uuid
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sherlock_spark.model_stub import StubRcModel
from sherlock_spark.text.bert_like import BertLikeTokenizer
from sherlock_spark.text.marking_fast import marking_flags, piece_prefix_sums

_MODEL_CACHE: dict[int, tuple] = {}

RC_RESULT_TYPE = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("cutoff", T.BooleanType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("logits", T.MapType(T.StringType(), T.DoubleType())),
    ]
)


def _executor_rc(cache_key: str, broadcast):
    cached = _MODEL_CACHE.get(cache_key)
    if cached is None:
        config = broadcast.value
        model = StubRcModel(config["labels"], config.get("rule_map"))
        tokenizer = BertLikeTokenizer(do_lower_case=True)
        # boundary markers are always in the vocabulary (the reference's
        # additional-token setup always includes them, tacred.py:151-152)
        tokenizer.add_tokens(
            ["[HEAD_START]", "[HEAD_END]", "[TAIL_START]", "[TAIL_END]"]
        )
        tokenizer.add_tokens(config.get("additional_tokens", []))
        cached = (model, tokenizer, config)
        _MODEL_CACHE[cache_key] = cached
    return cached


def enumerate_pairs(annotated: DataFrame, max_mentions: int = 16) -> DataFrame:
    """Ordered mention pairs within each turn (one turn = one sentence,
    mirroring the sentence-restricted search space, binary_rc.py:307-313).

    Row-local: two nested ``transform``s build the pair array, one
    ``explode`` flattens it — Catalyst keeps this in the same stage as
    the upstream scan, no shuffle. Turns with more than ``max_mentions``
    mentions contribute pairs only over the first ``max_mentions``
    (array order = position = mention identity) and are flagged in
    ``ments_overflow`` for the metrics sink.
    """
    n = F.size("ments")
    capped = F.least(n, F.lit(max_mentions))
    indices = F.sequence(F.lit(0), capped - 1)
    pair_array = F.filter(
        F.flatten(
            F.transform(
                indices,
                lambda h: F.transform(
                    indices, lambda t: F.struct(h.alias("h"), t.alias("t"))
                ),
            )
        ),
        lambda pair: pair["h"] != pair["t"],
    )
    return (
        annotated.withColumn("ments_overflow", n > F.lit(max_mentions))
        .withColumn("pair", F.explode(F.when(n >= 2, pair_array)))
        .withColumn("head_idx", F.col("pair.h"))
        .withColumn("tail_idx", F.col("pair.t"))
        .drop("pair")
    )


def rc_classify_udf(
    spark: SparkSession,
    labels: list[str],
    rule_map: Optional[dict[tuple[str, str], str]] = None,
    additional_tokens: Optional[list[str]] = None,
    entity_handling: str = "mark_entity",
    max_length: Optional[int] = 128,
    add_logits: bool = False,
):
    """Iterator pandas UDF: (words, ments, head_idx, tail_idx) -> result.

    Inside each Arrow batch: full feature conversion per pair (marking
    strategy + subword tokenization + entity-cutoff check + encode), one
    vectorized forward, argmax decode. Cutoff pairs get label NULL
    (the reference drops them pre-model, binary_rc.py:202-204).
    """
    broadcast = spark.sparkContext.broadcast(
        {
            "labels": list(labels),
            "rule_map": rule_map,
            "additional_tokens": list(additional_tokens or []),
            "entity_handling": entity_handling,
            "max_length": max_length,
            "add_logits": add_logits,
        }
    )

    cache_key = uuid.uuid4().hex  # one cache slot per UDF instance

    @F.pandas_udf(RC_RESULT_TYPE)
    def classify(
        batches: Iterator[Tuple[pd.Series, pd.Series, pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        model, tokenizer, config = _executor_rc(cache_key, broadcast)
        handling = config["entity_handling"]
        max_len = config["max_length"]
        emit_logits = config["add_logits"]
        labels_list = model.labels

        # per-worker caches: word -> subword piece count, NER type ->
        # mask piece count. These turn the per-pair marking into O(1)
        # prefix-sum arithmetic (marking_fast.py) — semantics pinned to
        # the reference path by tests/test_marking_fast.py.
        piece_count: dict[str, int] = {}
        mask_pieces: dict[str, tuple[int, int]] = {}

        def word_pieces(word: str) -> int:
            count = piece_count.get(word)
            if count is None:
                count = len(tokenizer.tokenize(word))
                piece_count[word] = count
            return count

        def label_mask_pieces(label: str) -> tuple[int, int]:
            cached_pair = mask_pieces.get(label)
            if cached_pair is None:
                cached_pair = (
                    len(tokenizer.tokenize(f"[HEAD={label}]".lower())),
                    len(tokenizer.tokenize(f"[TAIL={label}]".lower())),
                )
                mask_pieces[label] = cached_pair
            return cached_pair

        for words_s, ments_s, head_s, tail_s in batches:
            n = len(words_s)
            cutoffs = np.zeros(n, dtype=bool)
            truncs = np.zeros(n, dtype=bool)
            pairs: list[tuple[str, str, str, str]] = []
            live: list[int] = []
            head_arr = head_s.to_numpy()
            tail_arr = tail_s.to_numpy()
            prev_words_id = None
            prefix: list[int] = [0]
            for i in range(n):
                words = words_s.iloc[i]
                ments = ments_s.iloc[i]
                head = ments[int(head_arr[i])]
                tail = ments[int(tail_arr[i])]
                if max_len is None:
                    cutoff = truncated = False
                else:
                    # rows exploded from one turn arrive adjacent; reuse
                    # the prefix sums while the words buffer is the same
                    words_id = id(words)
                    if words_id != prev_words_id:
                        prefix = piece_prefix_sums(
                            [word_pieces(w) for w in words]
                        )
                        prev_words_id = words_id
                    head_mask, _ = label_mask_pieces(head["label"])
                    _, tail_mask = label_mask_pieces(tail["label"])
                    cutoff, truncated = marking_flags(
                        prefix,
                        len(words),
                        int(head["start"]),
                        int(head["end"]),
                        head_mask,
                        int(tail["start"]),
                        int(tail["end"]),
                        tail_mask,
                        handling,
                        max_len,
                        tokenizer.num_special_tokens_to_add(),
                    )
                cutoffs[i] = cutoff
                truncs[i] = truncated
                if not cutoff:
                    pairs.append(
                        (
                            head["label"],
                            tail["label"],
                            " ".join(words[int(head["start"]) : int(head["end"])]),
                            " ".join(words[int(tail["start"]) : int(tail["end"])]),
                        )
                    )
                    live.append(i)
            label_col = [None] * n
            logits_col = [None] * n
            if pairs:
                logits = model.forward_pairs(pairs)
                pred_ids = logits.argmax(axis=1)
                for row, i in enumerate(live):
                    label_col[i] = labels_list[int(pred_ids[row])]
                    if emit_logits:
                        logits_col[i] = {
                            labels_list[j]: float(value)
                            for j, value in enumerate(logits[row])
                        }
            yield pd.DataFrame(
                {
                    "label": label_col,
                    "cutoff": cutoffs,
                    "truncated": truncs,
                    "logits": logits_col,
                }
            )

    return classify


def extract_triples(
    spark: SparkSession,
    annotated: DataFrame,
    labels: list[str],
    rule_map: Optional[dict[tuple[str, str], str]] = None,
    additional_tokens: Optional[list[str]] = None,
    entity_handling: str = "mark_entity",
    max_length: Optional[int] = 128,
    max_mentions: int = 16,
    ignore_no_relation: bool = True,
    add_logits: bool = False,
) -> DataFrame:
    """annotated (conv_id, turn_idx, words, ments, ...) -> triples table.

    Output: (conv_id, turn_idx, head_idx, tail_idx, subj_text,
    subj_type, pred, obj_text, obj_type[, logits]).
    """
    classify = rc_classify_udf(
        spark,
        labels,
        rule_map=rule_map,
        additional_tokens=additional_tokens,
        entity_handling=entity_handling,
        max_length=max_length,
        add_logits=add_logits,
    )
    pairs = enumerate_pairs(annotated, max_mentions=max_mentions)
    classified = pairs.withColumn(
        "rc",
        classify(
            F.col("words"), F.col("ments"), F.col("head_idx"), F.col("tail_idx")
        ),
    )
    head = F.element_at(F.col("ments"), F.col("head_idx") + 1)
    tail = F.element_at(F.col("ments"), F.col("tail_idx") + 1)
    result = classified.filter(
        F.col("rc.label").isNotNull() & ~F.col("rc.cutoff")
    )
    if ignore_no_relation:
        result = result.filter(F.col("rc.label") != "no_relation")
    return result.select(
        "conv_id",
        "turn_idx",
        "head_idx",
        "tail_idx",
        F.concat_ws(
            " ", F.slice(F.col("words"), head["start"] + 1, head["end"] - head["start"])
        ).alias("subj_text"),
        head["label"].alias("subj_type"),
        F.col("rc.label").alias("pred"),
        F.concat_ws(
            " ", F.slice(F.col("words"), tail["start"] + 1, tail["end"] - tail["start"])
        ).alias("obj_text"),
        tail["label"].alias("obj_type"),
        *([F.col("rc.logits").alias("logits")] if add_logits else []),
    )
