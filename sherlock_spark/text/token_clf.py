"""NER (token-classification) feature converter — O10 + K4.

Reference: ``sherlock/feature_converters/token_classification.py:86-146``
(subword alignment: first subword of a word carries the real label id,
remaining subwords get ``pad_token_label_id`` = -100; truncation trims
label_ids from the end; CLS position and padding side shift the label
sequence) and ``sherlock/feature_converters/feature_converter.py:70-76``
(sorted label vocabulary) / ``:146-198`` (persistence:
``converter_config.json`` + ``converter_label_vocab.txt``).

Pure Python class so the same code runs inside executor UDFs and in
tests; the Spark-side operator lives in ``operators/features.py``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

PAD_TOKEN_LABEL_ID = -100  # CrossEntropyLoss().ignore_index
CONFIG_FILE = "converter_config.json"
VOCAB_FILE = "converter_label_vocab.txt"


class TokenClassificationConverter:
    """words + per-word labels -> model-ready aligned feature dict."""

    name = "token_classification"
    persist_attributes = ("max_length", "pad_token_label_id")

    def __init__(
        self,
        tokenizer,
        labels: Sequence[str],
        max_length: int = 512,
        pad_token_label_id: int = PAD_TOKEN_LABEL_ID,
        cls_token_at_end: bool = False,
    ) -> None:
        self.tokenizer = tokenizer
        self.labels = sorted(labels)  # feature_converter.py:74
        self.id_to_label_map = {i: label for i, label in enumerate(self.labels)}
        self.label_to_id_map = {label: i for i, label in enumerate(self.labels)}
        self.max_length = max_length
        self.pad_token_label_id = pad_token_label_id
        self.cls_token_at_end = cls_token_at_end  # XLNet-style

    def words_to_features(
        self, words: Sequence[str], ent_types: Optional[Sequence[Optional[str]]]
    ) -> dict:
        """One document's words (+ per-word BIO labels, None -> "O") ->
        {input_ids, attention_mask, token_type_ids, label_ids,
        truncated}, all id sequences exactly ``max_length`` long.
        """
        pad_id = self.pad_token_label_id
        tokens: list[str] = []
        label_ids: list[int] = []
        for i, word in enumerate(words):
            subword_tokens = self.tokenizer.tokenize(word)
            if not subword_tokens:
                continue  # skip whitespace tokens (token_classification.py:95)
            tokens.extend(subword_tokens)
            label = ent_types[i] if ent_types is not None else None
            if label is None:
                label = "O"
            label_ids.extend(
                [self.label_to_id_map[label]]
                + [pad_id] * (len(subword_tokens) - 1)
            )

        inputs = self.tokenizer.encode_plus_tokens(
            tokens, max_length=self.max_length, add_special_tokens=True
        )
        num_truncated = inputs.get("num_truncated_tokens", 0)
        if num_truncated > 0:
            label_ids = label_ids[:-num_truncated]

        if self.cls_token_at_end:
            label_ids = label_ids + [pad_id]
        else:
            label_ids = [pad_id] + label_ids

        padding_length = self.max_length - len(label_ids)
        if getattr(self.tokenizer, "padding_side", "right") == "left":
            label_ids = [pad_id] * padding_length + label_ids
        else:
            label_ids = label_ids + [pad_id] * padding_length

        return {
            "input_ids": inputs["input_ids"],
            "attention_mask": inputs["attention_mask"],
            "token_type_ids": inputs["token_type_ids"],
            "label_ids": label_ids,
            "truncated": num_truncated > 0,
        }

    # -- K4 persistence (feature_converter.py:146-198 layout) ------------

    def save(self, save_directory: str) -> None:
        if not os.path.isdir(save_directory):
            raise ValueError(
                f"Saving directory ({save_directory}) should be a directory"
            )
        config = dict(
            name=self.name,
            framework="transformers",
            **{attr: getattr(self, attr) for attr in self.persist_attributes},
        )
        with open(
            os.path.join(save_directory, CONFIG_FILE), "w", encoding="utf-8"
        ) as writer:
            writer.write(json.dumps(config, ensure_ascii=False))
        with open(
            os.path.join(save_directory, VOCAB_FILE), "w", encoding="utf-8"
        ) as writer:
            for label in self.labels:  # already in id order
                writer.write(label + "\n")

    @classmethod
    def from_pretrained(cls, path: str, tokenizer) -> "TokenClassificationConverter":
        with open(os.path.join(path, CONFIG_FILE), encoding="utf-8") as handle:
            config = json.load(handle)
        if config.get("name", cls.name) != cls.name:
            raise ValueError(f"not a {cls.name} converter: {config.get('name')}")
        labels = load_label_vocabulary(path)
        return cls(
            tokenizer=tokenizer,
            labels=labels,
            max_length=config["max_length"],
            pad_token_label_id=config["pad_token_label_id"],
        )


def load_label_vocabulary(path: str) -> list[str]:
    """converter_label_vocab.txt -> labels in id order."""
    vocab_file = path if os.path.isfile(path) else os.path.join(path, VOCAB_FILE)
    with open(vocab_file, encoding="utf-8") as handle:
        return [line.rstrip("\n") for line in handle if line.strip() or line == "\n"]
