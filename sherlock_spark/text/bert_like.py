"""A deterministic BERT-style tokenizer stand-in.

The container has no ``transformers``/``torch``, so model tokenizers are
replaced by this self-contained implementation of the public WordPiece
scheme (BERT uncased): basic tokenization (clean -> lowercase -> strip
accents -> split punctuation) followed by greedy longest-match WordPiece
against an optional vocab. With no vocab, each basic token is its own
piece — which is byte-identical to ``bert-base-uncased`` output on the
reference fixtures (all fixture words are in-vocab there).

Behavioral parity points with the HF tokenizer the reference uses
(``sherlock/feature_converters/binary_rc.py:109,167-175,206-230``):

- added tokens are lowercased at add time when the tokenizer lowercases,
  and are matched before basic tokenization (so ``[head_start]`` and
  ``[head=person]`` survive as single tokens);
- special tokens ``[CLS]/[SEP]/[PAD]/[UNK]`` are never split;
- ``encode_plus`` on a pre-tokenized list truncates to
  ``max_length - num_special_tokens``, wraps with CLS/SEP, pads with id 0
  and reports ``num_truncated_tokens``;
- the lowercase probe ``tokenize("A") -> ["a"]`` drives marker casing.

Token ids are stable 31-bit hashes (pad=0, unk=1, cls=2, sep=3, then
``4 + blake2b(token) % (2^31-5)``) so any executor assigns identical ids
without a shared vocab file.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from typing import Iterable, Optional

_WHITESPACE = {" ", "\t", "\n", "\r"}


def _is_whitespace(char: str) -> bool:
    if char in _WHITESPACE:
        return True
    return unicodedata.category(char) == "Zs"


def _is_control(char: str) -> bool:
    if char in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(char).startswith("C")


def _is_punctuation(char: str) -> bool:
    code = ord(char)
    if (
        33 <= code <= 47
        or 58 <= code <= 64
        or 91 <= code <= 96
        or 123 <= code <= 126
    ):
        return True
    return unicodedata.category(char).startswith("P")


def _is_cjk(code: int) -> bool:
    return (
        0x4E00 <= code <= 0x9FFF
        or 0x3400 <= code <= 0x4DBF
        or 0x20000 <= code <= 0x2A6DF
        or 0x2A700 <= code <= 0x2B73F
        or 0x2B740 <= code <= 0x2B81F
        or 0x2B820 <= code <= 0x2CEAF
        or 0xF900 <= code <= 0xFAFF
        or 0x2F800 <= code <= 0x2FA1F
    )


def _whitespace_tokenize(text: str) -> list[str]:
    return text.split()


def _token_hash_id(token: str) -> int:
    digest = hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest()
    return 4 + int.from_bytes(digest, "big") % (2**31 - 5)


class BertLikeTokenizer:
    pad_token = "[PAD]"
    unk_token = "[UNK]"
    cls_token = "[CLS]"
    sep_token = "[SEP]"
    mask_token = "[MASK]"
    padding_side = "right"

    def __init__(
        self,
        do_lower_case: bool = True,
        vocab: Optional[dict[str, int]] = None,
        max_wordpiece_chars: int = 100,
    ) -> None:
        self.do_lower_case = do_lower_case
        # optional WordPiece vocab (token -> id); ids here are only used
        # for membership, real ids come from the stable hash space.
        self.wordpiece_vocab = set(vocab) if vocab else None
        self.max_wordpiece_chars = max_wordpiece_chars
        self.special_tokens = [
            self.pad_token,
            self.unk_token,
            self.cls_token,
            self.sep_token,
            self.mask_token,
        ]
        self._special_ids = {
            self.pad_token: 0,
            self.unk_token: 1,
            self.cls_token: 2,
            self.sep_token: 3,
            self.mask_token: 4,
        }
        self.added_tokens: list[str] = []
        self._split_re: Optional[re.Pattern] = None
        self._id_to_token: dict[int, str] = {
            v: k for k, v in self._special_ids.items()
        }
        self._rebuild_split_regex()

    # -- vocabulary management ------------------------------------------

    def add_tokens(self, tokens: Iterable[str]) -> int:
        added = 0
        for token in tokens:
            if self.do_lower_case:
                token = token.lower()
            if token not in self.added_tokens and token not in self.special_tokens:
                self.added_tokens.append(token)
                added += 1
        self._rebuild_split_regex()
        return added

    def _rebuild_split_regex(self) -> None:
        keep_whole = sorted(
            set(self.added_tokens) | set(self.special_tokens),
            key=len,
            reverse=True,
        )
        pattern = "|".join(re.escape(token) for token in keep_whole)
        self._split_re = re.compile(f"({pattern})") if pattern else None

    def num_special_tokens_to_add(self) -> int:
        return 2  # [CLS] ... [SEP]

    # -- tokenization ---------------------------------------------------

    def _clean_text(self, text: str) -> str:
        output = []
        for char in text:
            code = ord(char)
            if code == 0 or code == 0xFFFD or _is_control(char):
                continue
            output.append(" " if _is_whitespace(char) else char)
        return "".join(output)

    def _tokenize_cjk(self, text: str) -> str:
        output = []
        for char in text:
            if _is_cjk(ord(char)):
                output.append(f" {char} ")
            else:
                output.append(char)
        return "".join(output)

    def _strip_accents(self, text: str) -> str:
        return "".join(
            char
            for char in unicodedata.normalize("NFD", text)
            if unicodedata.category(char) != "Mn"
        )

    def _split_on_punc(self, text: str) -> list[str]:
        chars = list(text)
        output: list[list[str]] = []
        start_new = True
        for char in chars:
            if _is_punctuation(char):
                output.append([char])
                start_new = True
            else:
                if start_new:
                    output.append([])
                start_new = False
                output[-1].append(char)
        return ["".join(piece) for piece in output]

    def _basic_tokenize(self, text: str) -> list[str]:
        text = self._clean_text(text)
        text = self._tokenize_cjk(text)
        split_tokens: list[str] = []
        for token in _whitespace_tokenize(text):
            if self.do_lower_case:
                token = token.lower()
                token = self._strip_accents(token)
            split_tokens.extend(self._split_on_punc(token))
        return _whitespace_tokenize(" ".join(split_tokens))

    def _wordpiece(self, token: str) -> list[str]:
        if self.wordpiece_vocab is None:
            return [token]
        if len(token) > self.max_wordpiece_chars:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(token):
            end = len(token)
            current = None
            while start < end:
                substr = token[start:end]
                if start > 0:
                    substr = "##" + substr
                if substr in self.wordpiece_vocab:
                    current = substr
                    break
                end -= 1
            if current is None:
                return [self.unk_token]
            pieces.append(current)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        if self._split_re is None:
            segments = [text]
        else:
            segments = [seg for seg in self._split_re.split(text) if seg]
        keep_whole = set(self.added_tokens) | set(self.special_tokens)
        output: list[str] = []
        for segment in segments:
            if segment in keep_whole:
                output.append(segment)
                continue
            for word in self._basic_tokenize(segment):
                output.extend(self._wordpiece(word))
        return output

    # -- ids ------------------------------------------------------------

    def token_to_id(self, token: str) -> int:
        if token in self._special_ids:
            return self._special_ids[token]
        token_id = _token_hash_id(token)
        self._id_to_token.setdefault(token_id, token)
        return token_id

    def convert_tokens_to_ids(self, tokens: list[str]) -> list[int]:
        return [self.token_to_id(token) for token in tokens]

    def convert_ids_to_tokens(self, ids: list[int]) -> list[str]:
        return [self._id_to_token.get(token_id, self.unk_token) for token_id in ids]

    # -- encode_plus-compatible surface ---------------------------------

    def encode_plus_tokens(
        self,
        tokens: list[str],
        max_length: Optional[int] = None,
        add_special_tokens: bool = True,
        padding_to_max: bool = True,
    ) -> dict:
        """HF ``encode_plus(List[str], add_special_tokens=True,
        truncation=True, max_length=..., padding='max_length',
        return_overflowing_tokens=True)`` equivalent on pre-tokenized
        input (reference call sites: ``binary_rc.py:206-213``,
        ``token_classification.py:108-115``).
        """
        n_special = self.num_special_tokens_to_add() if add_special_tokens else 0
        kept = list(tokens)
        num_truncated = 0
        if max_length is not None and len(kept) + n_special > max_length:
            keep = max_length - n_special
            num_truncated = len(kept) - keep
            kept = kept[:keep]
        if add_special_tokens:
            kept = [self.cls_token] + kept + [self.sep_token]
        input_ids = self.convert_tokens_to_ids(kept)
        attention_mask = [1] * len(input_ids)
        token_type_ids = [0] * len(input_ids)
        if padding_to_max and max_length is not None:
            pad = max_length - len(input_ids)
            input_ids += [self._special_ids[self.pad_token]] * pad
            attention_mask += [0] * pad
            token_type_ids += [0] * pad
        result = {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "token_type_ids": token_type_ids,
        }
        if num_truncated > 0:
            result["num_truncated_tokens"] = num_truncated
            result["overflowing_tokens"] = self.convert_tokens_to_ids(
                tokens[len(tokens) - num_truncated :]
            )
        return result
