"""Real-HF-model dry run for a torch cluster (round-4 VERDICT #5).

This sandbox ships no torch/transformers, so the real code path in
``operators/real_model.py`` (HfNerModel / HfRcModel) has only ever run
against monkeypatched fakes. This script is the PRE-WRITTEN smoke a
real deployment runs FIRST, instead of improvising one: on a machine
with torch + transformers it

1. builds tiny RANDOM-INIT HF checkpoints (config.json + safetensors +
   tokenizer files — one token-classification, one
   sequence-classification with a deliberately PERMUTED label2id),
   layered into the repo's own bundle layout
   (``save_pretrained_dir`` / ``save_rc_pretrained_dir``) so
   ``has_hf_checkpoint`` flips the loaders onto the real path;
2. asserts the plumbing the sandbox could never execute:
   - word_ids alignment on TRUNCATED inputs (a sentence longer than
     the model's positional budget still yields one tag per WORD,
     overflow words defaulting to "O") — ref
     transformers_annotator.py:93-113;
   - label2id REORDER (checkpoint column order != bundle vocab order;
     emitted logit column j must be bundle label j) — the HfRcModel
     reorder guard;
   - sub-batch boundaries (batch_size 2 over an odd row count equals
     the single-forward result bit-for-bit) — ref
     transformers_annotator.py:31,60-63;
3. optionally (``--spark``) distributes the checkpoints through the
   real SparkFiles bundle path and runs ``ner_annotate_from_pretrained``
   / ``rc_classify_from_pretrained`` end-to-end, asserting one bundle
   load per worker and per-word output shapes.

Usage (on the torch machine, from the repo root)::

    python tools/real_model_smoke.py [--spark]

``tests/test_real_model_smoke.py`` wraps steps 1-2 behind
``pytest.importorskip`` so the suite stays green (skipped) here and
runs for real the first time the repo lands next to torch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NER_TAGS = ["O", "B-PERSON", "I-PERSON", "B-CITY"]
RC_LABELS = ["no_relation", "per:title", "per:children"]

_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "alice", "bob", "paris", "chairman", "visited", "met", "the",
    "person", "city", "title", "a", "b", "c",
]


def _write_tokenizer(path: str):
    """Minimal WordPiece tokenizer the AutoTokenizer can reload."""
    from transformers import BertTokenizerFast

    vocab_file = os.path.join(path, "vocab.txt")
    with open(vocab_file, "w") as handle:
        handle.write("\n".join(_VOCAB) + "\n")
    tokenizer = BertTokenizerFast(vocab_file=vocab_file, do_lower_case=True)
    tokenizer.model_max_length = 16  # force truncation on long inputs
    tokenizer.save_pretrained(path)
    return tokenizer


def build_tiny_ner_checkpoint(path: str) -> str:
    """Random-init BertForTokenClassification + tokenizer + the repo's
    stub-bundle files, so the SAME directory loads through
    ``_load_bundle`` and activates the real path."""
    import torch
    from transformers import BertConfig, BertForTokenClassification

    from sherlock_spark.model_stub import DEFAULT_NER_LEXICON
    from sherlock_spark.operators.features import save_pretrained_dir

    save_pretrained_dir(path, DEFAULT_NER_LEXICON, NER_TAGS)
    _write_tokenizer(path)
    torch.manual_seed(0)
    config = BertConfig(
        vocab_size=len(_VOCAB),
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=16,
        num_labels=len(NER_TAGS),
        id2label={i: tag for i, tag in enumerate(NER_TAGS)},
        label2id={tag: i for i, tag in enumerate(NER_TAGS)},
    )
    BertForTokenClassification(config).save_pretrained(path)
    return path


def build_tiny_rc_checkpoint(path: str) -> str:
    """Random-init BertForSequenceClassification whose label2id is a
    PERMUTATION of the bundle vocab order — logit column 0 is NOT
    bundle label 0 — so the smoke fails loudly if the reorder guard
    ever regresses."""
    import torch
    from transformers import BertConfig, BertForSequenceClassification

    from sherlock_spark.model_stub import FIXTURE_RC_RULES
    from sherlock_spark.operators.features import save_rc_pretrained_dir

    save_rc_pretrained_dir(path, RC_LABELS, FIXTURE_RC_RULES)
    _write_tokenizer(path)
    permuted = [RC_LABELS[1], RC_LABELS[2], RC_LABELS[0]]
    torch.manual_seed(1)
    config = BertConfig(
        vocab_size=len(_VOCAB),
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=16,
        num_labels=len(RC_LABELS),
        id2label={i: label for i, label in enumerate(permuted)},
        label2id={label: i for i, label in enumerate(permuted)},
    )
    BertForSequenceClassification(config).save_pretrained(path)
    return path


def assert_ner_plumbing(checkpoint_dir: str) -> None:
    from sherlock_spark.operators.real_model import (
        HfNerModel,
        maybe_real_ner_model,
    )

    model = maybe_real_ner_model(checkpoint_dir)
    assert isinstance(model, HfNerModel), (
        "real checkpoint present but maybe_real_ner_model fell back to "
        "the stub"
    )
    short = ["alice", "visited", "paris"]
    long = ["alice"] + ["visited"] * 38 + ["paris"]  # 40 words >> 16 positions

    tags = model.predict_tags([short, long, short])
    # one tag list per sentence, one tag per WORD — even when the
    # subword encoding truncated the tail away
    assert [len(row) for row in tags] == [3, 40, 3]
    assert all(tag in NER_TAGS for row in tags for tag in row)
    # truncated words (beyond the 16-position budget, minus CLS/SEP)
    # never see a word_id, so they stay "O" rather than misaligning
    assert all(tag == "O" for tag in tags[1][20:])
    # same sentence, same tags regardless of its batch neighbors
    assert tags[0] == tags[2]
    # sub-batch boundaries change nothing
    small = HfNerModel(checkpoint_dir, batch_size=2)
    assert small.predict_tags([short, long, short]) == tags
    print("NER plumbing: word-ids alignment + truncation + sub-batching OK")


def assert_rc_plumbing(checkpoint_dir: str) -> None:
    import numpy as np
    import torch
    from transformers import AutoModelForSequenceClassification, AutoTokenizer

    from sherlock_spark.operators.real_model import (
        HfRcModel,
        maybe_real_rc_model,
    )

    model = maybe_real_rc_model(checkpoint_dir, RC_LABELS)
    assert isinstance(model, HfRcModel)
    # the checkpoint's label2id is [1, 2, 0] of the bundle vocab ->
    # emitted column j must be the checkpoint column holding label j
    assert model._col_of == [2, 0, 1], model._col_of

    pairs = [
        ("PERSON", "TITLE", "alice", "chairman"),
        ("PERSON", "CITY", "bob", "paris"),
        ("PERSON", "PERSON", "alice", "bob"),
        ("PERSON", "CITY", "alice", "paris"),
        ("PERSON", "TITLE", "bob", "chairman"),
    ]
    out = model.forward_pairs(pairs)
    assert out.shape == (len(pairs), len(RC_LABELS))

    # cross-check one row against a direct torch forward
    tokenizer = AutoTokenizer.from_pretrained(checkpoint_dir)
    raw_model = AutoModelForSequenceClassification.from_pretrained(
        checkpoint_dir
    )
    raw_model.eval()
    text = "PERSON alice [SEP] TITLE chairman"
    with torch.no_grad():
        raw = raw_model(
            **tokenizer([text], padding=True, truncation=True,
                        return_tensors="pt")
        ).logits.numpy()[0]
    label2id = raw_model.config.label2id
    expected = np.array([raw[label2id[label]] for label in RC_LABELS])
    assert np.allclose(out[0], expected, atol=1e-5), (out[0], expected)

    # sub-batch boundaries: odd row count over batch_size 2
    small = HfRcModel(checkpoint_dir, RC_LABELS, batch_size=2)
    assert np.allclose(small.forward_pairs(pairs), out, atol=1e-6)
    print("RC plumbing: label2id reorder + forward parity + sub-batching OK")


def run_spark_end_to_end(base_dir: str) -> None:
    """Distribute both checkpoints through the SparkFiles bundle path
    and run the pretrained-annotator stages for real."""
    from pyspark.sql import functions as F

    from sherlock_spark.operators.features import (
        ner_annotate_from_pretrained,
        rc_classify_from_pretrained,
    )
    from sherlock_spark.session import get_spark

    spark = get_spark()
    ner_dir = os.path.join(base_dir, "tiny_ner_real")
    rc_dir = os.path.join(base_dir, "tiny_rc_real")

    transcripts = spark.createDataFrame(
        [("c1", 0, "alice visited paris"), ("c1", 1, "bob met alice")],
        "conv_id string, turn_idx int, text string",
    )
    annotated = ner_annotate_from_pretrained(spark, transcripts, ner_dir)
    rows = annotated.collect()
    assert len(rows) == 2
    assert all(row.model_loads == 1 for row in rows)
    for row in rows:
        assert all(
            0 <= m.start < m.end <= len(row.words) for m in row.ments
        )

    pairs = spark.createDataFrame(
        [("PERSON", "TITLE", "alice", "chairman")],
        "subj_type string, obj_type string, subj_text string, obj_text string",
    )
    classified = rc_classify_from_pretrained(spark, pairs, rc_dir)
    out = classified.collect()
    assert len(out) == 1
    print("Spark end-to-end: bundle distribution + real forwards OK")
    spark.stop()


def main() -> None:
    import tempfile

    base = tempfile.mkdtemp(prefix="sherlock_real_smoke_")
    assert_ner_plumbing(build_tiny_ner_checkpoint(
        os.path.join(base, "tiny_ner_real")))
    assert_rc_plumbing(build_tiny_rc_checkpoint(
        os.path.join(base, "tiny_rc_real")))
    if "--spark" in sys.argv:
        run_spark_end_to_end(base)
    print("real-model smoke: ALL OK")


if __name__ == "__main__":
    main()
