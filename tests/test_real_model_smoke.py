"""Skip-if-no-torch wrapper for the real-HF dry run (round-4 VERDICT
#5): green-as-skipped in this sandbox, runs for real the first time the
repo lands on a machine with torch + transformers — so the first real
deployment executes a pre-written smoke instead of improvising one.

The harness itself lives in ``tools/real_model_smoke.py``; see its
docstring for what it pins (word-ids alignment under truncation,
label2id reorder, sub-batch boundaries, SparkFiles bundle activation).
"""

import importlib.util
import os

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "real_model_smoke.py",
)
_spec = importlib.util.spec_from_file_location("real_model_smoke", _TOOLS)
smoke = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(smoke)


def test_hf_ner_plumbing(tmp_path):
    smoke.assert_ner_plumbing(
        smoke.build_tiny_ner_checkpoint(str(tmp_path / "tiny_ner_real"))
    )


def test_hf_rc_plumbing(tmp_path):
    smoke.assert_rc_plumbing(
        smoke.build_tiny_rc_checkpoint(str(tmp_path / "tiny_rc_real"))
    )
