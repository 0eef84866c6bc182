"""Golden Document JSON round-trip through the StructType schema
(SURVEY.md §5 test plan item 2; reference golden
tests/document_test.py:69-95 against tests/fixtures/doc.json).
"""

import json

from pyspark.sql import functions as F

from sherlock_spark.schemas import DOCUMENT

GOLDEN = "/root/reference/tests/fixtures/doc.json"
GOLDEN_NO_ENTS = "/root/reference/tests/fixtures/doc_no_ents.json"


def _read(spark, path):
    # the reference goldens are pretty-printed JSON (one object, many
    # lines), not JSONL
    return spark.read.schema(DOCUMENT).option("multiLine", "true").json(path)


def test_golden_doc_roundtrip(spark, tmp_path):
    golden = json.load(open(GOLDEN))
    df = _read(spark, GOLDEN)
    row = df.first()

    # field-level equality with the golden
    assert row.guid == golden["guid"]
    assert row.text == golden["text"]
    assert len(row.tokens) == len(golden["tokens"])
    for got, want in zip(row.tokens, golden["tokens"]):
        assert (got.start, got.end, got.lemma) == (
            want["start"], want["end"], want["lemma"],
        )
        assert got.pos == want.get("pos")
        assert got.dep == want.get("dep")
        assert got.ent_type == want.get("ent_type")
    assert [(m.start, m.end, m.label) for m in row.ments] == [
        (m["start"], m["end"], m["label"]) for m in golden["ments"]
    ]
    assert [(r.head_idx, r.tail_idx, r.label) for r in row.rels] == [
        (r["head_idx"], r["tail_idx"], r["label"]) for r in golden["rels"]
    ]
    assert [(s.start, s.end) for s in row.sents] == [
        (s["start"], s["end"]) for s in golden["sents"]
    ]

    # round-trip: write as json, read back, byte-level field equality
    out = str(tmp_path / "roundtrip")
    df.write.mode("overwrite").json(out)
    back = spark.read.schema(DOCUMENT).json(out).first()
    assert back.asDict(recursive=True) == row.asDict(recursive=True)

    # char-offset invariant: every token slices its own lemma from text
    for token in row.tokens:
        assert row.text[token.start : token.end] == token.lemma


def test_golden_doc_no_ents(spark):
    row = _read(spark, GOLDEN_NO_ENTS).first()
    golden = json.load(open(GOLDEN_NO_ENTS))
    assert row.guid == golden["guid"]
    assert (row.ents is None) or (len(row.ents) == len(golden.get("ents", [])))
