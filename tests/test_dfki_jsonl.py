"""S2 DFKI-JSONL reader parity (dfki_tacred_jsonl.py:206-270).

The reference ships no DFKI-JSONL fixture; the format is a JSONL
re-framing of original TACRED with exclusive-end entity spans
(``dfki_tacred_jsonl.py:40-53``), so the parity gate here is exact
document equality against the S1 reader over the converted fixture —
mirroring the reference reader test's counts/offsets assertions
(``tests/dataset_readers/tacred_test.py:11-28``).
"""

import json

import pytest

from sherlock_spark.sources import read_tacred
from sherlock_spark.sources.dfki_jsonl import dfki_labels, read_dfki_jsonl

TACRED_FIXTURE = "/root/reference/tests/fixtures/datasets/tacred.json"


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    """tacred.json (array, inclusive ends) -> DFKI JSONL (one object per
    line, exclusive ends, tokens/label/entities/type/grammar keys).
    """
    examples = json.load(open(TACRED_FIXTURE))
    path = tmp_path_factory.mktemp("dfki") / "fixture.jsonl"
    with open(path, "w") as handle:
        for ex in examples:
            handle.write(
                json.dumps(
                    {
                        "id": ex["id"],
                        "tokens": ex["token"],
                        "label": ex["relation"],
                        "entities": [
                            [ex["subj_start"], ex["subj_end"] + 1],
                            [ex["obj_start"], ex["obj_end"] + 1],
                        ],
                        "type": [ex["subj_type"], ex["obj_type"]],
                        "grammar": ["SUBJ", "OBJ"],
                        "stanford_ner": ex["stanford_ner"],
                        "stanford_pos": ex["stanford_pos"],
                        "stanford_deprel": ex["stanford_deprel"],
                        "stanford_head": ex["stanford_head"],
                    }
                )
                + "\n"
            )
    return str(path)


def _doc_key(row):
    return (
        row.guid,
        row.text,
        tuple((t.start, t.end, t.lemma, t.pos, t.dep, t.dep_head, t.ent_type) for t in row.tokens),
        tuple((s.start, s.end) for s in row.sents),
        tuple((m.start, m.end, m.label) for m in row.ments),
        tuple((r.head_idx, r.tail_idx, r.label) for r in row.rels),
    )


def test_parity_with_tacred_reader(spark, jsonl_path):
    """Same examples through both readers -> identical documents."""
    via_s1 = {r.guid: _doc_key(r) for r in read_tacred(spark, TACRED_FIXTURE).collect()}
    via_s2 = {r.guid: _doc_key(r) for r in read_dfki_jsonl(spark, jsonl_path).collect()}
    assert via_s1 == via_s2
    assert len(via_s2) == 3


def test_inverse_relations(spark, jsonl_path):
    docs = read_dfki_jsonl(spark, jsonl_path, add_inverse_relations=True).collect()
    by_guid = {d.guid: d for d in docs}
    # per:title has no inverse -> falls back to no_relation
    doc = by_guid["e7798fb926b9403cfcd2"]
    assert (doc.rels[1].head_idx, doc.rels[1].tail_idx) == (1, 0)
    assert doc.rels[1].label == "no_relation"
    # per:children inverts to per:parents (INVERSE_RELATIONS)
    kids = [d for d in docs if d.rels[0].label == "per:children"]
    assert kids and kids[0].rels[1].label == "per:parents"


def test_out_of_range_dropped_and_optionals_absent(spark, tmp_path):
    """Spans past the token list drop the example
    (dfki_tacred_jsonl.py:214-215); stanford_* keys are optional
    (the reader must not require them)."""
    path = tmp_path / "minimal.jsonl"
    rows = [
        {
            "id": "ok",
            "tokens": ["Ada", "joined", "Acme"],
            "label": "per:employee_of",
            "entities": [[0, 1], [2, 3]],
            "type": ["PERSON", "ORGANIZATION"],
            "grammar": ["SUBJ", "OBJ"],
        },
        {
            "id": "bad-span",
            "tokens": ["Ada"],
            "label": "per:employee_of",
            "entities": [[0, 1], [2, 5]],
            "type": ["PERSON", "ORGANIZATION"],
            "grammar": ["SUBJ", "OBJ"],
        },
    ]
    with open(path, "w") as handle:
        for row in rows:
            handle.write(json.dumps(row) + "\n")
    docs = read_dfki_jsonl(spark, str(path)).collect()
    assert [d.guid for d in docs] == ["ok"]
    doc = docs[0]
    assert doc.text == "Ada joined Acme"
    assert [t.ent_type for t in doc.tokens] == [None, None, None]
    assert (doc.ments[0].start, doc.ments[0].end, doc.ments[0].label) == (0, 1, "PERSON")
    assert (doc.ments[1].start, doc.ments[1].end, doc.ments[1].label) == (2, 3, "ORGANIZATION")


def test_max_instances_and_labels(spark, jsonl_path):
    assert read_dfki_jsonl(spark, jsonl_path, max_instances=2).count() == 2
    labels = dfki_labels(spark, jsonl_path, task="binary_rc")
    assert labels[0] == "no_relation"
    assert set(labels) == {"no_relation", "per:title", "per:children"}
    ner = dfki_labels(spark, jsonl_path, task="ner")
    assert ner[0] == "O"
    assert "B-PERSON" in ner and "I-PERSON" in ner
