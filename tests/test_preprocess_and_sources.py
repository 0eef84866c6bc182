"""Preprocessing operators, serialized-Document source, ensemble vote,
multimodal plumbing, sinks."""

import json

from sherlock_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    chunk_audio,
    extract_media_features,
    media_similarity_topk,
    resize_plan,
    sample_video_frames,
)
from sherlock_spark.operators.preprocess import (
    add_entity_types_from_relation,
    collate_datasets,
    normalize_ner_labels,
    normalize_relation_labels,
    relation_entity_types,
    remove_cross_split_leakage,
    swap_arguments,
)
from sherlock_spark.sinks import to_brat
from sherlock_spark.sources.documents import read_document_jsonl, write_document_jsonl
from sherlock_spark.text.ensemble import compute_majority_tag

from pyspark.sql import functions as F


# --- ensemble vote (utils.py:176-212 semantics) -------------------------

def test_majority_tag_basic():
    assert compute_majority_tag({"B-PER": 3, "O": 1}) == ("B-PER", 0.75)


def test_majority_tag_uncertain_O_falls_back():
    # O majority below 0.8 -> runner-up wins
    tag, prob = compute_majority_tag({"O": 3, "B-ORG": 2})
    assert tag == "B-ORG" and abs(prob - 0.4) < 1e-9


def test_majority_tag_confident_O_yields_to_gazetteer():
    tag, prob = compute_majority_tag({"O": 9, "B-POSITION": 1})
    assert tag == "B-POSITION" and abs(prob - 0.1) < 1e-9


def test_majority_tag_empty():
    assert compute_majority_tag({}) == (None, None)
    assert compute_majority_tag({"O": 0}) == (None, None)


# --- O11/O12/O13 --------------------------------------------------------

def test_relation_entity_types_rules():
    assert relation_entity_types("per:title") == ("PERSON", "POSITION")
    assert relation_entity_types("per:children") == ("PERSON", "PERSON")
    assert relation_entity_types("org:founded_by") == ("ORG", "PERSON")
    assert relation_entity_types("org:alternate_names") == ("ORG", "ORG")
    assert relation_entity_types("per:place_of_birth") == ("PERSON", "LOC")
    assert relation_entity_types("no_relation") == (None, None)


def test_normalize_relation_labels(spark):
    df = spark.createDataFrame(
        [("per:city_of_birth",), ("per:countries_of_residence",), ("per:title",)],
        "label string",
    )
    got = {r.label for r in normalize_relation_labels(df).collect()}
    assert got == {"per:place_of_birth", "per:places_of_residence", "per:title"}


def test_normalize_ner_labels(spark):
    df = spark.createDataFrame([(["ORGANIZATION", "CITY", "O", "XX"],)], "ner array<string>")
    got = normalize_ner_labels(df).first().ner
    assert got == ["ORG", "LOC", "O", "XX"]


def test_swap_arguments(spark):
    df = spark.createDataFrame(
        [(1, 2, 5, 6, "PERSON", "TITLE")],
        "subj_start int, subj_end int, obj_start int, obj_end int, subj_type string, obj_type string",
    )
    row = swap_arguments(df).first()
    assert (row.subj_start, row.subj_end, row.subj_type) == (5, 6, "TITLE")
    assert (row.obj_start, row.obj_end, row.obj_type) == (1, 2, "PERSON")


def test_add_entity_types_from_relation(spark):
    df = spark.createDataFrame([("per:title",), ("org:members",)], "label string")
    rows = {r.label: (r.subj_type, r.obj_type) for r in add_entity_types_from_relation(df).collect()}
    assert rows["per:title"] == ("PERSON", "POSITION")
    assert rows["org:members"] == ("ORG", "ORG")


def test_collate_and_leakage(spark):
    a = spark.createDataFrame([("1", "x y"), ("2", "z w")], "id string, text string")
    b = spark.createDataFrame([("1", "x y"), ("9", "q r")], "id string, text string")
    union = collate_datasets([("dsa", a), ("dsb", b)])
    assert union.count() == 4
    assert {r.id for r in union.collect()} == {"dsa-1", "dsa-2", "dsb-1", "dsb-9"}
    cleaned = remove_cross_split_leakage(a, b, F.col("text"))
    assert {r.id for r in cleaned.collect()} == {"9"}


# --- S4 serialized-Document source --------------------------------------

def test_read_document_jsonl(spark, tmp_path):
    doc = {
        "guid": "d1",
        "text": "Douglas Flint is chairman .",
        "tokens": [
            {"start": 0, "end": 7, "ent_type": None, "ent_dist": {"B-PERSON": 3, "O": 1}},
            {"start": 8, "end": 13, "ent_type": None, "ent_dist": {"I-PERSON": 4}},
            {"start": 14, "end": 16, "ent_type": "O", "ent_dist": None},
            {"start": 17, "end": 25, "ent_type": "B-TITLE", "ent_dist": None},
            {"start": 26, "end": 27, "ent_type": "O", "ent_dist": None},
        ],
        "sents": [{"start": 0, "end": 5}],
        "ments": [],
        "ents": [],
        "rels": [],
    }
    path = tmp_path / "docs.jsonl"
    path.write_text(json.dumps(doc) + "\n")
    row = read_document_jsonl(spark, str(path)).first()
    assert [t.ent_type for t in row.tokens] == [
        "B-PERSON", "I-PERSON", "O", "B-TITLE", "O",
    ]
    # ments derived from BIO since input ments empty
    assert [(m.start, m.end, m.label) for m in row.ments] == [
        (0, 2, "PERSON"), (3, 4, "TITLE"),
    ]


def test_document_jsonl_roundtrip(spark, tmp_path):
    doc = {
        "guid": "d2",
        "text": "a b",
        "tokens": [
            {"start": 0, "end": 1, "ent_type": "O"},
            {"start": 2, "end": 3, "ent_type": "O"},
        ],
        "sents": [{"start": 0, "end": 2}],
        "ments": [{"start": 0, "end": 1, "label": "X"}],
        "ents": [],
        "rels": [],
    }
    path = tmp_path / "docs2.jsonl"
    path.write_text(json.dumps(doc) + "\n" + json.dumps(doc) + "\n")
    df = read_document_jsonl(spark, str(path))
    out = str(tmp_path / "out_jsonl")
    write_document_jsonl(df, out)
    back = spark.read.json(out)
    assert back.count() == 1  # dedup by guid
    assert back.first().guid == "d2"


# --- multimodal plumbing -------------------------------------------------

def test_media_features(spark):
    rows = [
        (1, "image", "image/png", 4, 4, None, bytearray(b"pngbytes")),
        (2, "audio", "audio/wav", None, None, 2500, bytearray(b"wavbytes")),
        (3, "video", "video/mp4", 16, 16, 3500, bytearray(b"mp4bytes")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_media_features(media).collect()
    assert len(feats) == 3
    by_id = {f.media_id: f for f in feats}
    assert by_id[1].n_bytes == 8
    assert len(by_id[1].feature) == 16
    # deterministic: same payload -> same feature/hash
    feats2 = extract_media_features(media).collect()
    assert {f.media_id: f.content_hash for f in feats2} == {
        f.media_id: f.content_hash for f in feats
    }
    frames = sample_video_frames(media, every_ms=1000).collect()
    assert [(f.media_id, f.frame_ts_ms) for f in frames] == [
        (3, 0), (3, 1000), (3, 2000), (3, 3000),
    ]


def test_media_resize_chunk_similarity(spark):
    rows = [
        (1, "image", "image/png", 1024, 768, None, bytearray(b"big")),
        (2, "image", "image/png", 100, 50, None, bytearray(b"small")),
        (3, "image", "image/png", None, None, None, bytearray(b"nodims")),
        (4, "audio", "audio/wav", None, None, 6000, bytearray(b"wav")),
        (5, "image", "image/png", 8, 8, None, bytearray(b"big")),  # dup of 1
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    planned = {r.media_id: r for r in resize_plan(media, max_side=256).collect()}
    # aspect-preserving: 1024x768 -> 256x192; small/no-dims untouched
    assert (planned[1].target_width, planned[1].target_height) == (256, 192)
    assert (planned[2].target_width, planned[2].target_height) == (100, 50)
    assert planned[3].target_width is None

    chunks = chunk_audio(media, window_ms=5000, hop_ms=2500).collect()
    assert [(c.chunk_start_ms, c.chunk_end_ms) for c in chunks] == [
        (0, 5000), (2500, 6000), (5000, 6000),
    ]

    # identical payloads (1 and 5) are exact nearest neighbors, cos=1
    topk = media_similarity_topk(media, k=1).collect()
    best = {r.query_id: (r.neighbor_id, r.cos) for r in topk}
    assert best[1] == (5, 1.0) and best[5] == (1, 1.0)


# --- brat sink -----------------------------------------------------------

def test_to_brat():
    row = {
        "text": "Douglas Flint is chairman .",
        "tokens": [
            {"start": 0, "end": 7}, {"start": 8, "end": 13},
            {"start": 14, "end": 16}, {"start": 17, "end": 25},
            {"start": 26, "end": 27},
        ],
        "ments": [
            {"start": 0, "end": 2, "label": "PERSON"},
            {"start": 3, "end": 4, "label": "TITLE"},
        ],
        "rels": [{"head_idx": 0, "tail_idx": 1, "label": "per:title"}],
    }
    brat = to_brat(row)
    assert brat["entities"] == [
        ["T1", "PERSON", [[0, 13]]],
        ["T2", "TITLE", [[17, 25]]],
    ]
    assert brat["relations"] == [
        ["R1", "per:title", [["head", "T1"], ["tail", "T2"]]],
    ]
