"""Dataset-preprocessing operators (SURVEY.md §2.2 O11-O13, A5-A7).

The reference ships one converter script per training dataset
(``sherlock/dataset_preprocessors/*_preprocessor.py``); the reusable
semantics are (a) label-space normalization maps/regexes, (b) the
relation -> (subj_type, obj_type) rule map used to backfill NER types,
and (c) argument swapping for inverse relations. All are expressed as
column operations over broadcastable literal maps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# O12 — TACRED relation-label normalization
# (tacred_preprocessor.py:12-25): location-specific *_of relations merge
# into place(s)_of.
TACRED_LABEL_REGEXES: list[tuple[str, str]] = [
    (r"(cities|countries|stateorprovinces)_of", "places_of"),
    (r"(city|country|stateorprovince)_of", "place_of"),
]

# O12 — TACRED NER-type normalization (tacred_preprocessor.py:28-64)
TACRED_NER_MAP: dict[str, str] = {
    "PERSON": "PERSON",
    "ORGANIZATION": "ORG",
    "LOCATION": "LOC",
    "MISC": "MISC",
    "CITY": "LOC",
    "DATE": "DATE",
    "NATIONALITY": "LOC",
    "RELIGION": "NORP",
    "URL": "URL",
    "CAUSE_OF_DEATH": "CAUSE_OF_DEATH",
    "COUNTRY": "LOC",
    "DURATION": "TIME",
    "STATE_OR_PROVINCE": "LOC",
    "CRIMINAL_CHARGE": "CHARGE",
    "IDEOLOGY": "MISC",
    "TITLE": "POSITION",
}

# O11 — relation -> (subj_type, obj_type) rules
# (add_ner_annotation.py:20-210). Expressed as the naming convention the
# TACRED label space follows (per:* -> PERSON subject, org:* -> ORG
# subject) plus an object-type map for the label tails; equivalent to
# the reference's explicit case list for the standard label space.
_OBJECT_TYPE_BY_TAIL: dict[str, str] = {
    "title": "POSITION",
    "degree": "DEGREE",
    "age": "NUM",
    "charges": "CHARGE",
    "cause_of_death": "CAUSE_OF_DEATH",
    "religion": "NORP",
    "website": "URL",
    "alternate_names": None,  # same as subject type
    "place_of_birth": "LOC",
    "place_of_death": "LOC",
    "places_of_residence": "LOC",
    "place_of_headquarters": "LOC",
    "origin": "LOC",
    "date_of_birth": "DATE",
    "date_of_death": "DATE",
    "founded": "DATE",
    "dissolved": "DATE",
    "employee_of": "ORG",
    "member_of": "ORG",
    "members": "ORG",
    "subsidiaries": "ORG",
    "parents": None,
    "children": "PERSON",
    "siblings": "PERSON",
    "spouse": "PERSON",
    "other_family": "PERSON",
    "schools_attended": "ORG",
    "top_members/employees": "PERSON",
    "founded_by": "PERSON",
    "shareholders": "PERSON",
    "number_of_employees/members": "NUM",
    "political/religious_affiliation": "NORP",
}


def relation_entity_types(label: str) -> tuple[str | None, str | None]:
    """(subj_type, obj_type) implied by a TACRED-style relation label."""
    if ":" not in label:
        return None, None
    prefix, _, tail = label.partition(":")
    subj_type = {"per": "PERSON", "org": "ORG"}.get(prefix)
    obj_type = _OBJECT_TYPE_BY_TAIL.get(tail)
    if obj_type is None and tail in ("alternate_names", "parents"):
        obj_type = subj_type
    return subj_type, obj_type


def normalize_relation_labels(
    df: DataFrame, label_col: str = "label", merge_location: bool = True
) -> DataFrame:
    """O12: apply the location-merge regexes to a relation-label column."""
    if not merge_location:
        return df
    column: Column = F.col(label_col)
    for pattern, replacement in TACRED_LABEL_REGEXES:
        column = F.regexp_replace(column, pattern, replacement)
    return df.withColumn(label_col, column)


def normalize_ner_labels(df: DataFrame, ner_col: str = "ner") -> DataFrame:
    """O12: map raw NER tags through the TACRED normalization map
    (array column; unknown tags pass through).
    """
    pairs: list[Column] = []
    for key, value in TACRED_NER_MAP.items():
        pairs.extend([F.lit(key), F.lit(value)])
    mapping = F.create_map(*pairs)
    return df.withColumn(
        ner_col,
        F.transform(F.col(ner_col), lambda tag: F.coalesce(mapping[tag], tag)),
    )


def add_entity_types_from_relation(df: DataFrame, label_col: str = "label") -> DataFrame:
    """O11: backfill subj_type/obj_type from the relation label."""
    labels = [row[0] for row in df.select(label_col).distinct().collect()]
    subj_pairs: list[Column] = []
    obj_pairs: list[Column] = []
    for label in labels:
        subj_type, obj_type = relation_entity_types(label)
        if subj_type is not None:
            subj_pairs.extend([F.lit(label), F.lit(subj_type)])
        if obj_type is not None:
            obj_pairs.extend([F.lit(label), F.lit(obj_type)])
    subj_map = F.create_map(*subj_pairs) if subj_pairs else F.create_map()
    obj_map = F.create_map(*obj_pairs) if obj_pairs else F.create_map()
    return df.withColumn("subj_type", subj_map[F.col(label_col)]).withColumn(
        "obj_type", obj_map[F.col(label_col)]
    )


def swap_arguments(df: DataFrame) -> DataFrame:
    """O13 (utils.py:48-52): swap subj/obj spans and types."""
    return (
        df.withColumn("_tmp", F.col("subj_start"))
        .withColumn("subj_start", F.col("obj_start"))
        .withColumn("obj_start", F.col("_tmp"))
        .withColumn("_tmp", F.col("subj_end"))
        .withColumn("subj_end", F.col("obj_end"))
        .withColumn("obj_end", F.col("_tmp"))
        .withColumn("_tmp", F.col("subj_type"))
        .withColumn("subj_type", F.col("obj_type"))
        .withColumn("obj_type", F.col("_tmp"))
        .drop("_tmp")
    )


def collate_datasets(frames: list[tuple[str, DataFrame]]) -> DataFrame:
    """A5 (collate_datasets.py:109-215): union datasets with id prefixes."""
    out = None
    for prefix, frame in frames:
        prefixed = frame.withColumn(
            "id", F.concat(F.lit(prefix), F.lit("-"), F.col("id"))
        )
        out = prefixed if out is None else out.unionByName(prefixed)
    return out


def remove_cross_split_leakage(
    train: DataFrame, other: DataFrame, text_expr: Column
) -> DataFrame:
    """A7 (collate_datasets.py:34-53): drop rows from ``other`` whose
    joined-token text also appears in ``train`` (anti-join).
    """
    train_texts = train.select(text_expr.alias("_text")).distinct()
    return other.join(
        train_texts, other["text"] == train_texts["_text"], "left_anti"
    )
