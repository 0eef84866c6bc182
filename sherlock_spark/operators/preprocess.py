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

# O11 — relation -> (subj_type, obj_type) rules: a 1:1 transcription of
# the reference's explicit per-label chain
# (add_ner_annotation.py:20-210, get_entity_types_from_relation).
# Notable entries a naming-convention heuristic would get wrong (and a
# previous revision did): per:religion -> obj ORG (not NORP), the
# authored-work relations (author/director/composer/creator/lyrics_by/
# notable_work/performer/producer/screenwriter) -> obj WORK_OF_ART,
# loc:* subjects. Labels absent from the chain (per:age, per:charges,
# org:website, org:acquisition, ...) fall through and KEEP the incoming
# types, exactly like the reference's if/elif fall-through.
RELATION_ENTITY_TYPES: dict[str, tuple[str, str]] = {
    "per:place_of_birth": ("PERSON", "LOC"),
    "per:degree": ("PERSON", "DEGREE"),
    "per:place_of_death": ("PERSON", "LOC"),
    "org:alternate_names": ("ORG", "ORG"),
    "org:founded": ("ORG", "DATE"),
    "org:founded_by": ("ORG", "PERSON"),
    "org:members": ("ORG", "ORG"),
    "org:subsidiaries": ("ORG", "ORG"),
    "org:top_members/employees": ("ORG", "PERSON"),
    "per:alternate_names": ("PERSON", "PERSON"),
    "per:places_of_residence": ("PERSON", "LOC"),
    "per:date_of_birth": ("PERSON", "DATE"),
    "per:date_of_death": ("PERSON", "DATE"),
    "per:employee_of": ("PERSON", "ORG"),
    "per:origin": ("PERSON", "LOC"),
    "per:political_affiliation": ("PERSON", "ORG"),
    "per:title": ("PERSON", "POSITION"),
    "per:author": ("PERSON", "WORK_OF_ART"),
    "per:children": ("PERSON", "PERSON"),
    "per:schools_attended": ("PERSON", "ORG"),
    "per:country_of_citizenship": ("PERSON", "LOC"),
    "per:parents": ("PERSON", "PERSON"),
    "per:siblings": ("PERSON", "PERSON"),
    "per:spouse": ("PERSON", "PERSON"),
    "org:place_of_headquarters": ("ORG", "LOC"),
    "org:member_of": ("ORG", "ORG"),
    "per:member_of": ("PERSON", "ORG"),
    "loc:location_of": ("LOC", "ORG"),
    "per:head_of_gov/state": ("PERSON", "LOC"),
    "per:director": ("PERSON", "WORK_OF_ART"),
    "loc:capital_of": ("LOC", "LOC"),
    "per:composer": ("PERSON", "WORK_OF_ART"),
    "loc:country": ("LOC", "LOC"),
    "per:creator": ("PERSON", "WORK_OF_ART"),
    # the reference keys ONLY per:developer (add_ner_annotation.py:140);
    # org:developer — the label the shared RELATION_TYPES space and the
    # docred converter actually produce — has no branch there, so it
    # takes the keep-incoming fall-through on both engines by design
    "per:developer": ("PERSON", "WORK_OF_ART"),
    "org:dissolved": ("ORG", "DATE"),
    "per:field_of_work": ("PERSON", "MISC"),
    "per:language": ("PERSON", "MISC"),
    "org:facility_or_location": ("ORG", "LOC"),
    "org:location_of_formation": ("ORG", "LOC"),
    "per:lyrics_by": ("PERSON", "WORK_OF_ART"),
    "org:product_or_technology_or_service": ("ORG", "PRODUCT"),
    "per:notable_work": ("PERSON", "WORK_OF_ART"),
    "org:parents": ("ORG", "ORG"),
    "per:performer": ("PERSON", "WORK_OF_ART"),
    "per:producer": ("PERSON", "WORK_OF_ART"),
    "org:production_company": ("ORG", "WORK_OF_ART"),
    "per:religion": ("PERSON", "ORG"),
    "per:screenwriter": ("PERSON", "WORK_OF_ART"),
    "loc:twinned_adm_body": ("LOC", "LOC"),
    "loc:unemployment_rate": ("LOC", "NUM"),
    "per:work_location": ("PERSON", "LOC"),
    "loc:located_in": ("LOC", "LOC"),
}

# Labels whose branch in the reference chain is conditional on the
# INCOMING type: (fixed subj or (keep-list, fallback), same for obj).
# event:conflict keeps an incoming ORG object (else PERSON);
# loc:country_of_origin keeps MISC/ORG/PERSON objects and otherwise
# forces MISC only when an incoming type exists (None stays None);
# per:ethnic_group keeps LOC/PERSON subjects (else PERSON);
# org:shareholders keeps PERSON/ORGANIZATION objects — note the
# reference compares against the *unnormalized* "ORGANIZATION" string,
# so an incoming "ORG" is rewritten to PERSON (quirk preserved).
_CONDITIONAL_ENTITY_TYPES = {
    "event:conflict",
    "loc:country_of_origin",
    "per:ethnic_group",
    "org:shareholders",
}


def relation_entity_types(
    label: str,
    subj_type: str | None = None,
    obj_type: str | None = None,
) -> tuple[str | None, str | None]:
    """(subj_type, obj_type) implied by a relation label — the exact
    semantics of ``get_entity_types_from_relation(relation_label,
    subj_type, obj_type)`` including incoming-type-conditional branches
    and keep-incoming fall-through.
    """
    if label in RELATION_ENTITY_TYPES:
        return RELATION_ENTITY_TYPES[label]
    if label == "event:conflict":
        return "EVENT", obj_type if obj_type == "ORG" else "PERSON"
    if label == "loc:country_of_origin":
        if obj_type is not None and obj_type not in ("MISC", "ORG", "PERSON"):
            obj_type = "MISC"
        return "LOC", obj_type
    if label == "per:ethnic_group":
        if subj_type not in ("LOC", "PERSON"):
            subj_type = "PERSON"
        return subj_type, "LOC"
    if label == "org:shareholders":
        if obj_type not in ("PERSON", "ORGANIZATION"):
            obj_type = "PERSON"
        return "ORG", obj_type
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
