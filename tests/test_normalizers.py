"""O12 dataset normalizers vs reference preprocessor semantics
(sherlock/dataset_preprocessors/*_preprocessor.py).
"""

from pyspark.sql import functions as F

from sherlock_spark.operators.normalizers import (
    normalize_dataset,
    tacred_to_dfki,
)

DFKI_SCHEMA = (
    "id string, tokens array<string>, label string, "
    "entities array<array<int>>, type array<string>, grammar array<string>"
)


def _row(spark, label, subj_type="PERSON", obj_type="ORG"):
    return spark.createDataFrame(
        [
            (
                "x",
                ["a", "b", "c", "d"],
                label,
                [[0, 1], [2, 3]],
                [subj_type, obj_type],
                ["SUBJ", "OBJ"],
            )
        ],
        DFKI_SCHEMA,
    )


def test_tacred_location_merge_and_ner_map(spark):
    # tacred_preprocessor.py:12-25 regexes, :28-64 NER map
    df = _row(spark, "per:cities_of_residence", "PERSON", "CITY")
    out = normalize_dataset(df, "tacred").collect()[0]
    assert out.label == "per:places_of_residence"
    assert list(out.type) == ["PERSON", "LOC"]
    df2 = _row(spark, "org:country_of_headquarters", "ORGANIZATION", "COUNTRY")
    out2 = normalize_dataset(df2, "tacred").collect()[0]
    assert out2.label == "org:place_of_headquarters"
    assert list(out2.type) == ["ORG", "LOC"]


def test_kbp37_directional_swap(spark):
    # kbp37_preprocessor.py: (e2,e1) swaps; subsidiaries(e2,e1) maps to
    # the inverse predicate without swapping
    out = normalize_dataset(
        _row(spark, "per:employee_of(e2,e1)", "ORG", "PERSON"),
        "kbp37",
        override_entity_types=False,
    ).collect()[0]
    assert out.label == "per:employee_of"
    assert [list(e) for e in out.entities] == [[2, 3], [0, 1]]
    assert list(out.type) == ["PERSON", "ORG"]

    out2 = normalize_dataset(
        _row(spark, "org:subsidiaries(e2,e1)", "ORG", "ORG"),
        "kbp37",
        override_entity_types=False,
    ).collect()[0]
    assert out2.label == "org:parents"
    assert [list(e) for e in out2.entities] == [[0, 1], [2, 3]]  # no swap

    # unmapped labels are dropped
    assert (
        normalize_dataset(
            _row(spark, "per:made_up(e1,e2)"), "kbp37"
        ).count()
        == 0
    )


def test_kbp37_override_entity_types(spark):
    # O11 backfill (add_ner_annotation.py rule map via
    # relation_entity_types): per:employee_of -> (PERSON, ORG)
    out = normalize_dataset(
        _row(spark, "per:employee_of(e1,e2)", "X", "Y"), "kbp37"
    ).collect()[0]
    assert list(out.type) == ["PERSON", "ORG"]


def test_docred_drop_list_and_conditionals(spark):
    # drop list wins even where a later elif exists ("work location")
    assert normalize_dataset(_row(spark, "work location"), "docred").count() == 0
    assert normalize_dataset(_row(spark, "cast member"), "docred").count() == 0

    # developer: only (._, ORG) maps, with swap (docred:122-124)
    dev_org = normalize_dataset(
        _row(spark, "developer", "MISC", "ORG"),
        "docred",
        override_entity_types=False,
    ).collect()[0]
    assert dev_org.label == "org:developer"
    assert [list(e) for e in dev_org.entities] == [[2, 3], [0, 1]]
    assert (
        normalize_dataset(
            _row(spark, "developer", "MISC", "PER"), "docred"
        ).count()
        == 0
    )

    # inception: only ORG subjects map (docred:152-154)
    assert (
        normalize_dataset(_row(spark, "inception", "LOC", "TIME"), "docred").count()
        == 0
    )
    inc = normalize_dataset(
        _row(spark, "inception", "ORG", "TIME"),
        "docred",
        override_entity_types=False,
    ).collect()[0]
    assert inc.label == "org:founded"

    # member of: PER subj -> per:member_of (no swap); else org:members + swap
    per = normalize_dataset(
        _row(spark, "member of", "PER", "ORG"),
        "docred",
        override_entity_types=False,
    ).collect()[0]
    assert per.label == "per:member_of"
    assert [list(e) for e in per.entities] == [[0, 1], [2, 3]]
    org = normalize_dataset(
        _row(spark, "member of", "ORG", "ORG"),
        "docred",
        override_entity_types=False,
    ).collect()[0]
    assert org.label == "org:members"
    assert [list(e) for e in org.entities] == [[2, 3], [0, 1]]


def test_docred_type_quirk_and_work_of_art(spark):
    """Reference quirk: the final type is rebuilt from PRE-swap locals
    (docred:83-91,:234-238) with the adjust_entity_type overrides."""
    out = normalize_dataset(
        _row(spark, "author", "MISC", "PER"),
        "docred",
        override_entity_types=False,
    ).collect()[0]
    assert out.label == "per:author"
    # entities swapped ...
    assert [list(e) for e in out.entities] == [[2, 3], [0, 1]]
    # ... but type = [pre-swap subj (ner-mapped), WORK_OF_ART]
    assert list(out.type) == ["MISC", "WORK_OF_ART"]

    conflict = normalize_dataset(
        _row(spark, "conflict", "PER", "MISC"),
        "docred",
        override_entity_types=False,
    ).collect()[0]
    assert conflict.label == "event:conflict"
    assert list(conflict.type) == ["EVENT", "MISC"]


def test_smiler_gids_knet_plass_flat_maps(spark):
    cases = [
        ("smiler", "is-where", "loc:location_of", True),
        ("smiler", "no_relation", "no_relation", False),
        ("gids", "NA", "no_relation", False),
        ("gids", "/people/person/place_of_birth", "per:place_of_birth", False),
        ("knet", "SUBSIDIARY_OF", "org:subsidiaries", True),
        ("knet", "NATIONALITY", "per:origin", False),
        ("plass", "CompanyFacility", "org:facility_or_location", False),
    ]
    for dataset, src, expected, swapped in cases:
        out = normalize_dataset(
            _row(spark, src), dataset, override_entity_types=False
        ).collect()[0]
        assert out.label == expected, (dataset, src)
        want = [[2, 3], [0, 1]] if swapped else [[0, 1], [2, 3]]
        assert [list(e) for e in out.entities] == want, (dataset, src)
    # plass NER map
    out = normalize_dataset(
        _row(spark, "Disaster", "LOCATION", "DISASTER_TYPE"),
        "plass",
        override_entity_types=False,
    ).collect()[0]
    assert list(out.type) == ["LOC", "DISASTER_TYPE"]


def test_tacred_to_dfki(spark):
    raw = spark.createDataFrame(
        [
            (
                "id1",
                ["Ada", "works", "at", "Acme", "in", "Paris"],
                "per:cities_of_residence",
                0, 0, 5, 5, "PERSON", "CITY",
            )
        ],
        "id string, token array<string>, relation string, subj_start int,"
        " subj_end int, obj_start int, obj_end int, subj_type string,"
        " obj_type string",
    )
    out = tacred_to_dfki(raw).collect()[0]
    assert out.label == "per:places_of_residence"
    assert [list(e) for e in out.entities] == [[0, 1], [5, 6]]  # exclusive
    assert list(out.type) == ["PERSON", "CITY"]
    assert list(out.grammar) == ["SUBJ", "OBJ"]
