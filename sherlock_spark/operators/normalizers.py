"""O12: per-dataset label-space normalizers over DFKI-shaped rows.

Reference: ``sherlock/dataset_preprocessors/*_preprocessor.py`` — each
dataset's ``map_<ds>_label`` remaps its relation vocabulary onto the
shared RELATION_TYPES space, dropping unmapped labels, swapping
subject/object where the source directionality is inverted
(``utils.py:48-52`` swap_args), and optionally rewriting entity types;
``map_<ds>_ner_label`` remaps NER tags. The reference encodes these as
if/elif chains; here they are data tables compiled into one Catalyst
``when``/map-lookup projection per dataset — no Python per row.

Faithfulness notes:
- map entries below transcribe the reference chains 1:1 (file:line per
  table); commented-out reference branches are omitted like the
  original executes them;
- docred's type-conditioned branches (developer / inception /
  member of) and its drop-list-first quirk ("work location" appears in
  both the drop list and a later elif — the drop wins) are preserved;
- entity-type override (``get_entity_types_from_relation``,
  add_ner_annotation.py:20-210 = O11) uses the 1:1-transcribed
  ``relation_entity_types`` table including the four
  incoming-type-conditional branches; labels outside the chain keep
  their incoming types (the reference's if/elif fall-through);
- the override default follows each reference converter's call site
  (``OVERRIDE_DEFAULTS``): off for docred/plass, on elsewhere;
- plass passes through labels already in RELATION_TYPES before its
  elif chain (plass_preprocessor.py:15-16).

Input shape: the DFKI-JSONL document frame
``(id, tokens, label, entities [[s,e],[s,e]], type [subj,obj],
grammar)`` — the common output shape of every reference converter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sherlock_spark.operators.preprocess import relation_entity_types

# relation_types.py — the shared label space (active entries only).
# plass's map checks membership FIRST and passes already-normalized
# labels through (plass_preprocessor.py:15-16).
RELATION_TYPES: frozenset[str] = frozenset(
    [
        "org:alternate_names", "org:dissolved", "org:founded",
        "org:founded_by", "org:member_of", "per:member_of", "org:members",
        "org:number_of_employees/members", "org:parents",
        "org:political/religious_affiliation", "org:shareholders",
        "org:subsidiaries", "org:top_members/employees", "org:website",
        "per:age", "per:alternate_names", "per:cause_of_death",
        "per:charges", "per:children", "per:date_of_birth",
        "per:date_of_death", "per:employee_of", "per:origin",
        "per:other_family", "per:parents", "per:religion",
        "per:schools_attended", "per:siblings", "per:spouse", "per:title",
        "no_relation", "org:place_of_headquarters",
        "per:political_affiliation", "per:place_of_birth",
        "per:place_of_death", "per:places_of_residence", "per:degree",
        "loc:capital_of", "event:conflict", "loc:located_in",
        "per:language", "org:location_of_formation",
        "per:head_of_gov/state", "per:country_of_citizenship",
        "per:notable_work", "org:production_company", "per:creator",
        "per:ethnic_group", "per:producer", "loc:contains_location",
        "per:author", "per:director", "per:work_location",
        "loc:unemployment_rate", "loc:country_of_origin", "per:performer",
        "per:composer", "per:lyrics_by", "per:screenwriter",
        "org:developer", "loc:twinned_adm_body", "loc:country",
        "loc:location_of", "per:field_of_work",
        "org:product_or_technology_or_service", "org:facility_or_location",
        "org:acquisition", "loc:event_or_disaster", "org:customer",
        "org:fin_event",
    ]
)

# -- relation maps: source label -> (mapped label, swap subj/obj) ---------

# tacred_preprocessor.py:12-25 — regex location merge (applied to the
# label column, not a dict)
TACRED_LABEL_REGEXES = [
    (r"(cities|countries|stateorprovinces)_of", "places_of"),
    (r"(city|country|stateorprovince)_of", "place_of"),
]

# kbp37_preprocessor.py:12-119 — directional suffix resolved; (e2,e1)
# swaps, except subsidiaries(e2,e1) which maps to the inverse predicate
KBP37_RELATION_MAP: dict[str, tuple[str, bool]] = {
    "no_relation": ("no_relation", False),
    "org:alternate_names(e1,e2)": ("org:alternate_names", False),
    "org:alternate_names(e2,e1)": ("org:alternate_names", True),
    "org:city_of_headquarters(e1,e2)": ("org:place_of_headquarters", False),
    "org:city_of_headquarters(e2,e1)": ("org:place_of_headquarters", True),
    "org:country_of_headquarters(e1,e2)": ("org:place_of_headquarters", False),
    "org:country_of_headquarters(e2,e1)": ("org:place_of_headquarters", True),
    "org:founded(e1,e2)": ("org:founded", False),
    "org:founded(e2,e1)": ("org:founded", True),
    "org:founded_by(e1,e2)": ("org:founded_by", False),
    "org:founded_by(e2,e1)": ("org:founded_by", True),
    "org:members(e1,e2)": ("org:members", False),
    "org:members(e2,e1)": ("org:members", True),
    "org:stateorprovince_of_headquarters(e1,e2)": ("org:place_of_headquarters", False),
    "org:stateorprovince_of_headquarters(e2,e1)": ("org:place_of_headquarters", True),
    "org:subsidiaries(e1,e2)": ("org:subsidiaries", False),
    "org:subsidiaries(e2,e1)": ("org:parents", False),
    "org:top_members/employees(e1,e2)": ("org:top_members/employees", False),
    "org:top_members/employees(e2,e1)": ("org:top_members/employees", True),
    "per:alternate_names(e1,e2)": ("per:alternate_names", False),
    "per:alternate_names(e2,e1)": ("per:alternate_names", True),
    "per:cities_of_residence(e1,e2)": ("per:places_of_residence", False),
    "per:cities_of_residence(e2,e1)": ("per:places_of_residence", True),
    "per:countries_of_residence(e1,e2)": ("per:places_of_residence", False),
    "per:countries_of_residence(e2,e1)": ("per:places_of_residence", True),
    "per:country_of_birth(e1,e2)": ("per:place_of_birth", False),
    "per:country_of_birth(e2,e1)": ("per:place_of_birth", True),
    "per:employee_of(e1,e2)": ("per:employee_of", False),
    "per:employee_of(e2,e1)": ("per:employee_of", True),
    "per:origin(e1,e2)": ("per:origin", False),
    "per:origin(e2,e1)": ("per:origin", True),
    "per:spouse(e1,e2)": ("per:spouse", False),
    "per:spouse(e2,e1)": ("per:spouse", True),
    "per:stateorprovinces_of_residence(e1,e2)": ("per:places_of_residence", False),
    "per:stateorprovinces_of_residence(e2,e1)": ("per:places_of_residence", True),
    "per:title(e1,e2)": ("per:title", False),
    "per:title(e2,e1)": ("per:title", True),
}

# knet_preprocessor.py:31-80 (note the chain is split by a bare `if` at
# NATIONALITY in the reference — behavior is the union of both chains)
KNET_RELATION_MAP: dict[str, tuple[str, bool]] = {
    "CEO": ("org:top_members/employees", False),
    "CHILD_OF": ("per:children", False),
    "DATE_FOUNDED": ("org:founded", False),
    "DATE_OF_BIRTH": ("per:date_of_birth", False),
    "DATE_OF_DEATH": ("per:date_of_death", False),
    "EDUCATED_AT": ("per:schools_attended", False),
    "EMPLOYEE_OR_MEMBER_OF": ("per:employee_of", False),
    "FOUNDED_BY": ("org:founded_by", False),
    "HEADQUARTERS": ("org:place_of_headquarters", False),
    "NATIONALITY": ("per:origin", False),
    "POLITICAL_AFFILIATION": ("per:political_affiliation", False),
    "PLACE_OF_BIRTH": ("per:place_of_birth", False),
    "PLACE_OF_RESIDENCE": ("per:places_of_residence", False),
    "SPOUSE": ("per:spouse", False),
    "SUBSIDIARY_OF": ("org:subsidiaries", True),
}

# plass_preprocessor.py:11-37
PLASS_RELATION_MAP: dict[str, tuple[str, bool]] = {
    "no_relation": ("no_relation", False),
    "CompanyProvidesProduct": ("org:product_or_technology_or_service", False),
    "Disaster": ("loc:event_or_disaster", False),
    "CompanyFacility": ("org:facility_or_location", False),
    "CompanyFinancialEvent": ("org:fin_event", False),
    "CompanyCustomer": ("org:customer", False),
}

# gids_preprocessor.py:15-42
GIDS_RELATION_MAP: dict[str, tuple[str, bool]] = {
    "/people/person/education./education/education/degree": ("per:degree", False),
    "NA": ("no_relation", False),
    "/people/person/education./education/education/institution": ("per:schools_attended", False),
    "/people/person/place_of_birth": ("per:place_of_birth", False),
    "/people/deceased_person/place_of_death": ("per:place_of_death", False),
}

# smiler_preprocessor.py:16-105
SMILER_RELATION_MAP: dict[str, tuple[str, bool]] = {
    "birth-place": ("per:place_of_birth", False),
    "from-country": ("per:origin", False),
    "has-author": ("per:author", True),
    "has-child": ("per:children", False),
    "has-edu": ("per:schools_attended", False),
    "has-nationality": ("per:country_of_citizenship", False),
    "has-occupation": ("per:title", False),
    "has-parent": ("per:parents", False),
    "has-sibling": ("per:siblings", False),
    "has-spouse": ("per:spouse", False),
    "headquarters": ("org:place_of_headquarters", False),
    "is-member-of": ("per:member_of", False),
    "is-where": ("loc:location_of", True),
    "loc-leader": ("per:head_of_gov/state", True),
    "movie-has-director": ("per:director", True),
    "no_relation": ("no_relation", False),
    "org-has-founder": ("org:founded_by", False),
    "org-has-member": ("org:members", False),
    "org-leader": ("org:top_members/employees", False),
}

# docred_preprocessor.py:86-232 unconditional branches
DOCRED_RELATION_MAP: dict[str, tuple[str, bool]] = {
    "author": ("per:author", True),
    "capital of": ("loc:capital_of", False),
    "capital": ("loc:capital_of", True),
    "chairperson": ("org:top_members/employees", False),
    "child": ("per:children", False),
    "composer": ("per:composer", True),
    "conflict": ("event:conflict", True),
    "country": ("loc:country", False),
    "country of citizenship": ("per:country_of_citizenship", False),
    "country of origin": ("loc:country_of_origin", True),
    "creator": ("per:creator", True),
    "date of birth": ("per:date_of_birth", False),
    "date of death": ("per:date_of_death", False),
    "director": ("per:director", True),
    "dissolved, abolished or demolished": ("org:dissolved", False),
    "educated at": ("per:schools_attended", False),
    "employer": ("per:employee_of", False),
    "father": ("per:parents", False),
    "mother": ("per:parents", False),
    "field of work": ("per:field_of_work", False),
    "founded by": ("org:founded_by", False),
    "head of government": ("per:head_of_gov/state", True),
    "head of state": ("per:head_of_gov/state", True),
    "headquarters location": ("org:place_of_headquarters", False),
    "language": ("per:language", False),
    "located in the administrative territorial entity": ("loc:located_in", False),
    "located on terrain feature": ("loc:located_in", False),
    "location of formation": ("org:location_of_formation", False),
    "lyrics by": ("per:lyrics_by", True),
    "manufacturer": ("org:product_or_technology_or_service", True),
    "member of political party": ("per:political_affiliation", False),
    "notable work": ("per:notable_work", False),
    "occupation": ("per:title", False),
    "owned by": ("org:shareholders", False),
    "parent organization": ("org:parents", True),
    "performer": ("per:performer", True),
    "place of birth": ("per:place_of_birth", False),
    "place of death": ("per:place_of_death", False),
    "position held": ("per:title", False),
    "producer": ("per:producer", False),
    "product or material produced": ("org:product_or_technology_or_service", False),
    "production company": ("org:production_company", False),
    "religion": ("per:religion", False),
    "residence": ("per:places_of_residence", False),
    "screenwriter": ("per:screenwriter", True),
    "sibling": ("per:siblings", False),
    "sister city": ("loc:twinned_adm_body", False),
    "spouse": ("per:spouse", False),
    "subsidiary": ("org:subsidiaries", False),
    "unemployment rate": ("loc:unemployment_rate", False),
}

# docred_preprocessor.py:20-85 — labels returning None immediately; the
# drop list is checked FIRST, so "work location" (also mapped at :231)
# is dropped like the reference executes it
DOCRED_DROP: frozenset[str] = frozenset(
    [
        "after a work by", "applies to jurisdiction", "architect",
        "award received", "basin country", "cast member", "characters",
        "contains administrative territorial entity", "continent",
        "distributor", "end time", "followed by", "follows", "genre",
        "has part", "heritage designation", "influenced by", "instance of",
        "instrument", "language of work or name",
        "languages spoken, written or signed", "league", "legislative body",
        "licensed to broadcast to", "located in or next to body of water",
        "member of sports team", "military branch", "mountain range",
        "mouth of the watercourse", "movement", "narrative location",
        "nominated for", "occupant", "official language",
        "operating system", "operator", "original language of work",
        "original network", "parent taxon", "part of", "participant",
        "participant of", "participating team",
        "place served by transport hub", "platform", "point in time",
        "present in work", "publication date", "record label",
        "replaced by", "replaces", "said to be the same as",
        "separated from", "series",
        "sports season of league or competition", "start time",
        "subclass of", "successful candidate", "taxon rank",
        "territory claimed by", "tributary", "winner", "work location",
    ]
)

# -- NER tag maps ----------------------------------------------------------

# tacred_preprocessor.py:28-64
TACRED_NER_MAP: dict[str, str] = {
    "PERSON": "PERSON", "ORGANIZATION": "ORG", "LOCATION": "LOC",
    "MISC": "MISC", "CITY": "LOC", "DATE": "DATE", "NATIONALITY": "LOC",
    "RELIGION": "NORP", "URL": "URL", "CAUSE_OF_DEATH": "CAUSE_OF_DEATH",
    "COUNTRY": "LOC", "DURATION": "TIME", "STATE_OR_PROVINCE": "LOC",
    "CRIMINAL_CHARGE": "CHARGE", "IDEOLOGY": "MISC", "TITLE": "POSITION",
}

# docred_preprocessor.py:240-254
DOCRED_NER_MAP: dict[str, str] = {"PER": "PERSON", "NUM": "CARDINAL"}

# plass_preprocessor.py:40-55
PLASS_NER_MAP: dict[str, str] = {
    "ORGANIZATION": "ORG", "LOCATION": "LOC", "NUMBER": "CARDINAL",
}

RELATION_MAPS: dict[str, dict[str, tuple[str, bool]]] = {
    "kbp37": KBP37_RELATION_MAP,
    "knet": KNET_RELATION_MAP,
    "plass": PLASS_RELATION_MAP,
    "gids": GIDS_RELATION_MAP,
    "smiler": SMILER_RELATION_MAP,
    "docred": DOCRED_RELATION_MAP,
    "fewrel": DOCRED_RELATION_MAP,  # fewrel_preprocessor.py:10-12
}

# labels whose O11 rule depends on the incoming type (see
# preprocess.relation_entity_types) — handled as column conditionals,
# excluded from the static lookup maps
_CONDITIONAL_LABELS: frozenset[str] = frozenset(
    [
        "event:conflict",
        "loc:country_of_origin",
        "per:ethnic_group",
        "org:shareholders",
    ]
)

NER_MAPS: dict[str, dict[str, str]] = {
    "tacred": TACRED_NER_MAP,
    "docred": DOCRED_NER_MAP,
    "fewrel": DOCRED_NER_MAP,
    "plass": PLASS_NER_MAP,
    # kbp37/gids/smiler/knet: identity (their map_*_ner_label bodies)
}


def _map_lookup(mapping: dict[str, str], key: Column, default: Column) -> Column:
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.create_map(*pairs)[key], default) if pairs else default


def merge_tacred_locations(label: Column) -> Column:
    """tacred_preprocessor.py:12-25 — *_of location merge regexes."""
    for pattern, replacement in TACRED_LABEL_REGEXES:
        label = F.regexp_replace(label, pattern, replacement)
    return label


# Per-dataset override defaults mirror the reference converters'
# call sites: docred passes the map_docred_label default (False,
# docred_preprocessor.py:12,300), plass has no override path at all
# (plass_preprocessor.py:11-37), fewrel forces True
# (fewrel_preprocessor.py:12), and kbp37/knet/gids/smiler use their
# map_* default True.
OVERRIDE_DEFAULTS: dict[str, bool] = {
    "docred": False,
    "plass": False,
    "kbp37": True,
    "knet": True,
    "gids": True,
    "smiler": True,
    "fewrel": True,
}


def normalize_dataset(
    df: DataFrame, dataset: str, override_entity_types: bool | None = None
) -> DataFrame:
    """DFKI-shaped rows -> shared label space. Unmapped labels (and
    docred's drop list) are removed; swap branches exchange
    entities[0]<->[1] and type[0]<->[1]; NER tags pass through the
    dataset's ner map. One Catalyst projection per step.

    ``override_entity_types=None`` resolves to the dataset's reference
    default (``OVERRIDE_DEFAULTS``). The O11 override applies
    per-side: a side whose rule is unknown keeps its incoming type
    (the reference's all-or-nothing ``if subj and obj`` guard differs
    only when exactly one side resolves, which requires an
    already-partial input type array).
    """
    if dataset == "tacred":
        out = df.withColumn("label", merge_tacred_locations(F.col("label")))
        return _apply_ner_map(out, NER_MAPS["tacred"])
    if dataset not in RELATION_MAPS:
        raise ValueError(f"unknown dataset: {dataset}")
    if override_entity_types is None:
        override_entity_types = OVERRIDE_DEFAULTS[dataset]

    rel_map = RELATION_MAPS[dataset]
    mapped_pairs: list[Column] = []
    swap_pairs: list[Column] = []
    for src, (dst, swap) in rel_map.items():
        mapped_pairs.extend([F.lit(src), F.lit(dst)])
        swap_pairs.extend([F.lit(src), F.lit(swap)])
    mapped = F.create_map(*mapped_pairs)[F.col("label")]
    if dataset == "plass":
        # plass_preprocessor.py:15-16: a label that is ALREADY in the
        # shared space passes through before the elif chain runs
        mapped = F.coalesce(
            F.when(
                F.col("label").isin(*sorted(RELATION_TYPES)), F.col("label")
            ),
            mapped,
        )
    swap = F.coalesce(F.create_map(*swap_pairs)[F.col("label")], F.lit(False))

    type_final = F.when(
        swap, F.array(F.col("type")[1], F.col("type")[0])
    ).otherwise(F.col("type"))

    if dataset in ("docred", "fewrel"):
        # type-conditioned branches (docred_preprocessor.py:122-124,
        # :152-154,:174-179) evaluated on the docred-ner-mapped types
        subj_t = _map_lookup(
            DOCRED_NER_MAP, F.col("type")[0], F.col("type")[0]
        )
        obj_t = _map_lookup(DOCRED_NER_MAP, F.col("type")[1], F.col("type")[1])
        label = F.col("label")
        mapped = (
            F.when(label.isin(*sorted(DOCRED_DROP)), F.lit(None))
            .when(
                label == "developer",
                F.when(obj_t == "ORG", F.lit("org:developer")),
            )
            .when(
                label == "inception",
                F.when(subj_t == "ORG", F.lit("org:founded")),
            )
            .when(
                label == "member of",
                F.when(
                    subj_t.isin("PER", "PERSON"), F.lit("per:member_of")
                ).otherwise(F.lit("org:members")),
            )
            .otherwise(mapped)
        )
        swap = (
            F.when(label == "developer", F.lit(True))
            .when(label == "inception", F.lit(False))
            .when(label == "member of", ~subj_t.isin("PER", "PERSON"))
            .otherwise(swap)
        )
        # Reference quirk preserved (docred_preprocessor.py:83-91,:234-238):
        # the final type is rebuilt from the PRE-swap local types — the
        # swap applies to entities only — with the adjust_entity_type
        # overrides (obj -> WORK_OF_ART for authored-work relations,
        # subj -> EVENT for conflict); kept only when both types known.
        woa = [
            "author", "composer", "creator", "director", "lyrics by",
            "notable work", "performer", "screenwriter",
        ]
        adj_subj = F.when(label == "conflict", F.lit("EVENT")).otherwise(subj_t)
        adj_obj = F.when(label.isin(*woa), F.lit("WORK_OF_ART")).otherwise(obj_t)
        type_final = F.when(
            subj_t.isNotNull() & obj_t.isNotNull(), F.array(adj_subj, adj_obj)
        ).otherwise(type_final)

    out = (
        df.withColumn("_mapped", mapped)
        .withColumn("_swap", swap)
        .withColumn("_type", type_final)
        .filter(F.col("_mapped").isNotNull())
    )
    out = out.select(
        *[c for c in df.columns if c not in ("label", "entities", "type")],
        F.col("_mapped").alias("label"),
        F.when(
            F.col("_swap"),
            F.array(F.col("entities")[1], F.col("entities")[0]),
        )
        .otherwise(F.col("entities"))
        .alias("entities"),
        F.col("_type").alias("type"),
    )

    if override_entity_types:
        # O11 backfill (get_entity_types_from_relation semantics over
        # the post-swap types): static per-label rules as a map lookup;
        # the four incoming-type-conditional branches as explicit whens;
        # labels outside the chain keep their (possibly swapped)
        # incoming types (reference fall-through).
        labels = sorted(
            {dst for dst, _ in rel_map.values()}
            | {"org:developer", "org:founded", "per:member_of", "org:members"}
        )
        subj_pairs: list[Column] = []
        obj_pairs: list[Column] = []
        for lab in labels:
            if lab in _CONDITIONAL_LABELS:
                continue
            s, o = relation_entity_types(lab)
            if s is not None:
                subj_pairs.extend([F.lit(lab), F.lit(s)])
            if o is not None:
                obj_pairs.extend([F.lit(lab), F.lit(o)])
        label = F.col("label")
        in_subj = F.col("type")[0]
        in_obj = F.col("type")[1]
        static_subj = (
            F.coalesce(F.create_map(*subj_pairs)[label], in_subj)
            if subj_pairs
            else in_subj
        )
        static_obj = (
            F.coalesce(F.create_map(*obj_pairs)[label], in_obj)
            if obj_pairs
            else in_obj
        )
        new_subj = (
            F.when(label == "event:conflict", F.lit("EVENT"))
            .when(label == "loc:country_of_origin", F.lit("LOC"))
            .when(
                label == "per:ethnic_group",
                F.when(in_subj.isin("LOC", "PERSON"), in_subj).otherwise(
                    F.lit("PERSON")
                ),
            )
            .when(label == "org:shareholders", F.lit("ORG"))
            .otherwise(static_subj)
        )
        new_obj = (
            F.when(
                label == "event:conflict",
                F.when(in_obj == "ORG", in_obj).otherwise(F.lit("PERSON")),
            )
            .when(
                label == "loc:country_of_origin",
                # None stays None (add_ner_annotation.py:137-138)
                F.when(
                    in_obj.isNull() | in_obj.isin("MISC", "ORG", "PERSON"),
                    in_obj,
                ).otherwise(F.lit("MISC")),
            )
            .when(label == "per:ethnic_group", F.lit("LOC"))
            .when(
                label == "org:shareholders",
                # the reference compares against the UNNORMALIZED
                # "ORGANIZATION" string, so incoming "ORG" -> PERSON
                # (quirk preserved, add_ner_annotation.py:176-178)
                F.when(in_obj.isin("PERSON", "ORGANIZATION"), in_obj).otherwise(
                    F.lit("PERSON")
                ),
            )
            .otherwise(static_obj)
        )
        out = out.withColumn("type", F.array(new_subj, new_obj))

    return _apply_ner_map(out, NER_MAPS.get(dataset, {}))


def _apply_ner_map(df: DataFrame, ner_map: dict[str, str]) -> DataFrame:
    if not ner_map or "type" not in df.columns:
        return df
    return df.withColumn(
        "type",
        F.transform(
            F.col("type"),
            lambda t: _map_lookup(ner_map, t, t),
        ),
    )


def tacred_to_dfki(raw: DataFrame, merge_location: bool = True) -> DataFrame:
    """Raw TACRED columns -> DFKI-JSONL shape
    (tacred_preprocessor.py:67-95 tacred_converter): exclusive-end
    entities, [subj,obj] types, SUBJ/OBJ grammar, merged labels.
    """
    label = F.col("relation")
    if merge_location:
        label = merge_tacred_locations(label)
    return raw.select(
        F.col("id"),
        F.col("token").alias("tokens"),
        label.alias("label"),
        F.array(F.lit("SUBJ"), F.lit("OBJ")).alias("grammar"),
        F.array(
            F.array(F.col("subj_start").cast("int"), (F.col("subj_end") + 1).cast("int")),
            F.array(F.col("obj_start").cast("int"), (F.col("obj_end") + 1).cast("int")),
        ).alias("entities"),
        F.array(F.col("subj_type"), F.col("obj_type")).alias("type"),
    )
