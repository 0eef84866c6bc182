"""TACRED dataset reader as native Spark column operations.

Parity target: ``sherlock/dataset_readers/tacred.py:37-346`` (see
SURVEY.md §2.1 S1). The reference builds one ``Document`` per example
with PTB-normalized tokens, char offsets from a cumulative whitespace
scan, one sentence span, subj/obj mentions and one gold relation,
skipping examples whose spans exceed the token list. All of that is
expressed here as Catalyst-optimizable expressions — no Python runs per
row, the JSON scan prunes to the referenced columns, and the
offset scan is a higher-order ``aggregate`` over the token array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sherlock_spark.text.ptb import PTB_TOKEN_MAP

# tacred.py:18-32 — inverse predicates for add_inverse_relations
INVERSE_RELATIONS: dict[str, str] = {
    "per:alternate_names": "per:alternate_names",
    "per:children": "per:parents",
    "per:parents": "per:children",
    "per:siblings": "per:siblings",
    "per:spouse": "per:spouse",
    "per:other_family": "per:other_family",
    "org:alternate_names": "org:alternate_names",
    "org:member_of": "org:members",
    "org:members": "org:member_of",
    "org:parents": "org:subsidiaries",
    "org:subsidiaries": "org:parents",
}

NEGATIVE_LABEL_RE = "no_relation"


def ptb_convert(tokens: Column) -> Column:
    """PTB bracket unescape (tacred.py:179-189) as a map lookup."""
    pairs: list[Column] = []
    for key, value in PTB_TOKEN_MAP.items():
        pairs.extend([F.lit(key), F.lit(value)])
    ptb_map = F.create_map(*pairs)
    return F.transform(
        tokens, lambda token: F.coalesce(ptb_map[F.lower(token)], token)
    )


def token_offsets(tokens: Column) -> Column:
    """Char offsets from the cumulative whitespace scan
    (tacred.py:214-231): start_{i+1} = end_i + 1.
    Pure Catalyst ``aggregate`` — no shuffle, no Python.
    """
    return F.aggregate(
        tokens,
        F.struct(
            F.lit(0).alias("pos"),
            F.expr(
                "cast(array() as array<struct<start:int,end:int,lemma:string>>)"
            ).alias("offs"),
        ),
        lambda acc, token: F.struct(
            (acc["pos"] + F.length(token) + F.lit(1)).alias("pos"),
            F.array_append(
                acc["offs"],
                F.struct(
                    acc["pos"].cast("int").alias("start"),
                    (acc["pos"] + F.length(token)).cast("int").alias("end"),
                    token.alias("lemma"),
                ),
            ).alias("offs"),
        ),
        lambda acc: acc["offs"],
    )


def bio_with_argument_types(
    raw_tags: Column,
    subj_start: Column,
    subj_end_incl: Column,
    obj_start: Column,
    obj_end_incl: Column,
    subj_type: Column,
    obj_type: Column,
) -> Column:
    """``_ner_as_bio(insert_argument_types=True)`` (tacred.py:317-346):
    overwrite argument spans with their types, then raw->BIO where ``B-``
    marks a type change and ``I-`` a repetition. The stateful prefix
    decision is an ``aggregate`` carrying the previous tag.
    """
    with_args = F.transform(
        raw_tags,
        lambda tag, i: F.when(
            (i >= subj_start) & (i <= subj_end_incl), subj_type
        )
        .when((i >= obj_start) & (i <= obj_end_incl), obj_type)
        .otherwise(tag),
    )
    return F.aggregate(
        with_args,
        F.struct(
            F.lit("").alias("prev"),
            F.expr("cast(array() as array<string>)").alias("out"),
        ),
        lambda acc, tag: F.struct(
            F.when(tag == "O", F.lit("")).otherwise(tag).alias("prev"),
            F.array_append(
                acc["out"],
                F.when(tag == "O", tag).otherwise(
                    F.concat(
                        F.when(tag == acc["prev"], F.lit("I-")).otherwise(F.lit("B-")),
                        tag,
                    )
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )


def read_tacred(
    spark: SparkSession,
    file_path: str,
    convert_ptb_tokens: bool = True,
    add_inverse_relations: bool = False,
    max_instances: int | None = None,
) -> DataFrame:
    """TACRED json array -> document rows.

    Output columns: guid, text, tokens (struct incl. char offsets, pos,
    dep, ent_type BIO), sents, ments (subj, obj), rels (gold, and the
    inverse when requested — unknown predicates fall back to
    ``no_relation``, tacred.py:245-253).
    """
    raw = spark.read.option("multiLine", "true").json(file_path)

    tokens = ptb_convert(F.col("token")) if convert_ptb_tokens else F.col("token")
    df = raw.select(
        F.col("id").alias("guid"),
        tokens.alias("words"),
        F.col("subj_start").cast("int"),
        (F.col("subj_end") + 1).cast("int").alias("subj_end_ex"),
        F.col("obj_start").cast("int"),
        (F.col("obj_end") + 1).cast("int").alias("obj_end_ex"),
        F.col("subj_type"),
        F.col("obj_type"),
        F.col("relation"),
        F.col("stanford_pos").alias("pos_tags"),
        F.col("stanford_deprel").alias("dep_tags"),
        F.col("stanford_head").alias("dep_heads"),
        F.col("stanford_ner").alias("raw_ner"),
    )

    # drop out-of-range examples (tacred.py:201-202)
    df = df.filter(
        (F.col("subj_end_ex") <= F.size("words"))
        & (F.col("obj_end_ex") <= F.size("words"))
    )

    bio = bio_with_argument_types(
        F.col("raw_ner"),
        F.col("subj_start"),
        F.col("subj_end_ex") - 1,
        F.col("obj_start"),
        F.col("obj_end_ex") - 1,
        F.col("subj_type"),
        F.col("obj_type"),
    )

    df = df.withColumn("offs", token_offsets(F.col("words"))).withColumn(
        "bio", F.when(F.col("raw_ner").isNotNull(), bio)
    )

    token_structs = F.transform(
        F.col("offs"),
        lambda off, i: F.struct(
            off["start"].alias("start"),
            off["end"].alias("end"),
            off["lemma"].alias("lemma"),
            F.col("pos_tags")[i].alias("pos"),
            F.col("pos_tags")[i].alias("tag"),
            F.col("dep_tags")[i].alias("dep"),
            F.col("dep_heads")[i].cast("int").alias("dep_head"),
            F.col("bio")[i].alias("ent_type"),
        ),
    )

    gold_rel = F.struct(
        F.lit(0).alias("head_idx"),
        F.lit(1).alias("tail_idx"),
        F.col("relation").alias("label"),
    )
    rels = F.array(gold_rel)
    if add_inverse_relations:
        inv_pairs: list[Column] = []
        for key, value in INVERSE_RELATIONS.items():
            inv_pairs.extend([F.lit(key), F.lit(value)])
        inv_map = F.create_map(*inv_pairs)
        inverse_rel = F.struct(
            F.lit(1).alias("head_idx"),
            F.lit(0).alias("tail_idx"),
            F.coalesce(inv_map[F.col("relation")], F.lit(NEGATIVE_LABEL_RE)).alias(
                "label"
            ),
        )
        rels = F.array(gold_rel, inverse_rel)

    out = df.select(
        "guid",
        F.concat_ws(" ", F.col("words")).alias("text"),
        token_structs.alias("tokens"),
        F.array(
            F.struct(
                F.lit(0).alias("start"),
                F.size("words").cast("int").alias("end"),
                F.lit(None).cast("string").alias("label"),
            )
        ).alias("sents"),
        F.array(
            F.struct(
                F.col("subj_start").alias("start"),
                F.col("subj_end_ex").alias("end"),
                F.col("subj_type").alias("label"),
            ),
            F.struct(
                F.col("obj_start").alias("start"),
                F.col("obj_end_ex").alias("end"),
                F.col("obj_type").alias("label"),
            ),
        ).alias("ments"),
        rels.alias("rels"),
    )
    if max_instances is not None:
        out = out.limit(max_instances)
    return out


def tacred_labels(spark: SparkSession, file_path: str, task: str = "binary_rc") -> list[str]:
    """Label vocabulary scan (tacred.py:275-314): distinct labels with the
    negative label forced to index 0; NER labels expanded to B-/I- pairs.
    Driver-side once, then broadcast by callers.
    """
    raw = spark.read.option("multiLine", "true").json(file_path)
    if task == "binary_rc":
        rows = raw.select("relation").distinct().collect()
        labels = [NEGATIVE_LABEL_RE]
        for row in rows:
            if row.relation != NEGATIVE_LABEL_RE:
                labels.append(row.relation)
        return labels
    # NER: tags ∪ argument types, B-/I- expanded, negative "O" first
    rows = (
        raw.select(
            F.explode(
                F.array_union(
                    F.col("stanford_ner"),
                    F.array(F.col("subj_type"), F.col("obj_type")),
                )
            ).alias("label")
        )
        .distinct()
        .collect()
    )
    labels = ["O"]
    for row in rows:
        if row.label != "O":
            labels.extend(["B-" + row.label, "I-" + row.label])
    return labels


def tacred_additional_tokens(spark: SparkSession, file_path: str) -> list[str]:
    """Marker-token scan (tacred.py:139-159): distinct [HEAD=T]/[TAIL=T]
    plus the four fixed boundary markers, sorted.
    """
    raw = spark.read.option("multiLine", "true").json(file_path)
    rows = (
        raw.select(
            F.explode(
                F.array(
                    F.concat(F.lit("[HEAD="), F.upper("subj_type"), F.lit("]")),
                    F.concat(F.lit("[TAIL="), F.upper("obj_type"), F.lit("]")),
                )
            ).alias("token")
        )
        .distinct()
        .collect()
    )
    tokens = {"[HEAD_START]", "[HEAD_END]", "[TAIL_START]", "[TAIL_END]"}
    tokens.update(row.token for row in rows)
    return sorted(tokens)
