"""TACRED DFKI-JSONL dataset reader (S2) as native Spark column ops.

Parity target: ``sherlock/dataset_readers/dfki_tacred_jsonl.py:206-270``
— the reference's batch-prediction input format
(``scripts/predict_documents.py:145``). One JSON object per line with

    id:       document id
    tokens:   list of token strings
    label:    relation label
    entities: [[head_start, head_end], [tail_start, tail_end]]
              (token offsets, END EXCLUSIVE — unlike original TACRED's
              inclusive subj_end/obj_end)
    type:     [subj_type, obj_type]
    grammar:  [SUBJ-role, OBJ-role] (carried through, not interpreted)
    stanford_ner/pos/deprel/head: optional per-token annotations (the
              docstring at ``dfki_tacred_jsonl.py:49-53`` names them
              ner/pos/dep_rel/dep_head but the code reads the
              stanford_* keys, ``dfki_tacred_jsonl.py:218-224`` — code
              wins)

Shares the S1 reader core (PTB map, offset scan, BIO argument-type
retag) — the readers differ only in framing (JSONL vs array) and span
convention (exclusive vs inclusive ends), exactly like the reference
pair. Out-of-range examples are dropped
(``dfki_tacred_jsonl.py:214-215``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sherlock_spark.sources.tacred import (
    INVERSE_RELATIONS,
    NEGATIVE_LABEL_RE,
    bio_with_argument_types,
    ptb_convert,
    token_offsets,
)


def read_dfki_jsonl(
    spark: SparkSession,
    file_path: str,
    convert_ptb_tokens: bool = True,
    add_inverse_relations: bool = False,
    max_instances: int | None = None,
) -> DataFrame:
    """DFKI JSONL -> document rows, same output schema as
    ``read_tacred`` (guid, text, tokens, sents, ments, rels).
    """
    raw = spark.read.json(file_path)  # line-delimited (JSONL) native

    tokens = ptb_convert(F.col("tokens")) if convert_ptb_tokens else F.col("tokens")
    df = raw.select(
        F.col("id").alias("guid"),
        tokens.alias("words"),
        F.col("entities")[0][0].cast("int").alias("subj_start"),
        F.col("entities")[0][1].cast("int").alias("subj_end_ex"),
        F.col("entities")[1][0].cast("int").alias("obj_start"),
        F.col("entities")[1][1].cast("int").alias("obj_end_ex"),
        F.col("type")[0].alias("subj_type"),
        F.col("type")[1].alias("obj_type"),
        F.col("label").alias("relation"),
        *(
            [F.col("stanford_pos").alias("pos_tags")]
            if "stanford_pos" in raw.columns
            else [F.lit(None).cast("array<string>").alias("pos_tags")]
        ),
        *(
            [F.col("stanford_deprel").alias("dep_tags")]
            if "stanford_deprel" in raw.columns
            else [F.lit(None).cast("array<string>").alias("dep_tags")]
        ),
        *(
            [F.col("stanford_head").alias("dep_heads")]
            if "stanford_head" in raw.columns
            else [F.lit(None).cast("array<int>").alias("dep_heads")]
        ),
        *(
            [F.col("stanford_ner").alias("raw_ner")]
            if "stanford_ner" in raw.columns
            else [F.lit(None).cast("array<string>").alias("raw_ner")]
        ),
    )

    # drop out-of-range examples (dfki_tacred_jsonl.py:214-215)
    df = df.filter(
        (F.col("subj_end_ex") <= F.size("words"))
        & (F.col("obj_end_ex") <= F.size("words"))
    )

    # BIO retag with argument types over EXCLUSIVE spans
    # (dfki_tacred_jsonl.py:333-361 with use_dfki_jsonl_format=True)
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


def dfki_labels(spark: SparkSession, file_path: str, task: str = "binary_rc") -> list[str]:
    """Label vocabulary scan over the JSONL split — same invariants as
    the S1 scan (negative label at index 0; NER labels B-/I- expanded,
    ``dfki_tacred_jsonl.py:290-331``).
    """
    raw = spark.read.json(file_path)
    if task == "binary_rc":
        rows = raw.select(F.col("label").alias("relation")).distinct().collect()
        labels = [NEGATIVE_LABEL_RE]
        for row in rows:
            if row.relation != NEGATIVE_LABEL_RE:
                labels.append(row.relation)
        return labels
    ner_part = (
        F.col("stanford_ner")
        if "stanford_ner" in raw.columns
        else F.expr("cast(array() as array<string>)")
    )
    rows = (
        raw.select(
            F.explode(
                F.array_union(
                    ner_part, F.array(F.col("type")[0], F.col("type")[1])
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
