"""CoNLL-2003 reader as a distributed line-group scan.

Parity target: ``sherlock/dataset_readers/conll_2003.py:107-173``
(SURVEY.md §2.1 S3): sentences are runs of lines delimited by blank
lines or ``-DOCSTART-``; each line is ``token pos chunk ner``; guids are
``{basename}-{n}`` starting at 1; mentions decoded from IOB1 tags with
seqeval semantics, end made exclusive.

Spark shape: ``spark.read.text`` preserves no global order, so we
recover it with ``monotonically_increasing_id`` (valid because
``text`` reads line-ranges in file order within partitions and partition
ids are ordered by file offset), then assign sentence groups with a
running conditional sum window. The window is the only shuffle; at
cluster scale one would split per-file, which this layout preserves.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sherlock_spark.text.spans import get_entities_conll


_MENTS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
            T.StructField("label", T.StringType(), True),
        ]
    )
)


@F.udf(returnType=_MENTS_SCHEMA)
def _iob1_mentions(ner_tags):
    """seqeval-exact IOB1 decode (conll_2003.py:170-172), end exclusive.

    A tiny per-row scalar on short tag arrays; kept as a plain UDF for
    exact parity with the shared pure-Python codec.
    """
    if ner_tags is None:
        return []
    return [
        (start, end + 1, label)
        for label, start, end in get_entities_conll(list(ner_tags))
    ]


def read_conll2003(spark: SparkSession, file_path: str) -> DataFrame:
    """CoNLL file -> document rows (guid, text, tokens, sents, ments)."""
    split = os.path.basename(file_path)

    lines = spark.read.text(file_path).withColumn(
        "line_id", F.monotonically_increasing_id()
    )

    is_break = F.col("value").startswith("-DOCSTART-") | (
        F.trim(F.col("value")) == ""
    )
    window = Window.orderBy("line_id")
    grouped = lines.withColumn(
        "group_id", F.sum(F.when(is_break, 1).otherwise(0)).over(window)
    ).filter(~is_break)

    sentences = (
        grouped.withColumn("parts", F.split(F.col("value"), " "))
        .groupBy("group_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("line_id"), F.col("parts")))
            ).alias("rows")
        )
        .select(
            "group_id",
            F.transform(F.col("rows"), lambda r: r["parts"][0]).alias("words"),
            F.transform(
                F.col("rows"),
                lambda r: F.when(
                    F.size(r["parts"]) > 1, F.element_at(r["parts"], -1)
                ),
            ).alias("ner"),
        )
    )

    # guid index n starts at 1 in file order (conll_2003.py:121,131-136)
    guid_window = Window.orderBy("group_id")
    sentences = sentences.withColumn("n", F.row_number().over(guid_window))

    offsets = F.aggregate(
        F.col("words"),
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

    return sentences.select(
        F.concat(F.lit(split), F.lit("-"), F.col("n")).alias("guid"),
        F.concat_ws(" ", F.col("words")).alias("text"),
        F.transform(
            offsets,
            lambda off, i: F.struct(
                off["start"].alias("start"),
                off["end"].alias("end"),
                off["lemma"].alias("lemma"),
                F.col("ner")[i].alias("ent_type"),
            ),
        ).alias("tokens"),
        F.array(
            F.struct(
                F.lit(0).alias("start"),
                F.size("words").cast("int").alias("end"),
                F.lit(None).cast("string").alias("label"),
            )
        ).alias("sents"),
        _iob1_mentions(F.col("ner")).alias("ments"),
    )


def conll_labels(spark: SparkSession, file_path: str) -> list[str]:
    """NER label set, negative label first (conll_2003.py:182-202)."""
    df = read_conll2003(spark, file_path)
    rows = (
        df.select(F.explode(F.col("tokens.ent_type")).alias("label"))
        .distinct()
        .collect()
    )
    labels = ["O"]
    for row in rows:
        if row.label is not None and row.label != "O":
            labels.append(row.label)
    return labels
