"""Serialized-Document JSONL source (the reference's pipeline I/O form).

Parity: ``scripts/predict_documents.py:30-47`` (S4 in SURVEY.md §2.1):
read (optionally gzipped) JSONL of serialized Documents; for tokens
without ``ent_type``, fill it by majority vote over the per-model
``ent_dist`` histogram; when ``ments`` is missing or empty, derive it
from the per-token BIO tags (allennlp-exact decode, exclusive ends,
sorted by start).

Spark shape: ``spark.read.json`` (gzip transparent) with the explicit
Document schema — no inference pass over the data — then one vectorized
pandas UDF for the vote+decode (per-token dict histograms are genuinely
row-local Python semantics).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sherlock_spark.schemas import DOCUMENT
from sherlock_spark.text.ensemble import compute_majority_tag
from sherlock_spark.text.spans import bio_tags_to_spans, spans_to_exclusive_sorted

_RESULT = T.StructType(
    [
        T.StructField("ent_types", T.ArrayType(T.StringType())),
        T.StructField(
            "ments",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType()),
                        T.StructField("end", T.IntegerType()),
                        T.StructField("label", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(_RESULT)
def _vote_and_decode(
    batches: Iterator[tuple[pd.Series, pd.Series]]
) -> Iterator[pd.DataFrame]:
    """(tokens, ments) -> (resolved ent_types, ments filled from BIO
    when absent). One vectorized pass per Arrow batch.
    """
    for tokens_s, ments_s in batches:
        ent_types_col = []
        ments_col = []
        for i in range(len(tokens_s)):
            tokens = tokens_s.iloc[i]
            labels = []
            for token in tokens:
                ent_type = token["ent_type"]
                if not ent_type:
                    dist = token["ent_dist"] or {}
                    ent_type, _prob = compute_majority_tag(dict(dist))
                labels.append(ent_type)
            ent_types_col.append(labels)
            existing = ments_s.iloc[i]
            if existing is not None and len(existing) > 0:
                ments_col.append(
                    [(int(m["start"]), int(m["end"]), m["label"]) for m in existing]
                )
            else:
                spans = spans_to_exclusive_sorted(
                    bio_tags_to_spans([tag or "O" for tag in labels])
                )
                ments_col.append(
                    [(s["start"], s["end"], s["label"]) for s in spans]
                )
        yield pd.DataFrame({"ent_types": ent_types_col, "ments": ments_col})


def read_document_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL of serialized Documents -> document rows with resolved
    ent_type and ments (majority vote + BIO decode where needed).
    """
    raw = spark.read.schema(DOCUMENT).json(path)
    resolved = raw.withColumn(
        "resolved", _vote_and_decode(F.col("tokens"), F.col("ments"))
    )
    return resolved.select(
        "guid",
        "text",
        F.transform(
            F.col("tokens"),
            lambda token, i: token.withField(
                "ent_type", F.col("resolved.ent_types")[i]
            ),
        ).alias("tokens"),
        "sents",
        F.col("resolved.ments").alias("ments"),
        "ents",
        "rels",
    )


def write_document_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """K1 sink: annotated documents as (gzipped) JSONL, dedup by guid
    (``predict_documents.py:76-87``).
    """
    df.dropDuplicates(["guid"]).write.mode("overwrite").option(
        "compression", compression
    ).json(path)
