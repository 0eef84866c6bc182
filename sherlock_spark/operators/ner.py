"""Tokenization + NER tagging + span decoding stages.

Reference lifecycle (SURVEY.md §3.1): per-turn text -> word tokens with
char offsets -> BIO tags from the token-classification model -> mention
spans. Spark shape: tokenization and offsets are pure Catalyst
expressions; the model forward is an iterator pandas UDF with an
executor-global singleton model (one load per Python worker, never per
row — reference one-time-load analogue, ``spacy.py:17,24-55``); span
decode is a vectorized pandas UDF over the shared pure codec.
"""

from __future__ import annotations

import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from sherlock_spark.model_stub import StubNerModel
from sherlock_spark.text.spans import bio_tags_to_spans, spans_to_exclusive_sorted

_MODEL_CACHE: dict[int, StubNerModel] = {}

# explicit DataType (not DDL string): keeps UDF construction independent
# of an active SparkSession at import time
MENTS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("label", T.StringType()),
        ]
    )
)


def _executor_model(cache_key: str, broadcast) -> StubNerModel:
    """Lazy per-worker singleton; survives tasks because
    ``spark.python.worker.reuse`` is on (session.py). The key is the
    broadcast id captured driver-side (the worker-side Broadcast object
    exposes only ``value``).
    """
    model = _MODEL_CACHE.get(cache_key)
    if model is None:
        model = StubNerModel(broadcast.value)
        _MODEL_CACHE[cache_key] = model
    return model


def words_column(text: Column = None) -> Column:
    """Whitespace word split. The transcript invariant is that ``text``
    is the space-join of its tokens (tacred.py:196), so a literal
    single-space split reconstructs them exactly.
    """
    return F.split(text if text is not None else F.col("text"), " ")


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``words`` and offset-bearing ``tokens`` columns — the
    tokenizer stage (tacred.py:196-231), all JVM-side.
    """
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
    return df.withColumn("words", words_column(F.col(text_col))).withColumn(
        "tokens", offsets
    )


def ner_tags_udf(spark: SparkSession, lexicon: dict[str, str] | None = None):
    """Iterator pandas UDF: array<string> words -> array<string> BIO tags.

    The model argmax decode happens inside ``predict_tags`` — one
    vectorized call per Arrow batch (reference batching:
    ``transformers_annotator.py:60-63,93-108``).
    """
    broadcast = spark.sparkContext.broadcast(
        StubNerModel(lexicon).lexicon if lexicon is None else lexicon
    )
    cache_key = uuid.uuid4().hex  # one cache slot per UDF instance

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tag(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = _executor_model(cache_key, broadcast)
        for series in batches:
            token_lists = [list(words) for words in series]
            yield pd.Series(model.predict_tags(token_lists))

    return tag


@F.pandas_udf(MENTS_TYPE)
def bio_to_mentions(tag_series: pd.Series) -> pd.Series:
    """BIO tags -> mention spans, end exclusive, sorted by start —
    allennlp-exact semantics (utils.py:128-167) via the shared codec.
    """
    out = []
    for tags in tag_series:
        spans = spans_to_exclusive_sorted(bio_tags_to_spans(list(tags)))
        out.append(
            [(span["start"], span["end"], span["label"]) for span in spans]
        )
    return pd.Series(out)


def annotate_mentions(
    spark: SparkSession,
    transcripts: DataFrame,
    lexicon: dict[str, str] | None = None,
) -> DataFrame:
    """Transcript turns -> turns + words + tokens + bio + ments.

    One narrow stage: no shuffle is introduced; rows stay wherever the
    scan/repartition put them (conv_id clustering preserved).
    """
    tagger = ner_tags_udf(spark, lexicon)
    df = with_tokens(transcripts)
    df = df.withColumn("bio", tagger(F.col("words")))
    return df.withColumn("ments", bio_to_mentions(F.col("bio")))
