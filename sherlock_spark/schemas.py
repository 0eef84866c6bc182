"""Spark schemas for the document/annotation data model.

Columnar re-expression of the reference's row-oriented dataclasses
(``sherlock/document.py:9-427``); mapping table in SURVEY.md §1.3.
Mention identity is array position — array order is never changed after
creation (reference relies on index stability, ``document.py:166-168``).
"""

from __future__ import annotations

from pyspark.sql import types as T

TOKEN = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),   # char offset
        T.StructField("end", T.IntegerType(), False),     # char offset, exclusive
        T.StructField("lemma", T.StringType(), True),
        T.StructField("pos", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("dep", T.StringType(), True),
        T.StructField("dep_head", T.IntegerType(), True),
        T.StructField("ent_type", T.StringType(), True),
        T.StructField("ent_dist", T.MapType(T.StringType(), T.IntegerType()), True),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),   # token index
        T.StructField("end", T.IntegerType(), False),     # token index, exclusive
        T.StructField("label", T.StringType(), True),
    ]
)

MENTION = SPAN  # same shape; label = NER type

ENTITY = T.StructType(
    [
        T.StructField("mentions_indices", T.ArrayType(T.IntegerType()), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("ref_ids", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

RELATION = T.StructType(
    [
        T.StructField("head_idx", T.IntegerType(), False),
        T.StructField("tail_idx", T.IntegerType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("logits", T.MapType(T.StringType(), T.DoubleType()), True),
    ]
)

DOCUMENT = T.StructType(
    [
        T.StructField("guid", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(TOKEN), True),
        T.StructField("sents", T.ArrayType(SPAN), True),
        T.StructField("ments", T.ArrayType(MENTION), True),
        T.StructField("ents", T.ArrayType(ENTITY), True),
        T.StructField("rels", T.ArrayType(RELATION), True),
        T.StructField("provenance", T.ArrayType(T.StringType()), True),
    ]
)

# North-rule primary input (BASELINE.json input_hint)
TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Exploded triples table (SURVEY §1.3: rels -> flat output)
TRIPLE = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("head_idx", T.IntegerType(), False),
        T.StructField("tail_idx", T.IntegerType(), False),
        T.StructField("subj_text", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), True),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_text", T.StringType(), False),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("logits", T.MapType(T.StringType(), T.DoubleType()), True),
    ]
)
