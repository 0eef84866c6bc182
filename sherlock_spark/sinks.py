"""Sinks beyond the checkpointed parquet tables (SURVEY.md §2.5).

- K2: predictions JSONL ``{id, label_true, label_pred}``
  (``run_binary_relation_clf.py:900-916``).
- K5: brat visualization dicts (``sherlock/microscope/conversion/
  brat.py:57-111`` produces {text, entities:[[id,label,[[s,e]]]...],
  relations:[[id,label,[[role,ent_id]...]]...]}) — derived here from a
  document's mentions/triples with char offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_predictions_jsonl(
    pred: DataFrame, path: str, id_col: str = "id",
    true_col: str = "label_true", pred_col: str = "label_pred",
) -> None:
    pred.select(
        F.col(id_col).alias("id"),
        F.col(true_col).alias("label_true"),
        F.col(pred_col).alias("label_pred"),
    ).write.mode("overwrite").json(path)


def to_brat(document_row) -> dict:
    """One annotated document row (text, tokens with char offsets,
    ments, rels) -> a brat-style dict. Driver-side convenience for
    visualization; not a distributed path.
    """
    tokens = document_row["tokens"]
    entities = []
    for idx, ment in enumerate(document_row["ments"] or []):
        char_start = tokens[ment["start"]]["start"]
        char_end = tokens[ment["end"] - 1]["end"]
        entities.append([f"T{idx + 1}", ment["label"], [[char_start, char_end]]])
    relations = []
    for idx, rel in enumerate(document_row["rels"] or []):
        relations.append(
            [
                f"R{idx + 1}",
                rel["label"],
                [["head", f"T{rel['head_idx'] + 1}"], ["tail", f"T{rel['tail_idx'] + 1}"]],
            ]
        )
    return {
        "text": document_row["text"],
        "entities": entities,
        "relations": relations,
    }
