"""Model-ensemble majority voting over per-token NER tag histograms.

Parity: ``sherlock/dataset_preprocessors/utils.py:170-212``
(``_compute_majority_tag``) — per token, the most frequent tag in
``ent_dist`` wins; an uncertain ``O`` (prob < threshold) falls back to
the runner-up; a confident ``O`` still yields to a gazetteer tag when
one voted. Tie-breaking is stable with respect to histogram order,
matching Python's stable sort over dict items.
"""

from __future__ import annotations

from typing import Optional

TAG_O = "O"

GAZETTEER_TAGS = [
    "CAUSE_OF_DEATH",
    "CHARGE",
    "DEGREE",
    "DISASTER_TYPE",
    "FINANCIAL_EVENT",
    "INDUSTRY",
    "POSITION",
    "URL",
]


def _normalize_tag(tag: str) -> str:
    if tag.startswith(("B-", "I-", "E-", "S-", "L-", "U-")):
        return tag[2:]
    return tag


def compute_majority_tag(
    ent_dist: dict[str, int],
    exclude_tags: Optional[list[str]] = None,
    prob_threshold: float = 0.8,
) -> tuple[Optional[str], Optional[float]]:
    exclude = set(exclude_tags or [])
    tag_sum = sum(ent_dist.values())
    if tag_sum <= 0:
        return None, None
    ranked = sorted(ent_dist.items(), key=lambda item: item[1], reverse=True)
    ranked = [item for item in ranked if item[0] not in exclude]
    if not ranked:
        return None, None
    majority_tag, majority_count = ranked[0]
    prob = majority_count / tag_sum
    if majority_tag == TAG_O:
        if prob < prob_threshold:
            majority_tag, majority_count = ranked[1]
            prob = majority_count / tag_sum
        else:
            gazetteer = [
                item for item in ranked if _normalize_tag(item[0]) in GAZETTEER_TAGS
            ]
            if gazetteer:
                majority_tag = gazetteer[0][0]
                prob = 1 / tag_sum
    return majority_tag, prob
