"""Property-based sweep of the BIO/IOB1 span codecs (hypothesis).

The codecs must be semantics-exact vs allennlp/seqeval (SURVEY.md §5.3);
beyond the existing adversarial goldens these properties pin:
- encode(spans) -> decode round-trips for arbitrary valid span layouts;
- decode is total over arbitrary tag soup (never crashes, output is
  well-formed: sorted, exclusive, in-range);
- BIO and IOB1 agree on sequences where both schemes are unambiguous
  (no adjacent same-type chunks).

Pure Python — no SparkSession involved.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from sherlock_spark.text.spans import (
    bio_tags_to_spans,
    get_entities_conll,
    iob1_tags_to_spans,
    spans_to_exclusive_sorted,
    to_bioul,
)

TYPES = ["PER", "ORG", "LOC"]


@st.composite
def span_layouts(draw):
    """Non-overlapping, non-adjacent-same-type typed spans over n tokens."""
    n = draw(st.integers(min_value=1, max_value=24))
    spans = []
    pos = 0
    prev_type = None
    while pos < n:
        gap = draw(st.integers(min_value=0, max_value=3))
        start = pos + gap
        if start >= n:
            break
        length = draw(st.integers(min_value=1, max_value=min(4, n - start)))
        label = draw(st.sampled_from(TYPES))
        if gap == 0 and prev_type == label and spans:
            label = TYPES[(TYPES.index(label) + 1) % len(TYPES)]
        spans.append((start, start + length, label))
        prev_type = label
        pos = start + length
    return n, spans


def encode_bio(n, spans):
    tags = ["O"] * n
    for start, end, label in spans:
        tags[start] = f"B-{label}"
        for i in range(start + 1, end):
            tags[i] = f"I-{label}"
    return tags


@settings(max_examples=300, deadline=None)
@given(span_layouts())
def test_bio_round_trip(layout):
    n, spans = layout
    tags = encode_bio(n, spans)
    decoded = spans_to_exclusive_sorted(bio_tags_to_spans(tags))
    assert [(s["start"], s["end"], s["label"]) for s in decoded] == spans


@settings(max_examples=300, deadline=None)
@given(span_layouts())
def test_seqeval_agrees_on_unambiguous_bio(layout):
    n, spans = layout
    tags = encode_bio(n, spans)
    seqeval = sorted(
        (start, end + 1, label) for label, start, end in get_entities_conll(tags)
    )
    assert seqeval == spans


TAG_SOUP = st.lists(
    st.sampled_from(
        ["O"] + [f"{p}-{t}" for p in "BI" for t in TYPES]
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=500, deadline=None)
@given(TAG_SOUP)
def test_decode_total_and_well_formed(tags):
    decoded = spans_to_exclusive_sorted(bio_tags_to_spans(tags))
    prev_start = -1
    for span in decoded:
        assert 0 <= span["start"] < span["end"] <= len(tags)
        assert span["start"] >= prev_start  # sorted
        prev_start = span["start"]
        # every decoded span's tokens carry its type
        for i in range(span["start"], span["end"]):
            assert tags[i].endswith(span["label"])


@settings(max_examples=300, deadline=None)
@given(TAG_SOUP)
def test_iob1_total_and_bioul_recode_consistent(tags):
    iob1 = spans_to_exclusive_sorted(iob1_tags_to_spans(tags))
    for span in iob1:
        assert 0 <= span["start"] < span["end"] <= len(tags)
    # IOB1 -> BIOUL recode must preserve the chunk set (allennlp
    # semantics: BIOUL spans decode to the same (start,end,label)s)
    try:
        bioul = to_bioul(list(tags), encoding="IOB1")
    except Exception:
        return  # invalid-for-recode sequences may raise; decode may not
    starts = {(s["start"], s["end"], s["label"]) for s in iob1}
    # reconstruct spans from BIOUL directly
    out = set()
    i = 0
    while i < len(bioul):
        tag = bioul[i]
        if tag.startswith("U-"):
            out.add((i, i + 1, tag[2:]))
        elif tag.startswith("B-"):
            j = i + 1
            while j < len(bioul) and bioul[j].startswith("I-"):
                j += 1
            assert j < len(bioul) and bioul[j].startswith("L-")
            out.add((i, j + 1, tag[2:]))
            i = j
        i += 1
    assert out == starts
