"""sherlock_spark — a PySpark-native knowledge-graph-construction engine.

A from-scratch, Spark-first reimplementation of the data-processing
capabilities of DFKI-NLP/sherlock (information extraction: tokenize ->
NER -> mention-pair relation classification -> entity linking ->
canonicalization), re-expressed as DataFrame transformations over
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout
------
- ``text/``       pure-Python, exactly-tested semantic core (tokenizers,
                  BIO span codecs, entity-marking strategies). These are
                  the only pieces shared between Spark UDFs and tests.
- ``sources/``    readers: transcript synthesis, TACRED json, CoNLL-2003,
                  serialized-Document JSONL.
- ``operators/``  the Spark pipeline stages: NER, pair enumeration + RC,
                  entity linking, connected-components canonicalization,
                  dedup, similarity search, text analysis.
- ``functions/``  reusable column expressions (offsets, n-grams, hashes).
- ``plans/``      checkpoint / lineage / resume of the extract -> link ->
                  canonicalize -> materialize DAG.
- ``streaming/``  Structured Streaming variant of the extraction stage.

Reference parity is documented per-function with ``file:line`` citations
into the reference repo (see SURVEY.md).
"""

__version__ = "0.1.0"
