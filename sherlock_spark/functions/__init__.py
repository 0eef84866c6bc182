"""Reusable column-level function libraries: dedup, text analysis,
similarity search — the training-data-pipeline operator set that
complements the reference's IE operators at 100 TB scale.
"""
