"""Checkpointed pipeline plans (SURVEY.md §3.2, north-rule resume)."""

from sherlock_spark.plans.checkpoint import CheckpointManager
from sherlock_spark.plans.pipeline import run_kg_pipeline

__all__ = ["CheckpointManager", "run_kg_pipeline"]
