"""Round-4 seam tests: stale-bundle detection, the optional-import
real-model path, and dedup_model_inputs memory discipline."""

from __future__ import annotations

import time

import pytest

from sherlock_spark.model_stub import FIXTURE_RC_LABELS


def test_distribute_pretrained_retrained_in_place_raises(spark, tmp_path):
    """A model dir RETRAINED IN PLACE (same path, new content) must not
    short-circuit to the stale shipped bundle — executors resolve
    SparkFiles by name and would silently serve the first-shipped
    weights. The content digest makes this loud, AND the raise happens
    BEFORE sc.addFile: mutating an already-registered path breaks
    Spark's own dependency fetch for every later task ("exists and does
    not match contents", observed empirically), so the prior
    registration is simulated registry-side here instead of poisoning
    the shared test session with a real addFile + mutation."""
    import os

    from sherlock_spark.operators.features import (
        _DISTRIBUTED,
        _dir_digest,
        distribute_pretrained,
        save_rc_pretrained_dir,
    )

    model_dir = tmp_path / "rc_retrain_model"
    save_rc_pretrained_dir(str(model_dir), FIXTURE_RC_LABELS)
    norm = os.path.abspath(str(model_dir))

    key = (spark.sparkContext.applicationId, "rc_retrain_model")
    _DISTRIBUTED[key] = (norm, _dir_digest(norm))
    try:
        # unchanged content: benign short-circuit, addFile never reached
        assert (
            distribute_pretrained(spark, str(model_dir))
            == "rc_retrain_model"
        )

        # retrain in place: rewrite the vocab (clock bumped so the
        # stat-based digest must move even at coarse mtime resolution)
        time.sleep(0.01)
        save_rc_pretrained_dir(str(model_dir), ["no_relation", "per:other"])
        with pytest.raises(ValueError, match="content has changed"):
            distribute_pretrained(spark, str(model_dir))
        # the raise happened driver-side, before sc.addFile — session
        # alive and the poisonous registration never reached Spark
        assert spark.range(10).count() == 10
    finally:
        _DISTRIBUTED.pop(key, None)
