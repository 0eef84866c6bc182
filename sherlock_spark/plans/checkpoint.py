"""Stage checkpointing with per-partition lineage and idempotent resume.

The reference caches converted features to disk keyed by (split, model,
max_len) and reuses them on restart
(``run_binary_relation_clf.py:390-426``); the pipeline analogue
materializes every stage output to a table and skips completed stages on
rerun (north rule: "resumable from checkpoint with per-partition
lineage + metrics").

Storage is parquet here (the sandbox has no Iceberg runtime jars); the
layout mirrors an Iceberg table-per-stage with a JSON lineage sidecar —
swap ``_write``/``_read`` for ``writeTo(...).append()`` on a cluster
with a catalog. Idempotency comes from (a) stage-level completion
markers and (b) key-based dedup on write, so a stage killed mid-write
and rerun produces no duplicates.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.lineage_dir = os.path.join(base_dir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    # -- paths ----------------------------------------------------------

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self.lineage_dir, f"{stage}.json")

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(self._lineage_path(stage))

    # -- stage execution ------------------------------------------------

    def run_stage(
        self,
        stage: str,
        build: Callable[[], DataFrame],
        dedup_keys: Optional[list[str]] = None,
        repartition_by: Optional[str] = None,
    ) -> DataFrame:
        """Run ``build`` unless the stage already completed; materialize
        with per-partition lineage. Killed mid-write -> no lineage file
        -> rerun rebuilds from scratch into a fresh directory (write is
        atomic at stage granularity).
        """
        if self.is_complete(stage):
            return self.read_stage(stage)

        started = time.time()
        df = build()
        if dedup_keys:
            df = df.dropDuplicates(dedup_keys)
        path = self.stage_path(stage)
        tmp_path = path + "._tmp"
        if os.path.exists(tmp_path):
            shutil.rmtree(tmp_path)

        writer = df
        if repartition_by:
            writer = df.repartition(F.col(repartition_by))
        writer.write.mode("overwrite").parquet(tmp_path)

        # per-partition lineage from the files actually written
        written = self.spark.read.parquet(tmp_path)
        partition_counts = (
            written.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp_path, path)

        lineage = {
            "stage": stage,
            "n_rows": int(sum(row["count"] for row in partition_counts)),
            "n_partitions": len(partition_counts),
            "partition_rows": {
                str(row["partition_id"]): int(row["count"])
                for row in partition_counts
            },
            "dedup_keys": dedup_keys,
            "wall_seconds": round(time.time() - started, 3),
        }
        tmp_lineage = self._lineage_path(stage) + ".tmp"
        with open(tmp_lineage, "w") as handle:
            json.dump(lineage, handle, indent=2)
        os.rename(tmp_lineage, self._lineage_path(stage))
        return self.read_stage(stage)

    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self.stage_path(stage))

    def lineage(self, stage: str) -> dict:
        with open(self._lineage_path(stage)) as handle:
            return json.load(handle)

    def all_lineage(self) -> list[dict]:
        records = []
        for name in sorted(os.listdir(self.lineage_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.lineage_dir, name)) as handle:
                    records.append(json.load(handle))
        return records

    def invalidate(self, stage: str) -> None:
        if os.path.exists(self._lineage_path(stage)):
            os.remove(self._lineage_path(stage))
        path = self.stage_path(stage)
        if os.path.exists(path):
            shutil.rmtree(path)
