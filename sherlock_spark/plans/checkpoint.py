"""Stage checkpointing with per-partition lineage and idempotent resume.

The reference caches converted features to disk keyed by (split, model,
max_len) and reuses them on restart
(``run_binary_relation_clf.py:390-426``); the pipeline analogue
materializes every stage output to a table and skips completed stages on
rerun (north rule: "resumable from checkpoint with per-partition
lineage + metrics").

Storage: Iceberg WHEN a catalog is configured and its runtime jar is on
the classpath (``iceberg_catalog`` auto-detects; stage tables become
``<catalog>.<namespace>.<stage>`` with ``MERGE INTO`` idempotent
upserts and completion recorded as a table property — atomic at commit
granularity); parquet otherwise (this sandbox ships no Iceberg jars).
The parquet layout mirrors the Iceberg table-per-stage with a JSON
lineage sidecar. Idempotency on both paths comes from (a) stage-level
completion markers and (b) key-based dedup on write (anti-join /
``MERGE ... WHEN NOT MATCHED``), so a stage killed mid-write and rerun
produces no duplicates.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_catalog(spark: SparkSession) -> Optional[str]:
    """Name of a usable Iceberg catalog, or None.

    A catalog is usable when (1) some ``spark.sql.catalog.<name>`` conf
    points at an Iceberg catalog implementation AND (2) that class is
    actually loadable (a configured catalog without the runtime jar
    would fail at first use, so detection verifies the classpath, not
    just the conf). On this sandbox there is no Iceberg jar, so the
    checkpoint manager always takes the parquet path; on a real cluster
    with ``--packages org.apache.iceberg:iceberg-spark-runtime-...``
    the SAME job routes stages through Iceberg with zero code change.
    """
    for row in spark.sql("SET").collect():
        match = re.fullmatch(r"spark\.sql\.catalog\.([^.]+)", row["key"])
        if match and "iceberg" in str(row["value"]).lower():
            try:
                spark._jvm.java.lang.Class.forName(str(row["value"]))
            except Exception:
                continue  # configured but jar absent: not usable
            return match.group(1)
    return None


class CheckpointManager:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        catalog: Optional[str] = None,
        namespace: str = "sherlock_ckpt",
    ) -> None:
        """``catalog``: an Iceberg catalog name to route stage tables
        through (``<catalog>.<namespace>.<stage>``); auto-detected via
        ``iceberg_catalog`` when omitted — parquet under ``base_dir``
        when none is usable. Lineage sidecars stay on the local path on
        both storage paths (they are driver-side bookkeeping)."""
        self.spark = spark
        self.base_dir = base_dir
        self.catalog = catalog if catalog is not None else iceberg_catalog(spark)
        self.namespace = namespace
        self.lineage_dir = os.path.join(base_dir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)
        if self.catalog is not None:
            spark.sql(
                f"CREATE NAMESPACE IF NOT EXISTS "
                f"{self.catalog}.{self.namespace}"
            )

    # -- paths ----------------------------------------------------------

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def stage_table(self, stage: str) -> str:
        return f"{self.catalog}.{self.namespace}.{stage}"

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

        if self.catalog is not None:
            return self._run_stage_iceberg(
                stage, df, dedup_keys, repartition_by, started
            )
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
            "storage": "parquet",
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

    def _run_stage_iceberg(
        self,
        stage: str,
        df: DataFrame,
        dedup_keys: Optional[list[str]],
        repartition_by: Optional[str],
        started: float,
    ) -> DataFrame:
        """Iceberg stage write: ``MERGE INTO`` idempotent upsert.

        A stage killed mid-write leaves either no new snapshot (Iceberg
        commits are atomic) or a committed one; the rerun's MERGE
        inserts only rows whose keys are absent, so partial progress is
        kept and never duplicated — the real-runtime version of the
        parquet path's tmp-dir + rename. Without dedup keys the table
        is replaced atomically instead (no key to merge on).
        """
        table = self.stage_table(stage)
        if repartition_by:
            df = df.repartition(F.col(repartition_by))
        exists = self.spark.catalog.tableExists(table)
        if dedup_keys and exists:
            # stage names are directory-safe, not necessarily SQL
            # identifiers — sanitize the view name; drop it even when
            # the MERGE fails (a leaked session-global temp view would
            # shadow the next attempt's data)
            view = "_updates_" + re.sub(r"\W", "_", stage)
            df.createOrReplaceTempView(view)
            try:
                on = " AND ".join(
                    f"t.{key} <=> s.{key}" for key in dedup_keys
                )
                self.spark.sql(
                    f"MERGE INTO {table} t USING {view} s ON {on} "
                    f"WHEN NOT MATCHED THEN INSERT *"
                )
            finally:
                self.spark.catalog.dropTempView(view)
        else:
            df.writeTo(table).using("iceberg").createOrReplace()

        written = self.spark.read.table(table)
        partition_counts = (
            written.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        lineage = {
            "stage": stage,
            "storage": "iceberg",
            "table": table,
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
        # dispatch on the storage the stage was actually WRITTEN with
        # (recorded in its lineage), not the currently detected mode: a
        # parquet checkpoint must stay resumable after the job gains an
        # Iceberg runtime (and vice versa) — completion markers are
        # storage-agnostic, so reads must be too
        storage = None
        if self.is_complete(stage):
            storage = self.lineage(stage).get("storage")
        if storage is None:
            storage = "iceberg" if self.catalog is not None else "parquet"
        if storage == "iceberg":
            return self.spark.read.table(self.stage_table(stage))
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
        if self.catalog is not None:
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self.stage_table(stage)}"
            )
        path = self.stage_path(stage)
        if os.path.exists(path):
            shutil.rmtree(path)
