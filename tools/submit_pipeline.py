"""spark-submit entry point for the KG-construction DAG.

Cluster:
    python -c "from sherlock_spark.session import build_pyfiles_zip as b; print(b('dist/sherlock_spark.zip'))"
    spark-submit --py-files dist/sherlock_spark.zip \
        tools/submit_pipeline.py --input <transcripts.parquet> --out <dir>

Local smoke (sandbox):
    spark-submit --master 'local[8]' --driver-memory 8g \
        --py-files /tmp/sherlock_spark_pyfiles.zip \
        tools/submit_pipeline.py --input <dir> --out <dir>

The job reads a transcript parquet table (conv_id, turn_idx, role,
text, tool, ts), runs extract -> link -> canonicalize -> materialize
with checkpoints under --out, and prints per-stage lineage JSON.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--chunk-turns", type=int, default=256)
    parser.add_argument("--max-mentions", type=int, default=16)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    # master/memory/py-files come from spark-submit; only engine
    # semantics are configured here
    spark = (
        SparkSession.builder.appName("sherlock_spark_kg")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        # one BLAS/OMP thread per task Python (SURVEY §4): Spark runs a
        # task per core already; a real-model forward must not fan out
        # its own thread pool on top
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .getOrCreate()
    )

    from sherlock_spark.plans.pipeline import run_kg_pipeline

    transcripts = spark.read.parquet(args.input)
    result = run_kg_pipeline(
        spark,
        transcripts,
        args.out,
        chunk_turns=args.chunk_turns,
        max_mentions=args.max_mentions,
    )
    print(json.dumps({"lineage": result["lineage"]}, indent=2))
    print(
        json.dumps(
            {
                "triples": result["triples"].count(),
                "nodes": result["nodes"].count(),
                "edges": result["edges"].count(),
            }
        )
    )


if __name__ == "__main__":
    main()
