"""Scan-parallelism floor for compute-bound row-local stages.

The benchmark corpora arrive as ONE parquet file per table with a
single row group (documents/embeddings: ~6 MB), so a Spark scan yields
at most one NON-EMPTY task no matter how `maxPartitionBytes` /
`minPartitionNum` split the byte ranges — row groups are the atomic
split unit. Any heavy row-local work chained onto such a scan
(shingling, 32-hash MinHash signatures, hyperplane dot products, media
decode) then runs on ONE core: measured 20 s for the sf1 MinHash
signature build on local[32], ~0.6 s after spreading.

``spread`` repartitions ONLY when the input's partition count is below
the cluster's default parallelism, so it is inert at scale (a 100-TB
table scans as thousands of splits and passes through untouched) and
costs one small shuffle (~the table's bytes) exactly when the
alternative is serializing the whole stage on one core. This is the
same principle as ``_transcripts``' explicit repartition in queries.py:
partition by COMPUTE, not by bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism`` when (and only
    when) the plan's current parallelism is lower. Use immediately
    before compute-heavy row-local stages fed by small scans."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
