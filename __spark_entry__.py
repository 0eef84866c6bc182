"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-extraction query on sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry defined in
``sherlock_spark.queries`` (each Spark implementation paired with a
DuckDB-executable ANSI-SQL oracle over the same parquet tables).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full triple extraction (tokenize -> NER -> pair
    enumeration -> RC -> decode) over a transcript table derived from
    /root/testdata/sf0.001 documents.
    """
    from sherlock_spark.queries import q_kg_triples

    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sherlock_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sherlock_spark.queries import ORACLES

    return dict(ORACLES)
