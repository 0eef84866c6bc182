"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their string form — mirroring the driver's described compare).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for column in df.columns:
        if pd.api.types.is_float_dtype(df[column]):
            df[column] = df[column].round(4)
        if pd.api.types.is_integer_dtype(df[column]):
            df[column] = df[column].astype("int64")
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = normalize(df)
    rows = sorted(
        "|".join("" if pd.isna(v) else str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from sherlock_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for table in TABLES:
        con.sql(
            f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        spark_df = queries[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:34s} rows-only: {len(spark_df)} rows (no oracle)")
            continue
        oracle_df = con.sql(oracles[name]).df()
        problems = []
        if len(spark_df) != len(oracle_df):
            problems.append(f"rows {len(spark_df)} != {len(oracle_df)}")
        if sorted(spark_df.columns) != sorted(oracle_df.columns):
            problems.append(
                f"cols {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}"
            )
        if not problems and value_hash(spark_df) != value_hash(oracle_df):
            problems.append("value-hash mismatch")
        status = "OK " if not problems else "FAIL"
        print(f"{name:34s} {status} {len(spark_df):7d} rows  {'; '.join(problems)}")
        if problems:
            failures.append(name)
            # show a small diff sample
            s = normalize(spark_df)
            o = normalize(oracle_df)
            s_rows = {
                "|".join(str(v) for v in r)
                for r in s.itertuples(index=False, name=None)
            }
            o_rows = {
                "|".join(str(v) for v in r)
                for r in o.itertuples(index=False, name=None)
            }
            for row in list(s_rows - o_rows)[:3]:
                print(f"    spark-only: {row}")
            for row in list(o_rows - s_rows)[:3]:
                print(f"    oracle-only: {row}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
