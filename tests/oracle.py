"""Local replica of the driver's DuckDB-oracle comparison.

Mimics the strictest plausible driver check: row count, column-name set,
and an order-insensitive multiset compare of values with columns sorted by
name.  Floats are compared bit-exactly — the engine is engineered for
bit-equality with DuckDB (see functions/numeric.py), so any drift is a bug
we want to see locally before the driver does.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns

    rel = con.execute(sql)
    oracle_cols = [d[0] for d in rel.description]
    oracle_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return problems
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} oracle={len(oracle_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])

    s_set = sorted(
        (tuple(_norm(row[i]) for i in order) for row in (tuple(r) for r in spark_rows)),
        key=repr,
    )
    o_set = sorted((tuple(_norm(row[i]) for i in o_order) for row in oracle_rows), key=repr)
    if s_set != o_set:
        diffs = [
            (s, o) for s, o in zip(s_set, o_set) if s != o
        ][:3]
        extra_s = [r for r in s_set if r not in o_set][:3]
        extra_o = [r for r in o_set if r not in s_set][:3]
        problems.append(
            f"values differ; first row-diffs={diffs} spark-only={extra_s} oracle-only={extra_o}"
        )
    return problems
