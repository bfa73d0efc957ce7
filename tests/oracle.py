"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the driver's canonicalization pipeline (VERDICT r3 item 3): both
sides are converted to pandas (Spark via ``toPandas()``, DuckDB via
``rel.df()``), columns sorted by name, rows sorted with pandas
``sort_values`` over all columns, then the stringified frames compared.

This is deliberately STRICTER than comparing ``fetchall()`` Python
values, and reproduces two driver failure classes the old harness
masked:

* dtype drift — DuckDB HUGEINT/DECIMAL arrive as float64 (``8.0``)
  while Spark BIGINT arrives as int64 (``8``); the stringified cells
  differ, so un-cast ``SUM()`` oracles fail here exactly like they fail
  the driver's value hash (the ``text_repetition_filter`` r3 red).
* unhashable cells — pandas ``sort_values`` raises ``TypeError:
  unhashable type: 'list'`` on list/array-typed columns; we surface the
  crash as a mismatch instead of tuple-izing it away (the
  ``map_functions`` r3 red).

Floats are otherwise compared bit-exactly — the engine is engineered
for bit-equality with DuckDB (see functions/numeric.py), so any drift
is a bug we want to see locally before the driver does.
"""

from __future__ import annotations

import math
from datetime import date, datetime, timezone
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

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


# ---- shared-prefix acceleration (VERDICT r12 item 6) -------------------
#
# The dedup/text oracle family re-derives the same shingle -> hash ->
# signature chain per query; at sf0.1 the full-registry sweep spends most
# of its DuckDB time recomputing that prefix, and the 30x ensemble
# replays cost 1541-1809 s each.  The LOCAL harness (validate_queries,
# scale probes) may pre-materialize the chain once per (connection ==
# fixture) and textually rewrite each oracle's embedded prefix CTEs to
# read the temp tables.  The driver contract is untouched: oracle_sql()
# still ships the self-contained per-query SQL, and
# tests/test_oracle_accel.py pins that the rewrite is result-identical.


def materialize_shared_prefixes(con: duckdb.DuckDBPyConnection) -> None:
    """Build the shared dedup-oracle prefix once: TEMP tables
    ``__mat_sh`` (distinct per-doc shingles), ``__mat_hs`` (per-doc
    shingle hashes), ``__mat_sig`` (64-permutation MinHash signatures),
    each from the EXACT generated CTE text the oracles embed (imported,
    not copied, so generator drift cannot desynchronize them)."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.dedup import (
        _HS_CTE,
        _SHINGLE_CTES,
        _sig_cte_sql,
    )

    con.execute(
        f"CREATE TEMP TABLE __mat_sh AS WITH {_SHINGLE_CTES} SELECT * FROM sh"
    )
    con.execute(
        f"CREATE TEMP TABLE __mat_hs AS WITH {_SHINGLE_CTES},{_HS_CTE} "
        "SELECT * FROM hs"
    )
    # sig derives from hs alone — feed it the materialized hs instead of
    # re-running the tokenize/shingle chain a third time
    con.execute(
        "CREATE TEMP TABLE __mat_sig AS WITH hs AS (SELECT * FROM __mat_hs),\n"
        f"    {_sig_cte_sql()} SELECT * FROM sig"
    )


def accelerated(sql: str) -> str:
    """Rewrite a generated oracle's shared-prefix CTE definitions to
    read the pre-materialized temp tables (a textual no-op for oracles
    that don't embed them).  Replacements swap each known generated
    definition for a table read with the SAME CTE name, so every
    downstream reference binds unchanged; the docs/eligible/pos CTEs
    become unreferenced and DuckDB never evaluates them."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.dedup import (
        _HS_CTE,
        _HS_CTE_MAT,
        _SHINGLE_CTES,
        _sig_cte_sql,
    )

    shingle_fast = """
    docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    eligible AS (SELECT doc_id, toks FROM docs WHERE len(toks) >= 3),
    pos AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      FROM eligible
    ),
    sh AS MATERIALIZED (SELECT * FROM __mat_sh)"""
    return (
        sql.replace(_sig_cte_sql(), "sig AS (SELECT * FROM __mat_sig)")
        .replace(_HS_CTE_MAT, "\n    hs AS (SELECT * FROM __mat_hs)")
        .replace(_HS_CTE, "\n    hs AS (SELECT * FROM __mat_hs)")
        .replace(_SHINGLE_CTES, shingle_fast)
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-parity canonical form: name-sorted columns, value-sorted
    rows.  Raises TypeError on unhashable (list/array) cells, exactly
    like the driver's canonicalizer."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _cell(v) -> str:
    """One canonical string per cell, type-preserving where the driver's
    pandas hash is type-sensitive (int64 '8' vs float64 '8.0')."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        return "NaN" if math.isnan(v) else repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        # DuckDB's .df() widens DATE to datetime64 — render dates as
        # midnight timestamps so both sides agree.
        return pd.Timestamp(v).isoformat()
    if isinstance(v, str):
        return v
    return repr(v)


def _rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    return [
        tuple(_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    od = con.execute(sql).df()

    if sorted(sp.columns) != sorted(od.columns):
        problems.append(
            f"columns differ: spark={sorted(sp.columns)} oracle={sorted(od.columns)}"
        )
        return problems
    if len(sp) != len(od):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(od)}")

    try:
        sp_c, od_c = _canon(sp), _canon(od)
    except TypeError as e:  # list/array cells — the driver dies here too
        problems.append(f"driver canonicalizer would crash: {type(e).__name__}: {e}")
        return problems

    s_rows, o_rows = _rows(sp_c), _rows(od_c)
    if s_rows != o_rows:
        diffs = [(s, o) for s, o in zip(s_rows, o_rows) if s != o][:3]
        o_set = set(o_rows)
        s_set = set(s_rows)
        extra_s = [r for r in s_rows if r not in o_set][:3]
        extra_o = [r for r in o_rows if r not in s_set][:3]
        problems.append(
            f"values differ; first row-diffs={diffs} spark-only={extra_s} oracle-only={extra_o}"
        )
    return problems
