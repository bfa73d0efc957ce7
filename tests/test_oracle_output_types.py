"""Registry-wide guard on oracle output types (VERDICT r3 item 1).

The driver canonicalizes both result sets through pandas before value
hashing, which makes two DuckDB output-type classes poisonous even when
the VALUES are bit-identical:

* HUGEINT / UHUGEINT / DECIMAL — pandas renders them as float64
  (``8.0``) while Spark's BIGINT stays int64 (``8``) → value-hash
  mismatch (the r3 ``text_repetition_filter`` red).  Convention: every
  count/sum oracle carries ``CAST(... AS BIGINT)`` (relational_extra.py
  module docstring).
* LIST / STRUCT / MAP columns — pandas ``sort_values`` dies on
  unhashable cells (the r3 ``map_functions`` red).  Convention: join
  arrays to strings (``array_to_string`` / ``array_join``) on both
  sides.

This test executes EVERY registered oracle's type signature in DuckDB
(types resolve without running the query) so the never-driver-checked
backlog cannot reintroduce either class as it rotates into the window.
"""

from __future__ import annotations

import os
import re

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import all_specs
from tests.oracle import duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: type-name substrings that are unsafe through the driver's pandas hash
_BANNED = re.compile(r"HUGEINT|UHUGEINT|DECIMAL|\[\]|STRUCT|MAP|UNION", re.IGNORECASE)


def test_no_oracle_emits_pandas_hostile_types() -> None:
    con = duckdb_connection(SF_DIR)
    offenders: list[str] = []
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            if _BANNED.search(str(typ)):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracles with pandas-hostile output types (cast counts to BIGINT, "
        f"join arrays to strings): {offenders}"
    )


# ---------------------------------------------------------------------------
# Regression proofs: the r3 red classes FAIL under the driver-parity
# local harness (they passed the old fetchall()-based one).
# ---------------------------------------------------------------------------


def test_harness_catches_hugeint_dtype_drift(spark) -> None:
    """Un-cast SUM → HUGEINT → float64 '8.0' vs Spark int64 '8' must be
    reported as a value mismatch (pre-fix text_repetition_filter)."""
    from tests.oracle import compare

    con = duckdb_connection(SF_DIR)
    sdf = spark.createDataFrame([(1, 8)], "k int, n bigint")
    problems = compare(sdf, con, "SELECT 1 AS k, SUM(x) AS n FROM (VALUES (3), (5)) t(x)")
    assert problems and "values differ" in problems[0]
    # and the cast fixes it
    assert not compare(
        sdf, con, "SELECT 1 AS k, CAST(SUM(x) AS BIGINT) AS n FROM (VALUES (3), (5)) t(x)"
    )


def test_harness_catches_list_typed_columns(spark) -> None:
    """A list-typed Spark output column must crash canonicalization the
    way the driver does (pre-fix map_functions), not be tuple-ized."""
    from tests.oracle import compare

    con = duckdb_connection(SF_DIR)
    sdf = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], "k int, v array<string>")
    problems = compare(sdf, con, "SELECT * FROM (VALUES (1, ['a','b']), (2, ['c'])) t(k, v)")
    assert problems and "canonicalizer would crash" in problems[0]
