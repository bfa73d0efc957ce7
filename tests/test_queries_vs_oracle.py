"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is a local replica of the driver's t2 gate (CORRECTNESS_r{N}.json);
failures here would fail the round, so they fail CI first.
"""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)
from tests.oracle import compare

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        n = df.count()
        assert n >= 0
        return
    problems = compare(df, oracle_con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
