"""Shared-prefix oracle acceleration must be result-identical
(VERDICT r12 item 6).

The local harness may rewrite generated oracles to read pre-materialized
``__mat_sh``/``__mat_hs``/``__mat_sig`` temp tables
(tests/oracle.accelerated); the driver ships the raw self-contained SQL.
These tests pin that for EVERY registered oracle the rewrite changes,
raw and accelerated SQL produce identical frames on the same fixture —
so a green accelerated sweep implies a green driver sweep.
"""

from __future__ import annotations

import pandas as pd
import pytest

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)
from tests.oracle import accelerated, duckdb_connection, materialize_shared_prefixes

_SPECS = all_specs()
_AFFECTED = sorted(
    n
    for n, s in _SPECS.items()
    if s.oracle is not None and accelerated(s.oracle) != s.oracle
)


def test_acceleration_touches_the_dedup_family_only() -> None:
    # sanity on blast radius: the rewrite must touch a non-empty family
    # and every touched oracle must embed the shingle chain it claims to
    assert len(_AFFECTED) >= 5, _AFFECTED
    for n in _AFFECTED:
        assert "string_split(text, ' ')" in _SPECS[n].oracle, n


@pytest.fixture(scope="module")
def accel_con(sf_dir):
    con = duckdb_connection(sf_dir)
    materialize_shared_prefixes(con)
    yield con
    con.close()


@pytest.mark.parametrize("name", _AFFECTED)
def test_accelerated_oracle_is_result_identical(name, accel_con) -> None:
    raw = accel_con.execute(_SPECS[name].oracle).df()
    fast = accel_con.execute(accelerated(_SPECS[name].oracle)).df()
    raw = raw[sorted(raw.columns)]
    fast = fast[sorted(fast.columns)]
    assert list(raw.columns) == list(fast.columns)
    if len(raw):
        raw = raw.sort_values(by=list(raw.columns)).reset_index(drop=True)
        fast = fast.sort_values(by=list(fast.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(raw, fast)
