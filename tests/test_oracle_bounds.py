"""Re-validate bounded-check oracle bounds at EVERY fixture scale.

The bounded-check pattern (dedup_minhash_accuracy, agg_approx_*,
emb_pca_quality, ...) emits exact anchor values plus booleans asserting
an estimate sits within a bound; the DuckDB oracle states those booleans
as constant TRUE.  The bounds are chosen from measurements on the
fixture scales, so they are SCALE-COUPLED: a driver run at a NEW scale
where a sketch estimate exceeds its bound would flip the Spark-side
boolean against the constant-TRUE oracle and red the whole row
(ADVICE r4).  This test closes that gap mechanically:

* bounded queries are auto-discovered (any oracle containing a
  ``TRUE AS <col>`` column), so new bounded-check twins are covered the
  moment they register;
* fixture scales are auto-discovered from ``/root/testdata/sf*``, so
  introducing a new scale factor re-validates every bound without
  anyone remembering to.

A failure here means the BOUND needs re-measuring at the offending
scale, not that the operator is wrong.
"""

from __future__ import annotations

import glob
import re

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

_BOUNDED = sorted(
    name
    for name, spec in all_specs().items()
    if spec.oracle and re.search(r"TRUE\s+AS\s+\w+", spec.oracle)
)


def test_discovery_is_not_vacuous() -> None:
    """The auto-discovery must keep finding the known bounded families —
    if a refactor renames the TRUE column idiom, this fails before the
    per-scale checks silently stop covering anything."""
    assert len(SF_DIRS) >= 3, SF_DIRS
    for expected in (
        "dedup_minhash_accuracy",
        "dedup_oph_accuracy",
        "agg_approx_percentile",
        "emb_pca_quality",
        "emb_pca_project",
    ):
        assert expected in _BOUNDED


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", _BOUNDED)
def test_bounded_booleans_hold(spark, sf_dir: str, name: str) -> None:
    spec = all_specs()[name]
    df = spec.fn(spark, sf_dir)
    bool_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, BooleanType)
    ]
    assert bool_cols, f"{name} matched the bounded pattern but emits no boolean"
    row = df.agg(
        *[F.min(F.col(c).cast("int")).alias(c) for c in bool_cols]
    ).first()
    for c in bool_cols:
        # None = empty result at this scale (bound vacuously holds there;
        # the non-vacuity of each bound is proven at the scales where
        # pairs/rows exist — see the per-query docstrings)
        assert row[c] in (1, None), f"{name}.{c} flipped FALSE at {sf_dir}"
