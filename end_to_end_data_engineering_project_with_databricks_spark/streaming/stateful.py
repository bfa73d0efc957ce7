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


#: Output schema of :func:`user_stats_transform_with_state`.
USER_STATS_TWS_SCHEMA = (
    "user_id long, n_events long, value_micros long, n_types long"
)


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` (Spark 4's arbitrary-state API,
    successor to ``applyInPandasWithState``) runs its StatefulProcessor
    through a long-lived Python *driver worker* that speaks protobuf to
    the JVM — so it needs the ``protobuf`` package at runtime, unlike
    every other Python-UDF path (which are pure Arrow).  Absent in this
    container; the operator is import-gated rather than stubbed so it
    lights up unchanged on a cluster that has protobuf."""
    try:  # pragma: no cover - environment probe
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def user_stats_transform_with_state(stream: DataFrame) -> DataFrame:
    """Per-user running (count, exact value micros, distinct types) via
    ``transformWithStateInPandas`` — the Spark 4 arbitrary-state API:
    named state variables (ValueState + MapState) instead of one opaque
    state tuple, per-variable TTL, and timers.

    The double column is quantized to exact micros JVM-SIDE before the
    stateful op (same ROUND(x*1e6) convention as functions/numeric.dsum)
    so Python state sums longs — order-independent and bit-equal with a
    batch ``COUNT(*) / SUM(micros) / COUNT(DISTINCT event_type)``.

    State sharding and scale behavior are identical to
    :func:`running_user_totals` (one RocksDB shard per shuffle
    partition); requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and protobuf —
    see :func:`transform_with_state_available`.
    """
    if not transform_with_state_available():
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(absent in this environment); use running_user_totals "
            "(applyInPandasWithState) instead"
        )

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
        _scaled,
    )

    class _UserStats(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", "cnt long, micros long")
            self._types = handle.getMapState("types", "event_type string", "n long")

        def handleInputRows(self, key, rows, timer_values):
            cnt, micros = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                cnt += len(pdf)
                micros += int(pdf["vm"].sum())
                for t in pdf["event_type"]:
                    self._types.updateValue((t,), (1,))
            self._totals.update((cnt, micros))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "value_micros": [micros],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    spark = stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    quantized = stream.select("user_id", "event_type", _scaled("value").alias("vm"))
    return quantized.groupBy("user_id").transformWithStateInPandas(
        _UserStats(),
        outputStructType=USER_STATS_TWS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


#: Output schema of :func:`cusum_alarm_stream`.
CUSUM_ALARMS_SCHEMA = "user_id long, seq long, event_id long, cusum_fp long"
_CUSUM_STATE_SCHEMA = "s long, n long"


def cusum_alarm_stream(stream: DataFrame, k_fp: int, h_fp: int) -> DataFrame:
    """Streaming one-sided CUSUM change-point alarms per user — the
    streaming twin of queries/pandas_queries.events_cusum_alarms: state
    ``(s, n)`` (the running CUSUM statistic and the global 1-based event
    position) carries across micro-batches, each trigger folds its
    time-slice of events in ``(ts, event_id)`` order, and only alarm
    rows are emitted (append mode — an alarm, once raised, is final).

    ``stream`` must carry ``(user_id, event_id, ts, v_fp)`` with the
    cents quantization already done JVM-side (the batch twin's
    convention: Python state arithmetic is pure int64).  Correct under
    any within-trigger Arrow chunking (chunks concatenate before the
    sort), and exact across triggers when batches arrive in event-time
    order (time-ranged files — the fixture shape; a production feed
    gets this from log segments or a watermarked reorder buffer).

    Scale: state is 2 longs per user, sharded by the grouping key like
    any streaming aggregation; per-trigger cost is the trigger's own
    rows (history enters through the carried scalar, never reprocessed).
    The fixture stream is bounded so NoTimeout is safe; an unbounded
    deployment sets a processing-time timeout to evict idle keys."""
    k, h = int(k_fp), int(h_fp)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s, n = state.get if state.exists else (0, 0)
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(["ts", "event_id"])
        out_seq: list[int] = []
        out_eid: list[int] = []
        out_s: list[int] = []
        for v, eid in zip(pdf["v_fp"].to_numpy(), pdf["event_id"].to_numpy()):
            n += 1
            s = max(0, s + int(v) - k)
            if s > h:
                out_seq.append(n)
                out_eid.append(int(eid))
                out_s.append(s)
                s = 0
        state.update((s, n))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(out_seq), dtype="int64"),
                "seq": pd.Series(out_seq, dtype="int64"),
                "event_id": pd.Series(out_eid, dtype="int64"),
                "cusum_fp": pd.Series(out_s, dtype="int64"),
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=CUSUM_ALARMS_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
