"""Declarative multi-table pipelines with expectations — the Delta Live
Tables capability twin (plain PySpark, no Databricks runtime).

The reference is an imperative 4-stage script (ETL_pipeline_countries.py:
144-147) run on a schedule; its platform's declarative successor (DLT)
lets users write each table as a FUNCTION of upstream tables and attach
data-quality expectations, with the framework supplying dependency
ordering and quality accounting.  This module supplies the same
contract:

- ``@pipeline.table()`` registers a transform; its PARAMETER NAMES are
  its upstream table dependencies (``def silver(bronze): ...``) — the
  dependency graph is read from signatures, not declared twice.
- ``@pipeline.expect(name, condition, action=...)`` attaches an
  expectation to the table below it: ``"warn"`` counts violations
  without touching rows (collected via the Observation API during the
  run's one action — no second scan), ``"drop"`` filters violating
  rows (count also observed), ``"fail"`` aborts the run if any row
  violates.
- ``pipeline.run(spark)`` topologically orders the graph, materializes
  each table once (every downstream consumer reads the same result),
  and returns the DataFrames plus per-expectation metrics.

Scale: ordering/metrics are driver-side metadata; every table body is a
lazy DataFrame plan, so Catalyst optimizes ACROSS table boundaries
(filter pushdown from gold into bronze's scan, etc.) exactly as if the
pipeline were hand-fused — tables are materialization points only if
the caller writes them.  ``fail`` expectations are the exception: each
one costs one counting action, the price of aborting before any write.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


@dataclass
class Expectation:
    name: str
    condition: str  # SQL boolean expression over the table's columns
    action: str = "warn"


@dataclass
class _TableDef:
    fn: object
    comment: str = ""

    @property
    def expectations(self) -> list[Expectation]:
        # read from the function at RUN time: @expect decorators sit ABOVE
        # @table and therefore execute after it has already registered
        return list(getattr(self.fn, "_spark_graft_expectations", []))

    @property
    def deps(self) -> list[str]:
        params = list(inspect.signature(self.fn).parameters)
        # a leading `spark` parameter means "source table": the function
        # builds its own scan instead of reading an upstream table
        return [p for p in params if p != "spark"]


class ExpectationFailed(RuntimeError):
    """A ``fail``-action expectation saw violating rows; the run aborted
    before materializing anything downstream."""


class Pipeline:
    """A named collection of table definitions forming a DAG."""

    def __init__(self, name: str):
        self.name = name
        self._defs: dict[str, _TableDef] = {}
        self._pending_expectations: list[Expectation] = []

    def expect(self, name: str, condition: str, action: str = "warn"):
        """Attach an expectation to the NEXT ``@table`` below this
        decorator (decorators apply bottom-up, so ``@expect`` lines
        stack above ``@table``)."""
        if action not in _ACTIONS:
            raise ValueError(f"action must be one of {_ACTIONS}, got {action!r}")
        exp = Expectation(name, condition, action)

        def deco(fn):
            exps = getattr(fn, "_spark_graft_expectations", [])
            fn._spark_graft_expectations = [exp, *exps]
            return fn

        return deco

    def table(self, name: str | None = None, comment: str = ""):
        def deco(fn):
            tname = name or fn.__name__
            if tname in self._defs:
                raise ValueError(f"duplicate table name: {tname}")
            self._defs[tname] = _TableDef(fn, comment)
            return fn

        return deco

    def _order(self) -> list[str]:
        """Topological order; raises on cycles and unknown dependencies."""
        order: list[str] = []
        state: dict[str, int] = {}  # 1=visiting, 2=done

        def visit(n: str, chain: tuple[str, ...]) -> None:
            if state.get(n) == 2:
                return
            if state.get(n) == 1:
                cycle = " -> ".join((*chain[chain.index(n):], n))
                raise ValueError(f"dependency cycle: {cycle}")
            if n not in self._defs:
                raise KeyError(
                    f"table {chain[-1]!r} depends on undefined table {n!r}"
                )
            state[n] = 1
            for d in self._defs[n].deps:
                visit(d, (*chain, n))
            state[n] = 2
            order.append(n)

        for n in self._defs:
            visit(n, ())
        return order

    def run(self, spark: SparkSession) -> "PipelineRun":
        """Resolve the DAG and build every table.

        warn/drop violation counts come from Observations and populate
        after the caller runs an action over the instrumented
        DataFrames (``PipelineRun.metrics()``); ``fail`` expectations
        are checked eagerly here — each costs one counting action, the
        price of aborting before any write.
        """
        tables: dict[str, DataFrame] = {}
        observations: dict[str, dict[str, Observation]] = {}
        for tname in self._order():
            tdef = self._defs[tname]
            params = list(inspect.signature(tdef.fn).parameters)
            args = [spark if p == "spark" else tables[p] for p in params]
            df = tdef.fn(*args)
            obs_for_table: dict[str, Observation] = {}
            for exp in tdef.expectations:
                if exp.action == "fail":
                    n_bad = df.filter(~F.expr(exp.condition)).count()
                    if n_bad:
                        raise ExpectationFailed(
                            f"{self.name}.{tname}: expectation {exp.name!r} "
                            f"({exp.condition}) violated by {n_bad} rows"
                        )
                    continue
                obs = Observation(f"{self.name}.{tname}.{exp.name}")
                df = df.observe(
                    obs,
                    F.sum(
                        F.when(~F.expr(exp.condition), 1).otherwise(0)
                    ).alias("violations"),
                )
                obs_for_table[exp.name] = obs
                if exp.action == "drop":
                    df = df.filter(F.expr(exp.condition))
            tables[tname] = df
            observations[tname] = obs_for_table
        return PipelineRun(tables, observations)


@dataclass
class PipelineRun:
    """Result of :meth:`Pipeline.run`: the instrumented DataFrames and
    the expectation Observations backing :meth:`metrics`."""

    tables: dict[str, DataFrame]
    _observations: dict[str, dict[str, Observation]]

    def metrics(self) -> dict[str, dict[str, int]]:
        """``{table: {expectation: violation_count}}`` for warn/drop
        expectations.  Call AFTER running an action on the table (or a
        downstream table that consumed it); blocks until the backing
        Observation has a result."""
        return {
            t: {e: o.get["violations"] for e, o in obs.items()}
            for t, obs in self._observations.items()
            if obs
        }
