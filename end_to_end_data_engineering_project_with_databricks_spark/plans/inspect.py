"""Physical-plan inspection utilities.

The engine's optimizer IS Catalyst (SURVEY.md §4) — we write no rewrite
rules, so our optimizer work product is *verifying the plans Catalyst
produces stay the plans we reviewed*: filters pushed into scans, columns
pruned, dimensions broadcast, no accidental cross joins.  These helpers
give tests (tests/test_plan_shapes.py) and interactive tuning a stable
API over Spark's explain output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full formatted physical plan (explain("formatted") as a
    string) — unlike ``executedPlan().toString()``, scan metadata
    (PushedFilters / ReadSchema / PartitionFilters) is not truncated."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def final_adaptive_plan(df: DataFrame) -> str:
    """The POST-EXECUTION physical plan string — the one AQE actually
    ran, re-planned splits included.  ``formatted_plan`` shows the
    initial plan (``isFinalPlan=false``); runtime re-optimizations
    (skew-join splits, coalesced partitions, SMJ→BHJ conversions) only
    appear after an action has materialized every query stage.  The
    caller must have run an action on ``df`` first; the string contains
    ``isFinalPlan=true`` when it has."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class ScanInfo:
    location: str
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_columns: list[str] = field(default_factory=list)


def scans(df: DataFrame) -> list[ScanInfo]:
    """Every file scan in the plan with its pushdown/pruning metadata."""
    plan = formatted_plan(df)
    out: list[ScanInfo] = []
    for block in re.split(r"\n\(\d+\) ", plan):
        if not block.startswith("Scan "):
            continue
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        cols = (
            [f.split(":")[0] for f in schema.group(1).split(",") if f]
            if schema
            else []
        )
        out.append(
            ScanInfo(
                location=loc.group(1) if loc else "",
                pushed_filters=_split(pushed),
                partition_filters=_split(part),
                read_columns=cols,
            )
        )
    return out


def _split(m: re.Match | None) -> list[str]:
    if not m or not m.group(1).strip():
        return []
    return [s.strip() for s in m.group(1).split(",")]


def join_kinds(df: DataFrame) -> list[str]:
    """Physical join operator names, in plan order."""
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def has_cartesian(df: DataFrame) -> bool:
    return any(
        k in ("CartesianProduct", "BroadcastNestedLoopJoin") for k in join_kinds(df)
    )


def window_partition_spec_sizes(df: DataFrame) -> list[int]:
    """Partition-spec arity of every Window operator in the physical
    plan.  A size of 0 is the scale red flag: an unpartitioned window
    (``Window.orderBy`` with no ``partitionBy``) funnels every row
    through a single reducer regardless of cluster size."""
    sizes: list[int] = []

    def walk(node) -> None:
        if node.nodeName() == "Window":
            sizes.append(node.partitionSpec().size())
        if node.nodeName() == "AdaptiveSparkPlan":
            # AQE wrapper exposes no children; the plan hangs off initialPlan
            walk(node.initialPlan())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return sizes


def shuffle_count(df: DataFrame) -> int:
    """Number of hash-partition exchanges (the operations that cost at
    scale); broadcast / single-partition / range exchanges are counted
    separately by plan review.  Formatted explain puts the node name and
    its arguments on separate lines (``(3) Exchange`` ...
    ``Arguments: hashpartitioning(...)``), so count the argument lines —
    one per Exchange detail section."""
    return sum(
        1
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("Arguments: hashpartitioning")
    )
