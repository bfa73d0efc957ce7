"""Physical-parallelism guard for compute-heavy narrow operators.

Spark sizes file splits by bytes (``maxPartitionBytes`` floor'd by
``openCostInBytes``), which assumes compute cost is proportional to input
bytes.  Operators like MinHash signatures break that assumption: a few MB
of text explodes into millions of hash evaluations, so a small input scan
lands in one task and serializes the whole stage on one core.

``scale_out`` repartitions only when the input has fewer partitions than
the session's default parallelism — a cheap shuffle of the small input at
fixture scale, and a guaranteed no-op at 100 TB where any real corpus
scan already has far more partitions than cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    dsum_merge,
    dsum_partial_hi,
    dsum_partial_lo,
)


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_partitions`` (default: the
    session's ``defaultParallelism``) partitions before a compute-heavy
    narrow stage.  No-op when already wide enough."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def skew_resistant_agg(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    value_col: str,
) -> DataFrame:
    """Skew-resistant per-key (COUNT DISTINCT, exact SUM) via explicit
    two-stage aggregation.

    The failure mode at 100 TB: a handful of hot keys (a viral
    event_type, an empty-string language) send their ENTIRE distinct-set
    state to single reducers — ``countDistinct``'s partial state is the
    set itself, so map-side combine doesn't save the hot reducer.

    Stage 1 groups by the composite ``(keys, distinct_col)``: the
    shuffle hash-partitions on the composite, so a hot key fans out
    across ALL reducers (the distinct value acts as a natural salt),
    each deduplicating a disjoint slice of its values.  Stage 2 groups
    the compact one-row-per-distinct-value output by ``keys`` alone —
    orders of magnitude smaller than the raw fact.  The exact
    fixed-point sum splits the same way: long partials in stage 1,
    merged exactly in stage 2 (functions/numeric.py), so the two-stage
    result is bit-equal with the one-stage aggregate.
    """
    stage1 = df.groupBy(*keys, F.col(distinct_col)).agg(
        dsum_partial_hi(value_col).alias("_hi"),
        dsum_partial_lo(value_col).alias("_lo"),
    )
    return stage1.groupBy(*keys).agg(
        F.count("*").alias("n_distinct"),
        dsum_merge("_hi", "_lo").alias("total_value"),
    )
