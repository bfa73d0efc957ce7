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


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_partitions`` (default: the
    session's ``defaultParallelism``) partitions before a compute-heavy
    narrow stage.  No-op when already wide enough."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
