"""Pipeline audit metrics via the Observation API — counters collected
DURING the job's one action instead of a second counting pass.

The reference audits its loads by re-counting the sink after each append
(display/count cells in ETL_pipeline_countries.py); at 100 TB a second
pass doubles the scan bill.  ``df.observe`` attaches aggregate
expressions to a point in the plan; Spark accumulates them on the
executors while the action runs and exposes them on the driver
afterwards — zero extra jobs, zero extra scans, exact values.

Constraints inherited from Spark: observed metrics fire on ACTIONS
(count/collect/write), the expressions must be aggregates over the
observed node's output, and each Observation instance is single-use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach audit ``metrics`` (aggregate Columns) to ``df``.

    Returns the instrumented DataFrame plus the Observation handle;
    read ``observation.get`` AFTER running exactly one action on the
    returned DataFrame.  Example::

        kept, obs = observed(filtered, "gate",
                             F.count("*").alias("rows_kept"),
                             dsum("value").alias("value_kept"))
        kept.write.parquet(path)      # metrics accumulate during the write
        stats = obs.get               # {'rows_kept': ..., 'value_kept': ...}
    """
    observation = Observation(name)
    return df.observe(observation, *metrics), observation
