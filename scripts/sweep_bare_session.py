#!/usr/bin/env python
"""Sweep EVERY registered query under a bare default SparkSession.

The external driver may hand ``queries()`` a session built with plain
``SparkSession.builder.getOrCreate()`` — Spark defaults: **1 GiB driver
heap** (which in local mode is also all executor memory), 200 shuffle
partitions, no Arrow tuning.  Operators must complete under that
envelope at the driver's correctness scale (sf0.01); the SimHash
array-accumulator OOM (round 1) is the class of bug this catches.

Run from a fresh process (driver memory is fixed at JVM launch):

    python scripts/sweep_bare_session.py              # sf0.01, all queries
    SWEEP_SF_DIR=/root/testdata/sf0.1 python scripts/sweep_bare_session.py

Materialization mirrors the driver: oracle-checked queries are
``collect()``-ed (the driver pulls rows to hash them), rows-only queries
are ``count()``-ed.  Exit status is non-zero if any query fails.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    # deliberately bare: no master, memory, shuffle, or Arrow confs —
    # the whole point is surviving Spark's defaults
    spark = SparkSession.builder.getOrCreate()
    heap = spark.sparkContext.getConf().get("spark.driver.memory", "<default 1g>")
    print(f"bare session: driver.memory={heap} sf_dir={sf_dir}", flush=True)

    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    failures: list[str] = []
    for name, spec in all_specs().items():
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            n = len(df.collect()) if spec.oracle is not None else df.count()
            print(f"ok   {name:45s} rows={n:<8d} {time.perf_counter() - t0:6.2f}s", flush=True)
        except Exception:
            failures.append(name)
            print(f"FAIL {name}", flush=True)
            traceback.print_exc()
    print(f"\n{len(failures)} failures of {len(all_specs())}: {failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
