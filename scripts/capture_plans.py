#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> <name> [<name> ...]

Writes plans/<tag>/<name>_<suffix>.txt for each query.  Construction-time
jobs (localCheckpoint materializations) run as part of building the
DataFrame — the committed plan is the FINAL query plan, as in r13.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)
from end_to_end_data_engineering_project_with_databricks_spark.session import (
    get_spark,
    pin_session_conf,
)


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    pin_session_conf(spark)
    registry = all_specs()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
