#!/usr/bin/env python
"""Validate named registry queries against their DuckDB oracles at one
or more scale factors — the pre-commit check for NEW queries (the
registry-wide pytest gate covers sf0.001; this script adds sf0.01/0.1).

    python scripts/validate_queries.py agg_trimmed_winsorized
    VALIDATE_SFS=0.001,0.01,0.1 python scripts/validate_queries.py name1 name2
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_engineering_project_with_databricks_spark.session import get_spark
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)
from tests.oracle import (
    accelerated,
    compare,
    duckdb_connection,
    materialize_shared_prefixes,
)


def main() -> int:
    names = sys.argv[1:]
    if names == ["--all"]:
        names = sorted(all_specs())
    sfs = os.environ.get("VALIDATE_SFS", "0.001,0.01").split(",")
    # shared-prefix acceleration (VERDICT r12 item 6): materialize the
    # dedup-oracle shingle/hash/signature chain once per fixture and
    # rewrite each oracle to read it — local-harness only, equivalence
    # pinned by tests/test_oracle_accel.py.  ORACLE_ACCEL=0 restores the
    # raw driver-identical SQL.
    accel = os.environ.get("ORACLE_ACCEL", "1") != "0"
    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark(app_name="validate", shuffle_partitions=16)
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb_connection(sf_dir)
        if accel:
            materialize_shared_prefixes(con)
        for n in names:
            spec = specs[n]
            t0 = time.time()
            try:
                df = spec.fn(spark, sf_dir)
                if spec.oracle is None:
                    cnt = df.count()
                    msg = f"rows-only ({cnt} rows)"
                    ok = True
                else:
                    sql = accelerated(spec.oracle) if accel else spec.oracle
                    problems = compare(df, con, sql)
                    ok = not problems
                    msg = "OK" if ok else "; ".join(problems)
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                ok, msg = False, f"EXC {type(exc).__name__}: {exc}"
            bad += 0 if ok else 1
            print(f"sf{sf} {n}: {msg} [{time.time() - t0:.1f}s]", flush=True)
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
