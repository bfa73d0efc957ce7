#!/usr/bin/env python
"""One-off end-to-end probe at ~10x sf0.1 (VERDICT r10 item 3).

The growth audit fits exponents on replicated sf0.001/sf0.01 corpora and
the bare sweeps run at sf0.1, but nothing had ever EXECUTED at ~6M
lineitem rows / ~50k documents — the cheapest place a constant-factor or
memory cliff hides from log-log fits.  This script closes that:

  python scripts/scale_probe_10x.py materialize   # build the 10x fixture set
  python scripts/scale_probe_10x.py run           # fresh process: run 16 queries

``materialize`` writes an RI-PRESERVING 10x replica of every fixture
table to $SCALE10X_DIR (default /tmp/e2e_spark_scale10x/sf1.0):

- TPC-H tables: replica r remaps every entity key ``key -> key*k + r``
  consistently across tables (orders.o_custkey and customer.c_custkey
  get the same map, lineitem's order/part/supp keys follow their
  parents), so every join's per-replica fan-out is EXACTLY the sf0.1
  fan-out — a genuinely 10x-bigger database, not 10x duplicate rows.
  nation/region stay fixed (they are constant-size in TPC-H; nationkey
  references remain in range).
- events: event_id/user_id interleave-remapped — 10x users with
  unchanged per-user session structure (sessionization/window semantics
  scale by population, not by density).
- documents/embeddings: the audit replicators (operators/scale_audit
  replicate_documents / replicate_embeddings) — token tagging grows the
  shingle domain ~10x with replica-local duplicate clusters; vector
  replicas are orthogonal shifts.

``run`` must be a FRESH process (driver heap is fixed at JVM launch):
a deliberately BARE SparkSession (pure stock defaults, 1 GiB driver
heap in local mode; the library's pin_session_conf applies through
load_table exactly as for any externally provided session) executes the
12 pinned headline + 4 tracking bench queries ONCE each (materialized
via the noop sink, after one warm-up count), recording wall-time and
JVM heap-in-use after each query.  Single-shot timings include
whole-stage-codegen compilation — this is an envelope probe, not a
steady-state benchmark; compare shapes against BENCH mins, not values.
Set SCALE10X_DRIVER_MEMORY to re-run with a sized heap if the bare
envelope fails (record BOTH outcomes in docs/SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Replication factor (SCALE10X_K): 10 = the standing ~sf1.0 probe;
#: 30 extends the executed frontier to ~sf3.0 (18M lineitem / 150k
#: docs).  replicate_embeddings requires K <= 2x embedding dim (128).
K = int(os.environ.get("SCALE10X_K", "10"))
DEFAULT_DIR = f"/tmp/e2e_spark_scale10x/sf{K / 10:g}"

#: key columns to interleave-remap per table (key -> key*K + replica)
_TPCH_KEYMAP = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
}
_COPY_TABLES = ("nation", "region")

#: the bench queries: the pinned 12-query headline suite + the
#: tracking tier (bench.py TRACKING_QUERIES — 6 entries since r14)
def _bench_query_names():
    import bench  # repo root is on sys.path (top of this file)

    from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
        all_specs,
    )

    registry = all_specs()
    headline = [n for n, s in registry.items() if s.bench]
    return registry, headline, list(bench.TRACKING_QUERIES)


def materialize(src_dir: str, out_dir: str, k: int = K) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_project_with_databricks_spark.operators.scale_audit import (
        _with_replica_spine,
        replicate_documents,
        replicate_embeddings,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.session import (
        pin_session_conf,
    )

    # materialization is probe INFRASTRUCTURE, not the envelope under
    # test — the bare-heap discipline applies to run(), not here.  At
    # k=100 the 60M-row lineitem write (32 concurrent parquet writers'
    # column buffers) OOMs a stock 1 GiB heap; size via
    # SCALE10X_DRIVER_MEMORY for large k.
    builder = SparkSession.builder
    mem = os.environ.get("SCALE10X_DRIVER_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    pin_session_conf(spark)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    for name, keys in _TPCH_KEYMAP.items():
        df = spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))
        # spread the k-way replica explode across the full parallelism:
        # the sf0.1 fact parquets have 1-3 files, so at k=100 the
        # explode otherwise runs 60M output rows through 3 tasks
        if name in ("lineitem", "orders", "events"):
            df = df.repartition(32)
        rep = _with_replica_spine(df, k)
        cols = [
            (F.col(c) * k + F.col("_rep")).alias(c) if c in keys else F.col(c)
            for c in df.columns
        ]
        out = rep.select(*cols)
        # big fact tables spread over the full parallelism; dims stay few
        nfiles = 32 if name in ("lineitem", "orders", "events") else 4
        out.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print(f"  {name}: x{k} written", flush=True)
    for name in _COPY_TABLES:
        spark.read.parquet(os.path.join(src_dir, f"{name}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{name}.parquet"))
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    docs10 = replicate_documents(docs, k)
    # carry the non-text passenger columns the curation/dedup queries
    # read (lang/source/n_chars) — join back on the replica-0 parent id
    docs10 = (
        docs10.withColumn("_parent", (F.col("doc_id") / k).cast("long"))
        .join(
            docs.select(
                F.col("doc_id").alias("_parent"), "lang", "source", "n_chars"
            ),
            "_parent",
        )
        .select("doc_id", "text", "lang", "source", F.length("text").alias("n_chars"))
    )
    docs10.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    print(f"  documents: x{k} written", flush=True)
    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    emb10 = (
        replicate_embeddings(emb, k)
        .withColumn("_parent", (F.col("vec_id") / k).cast("long"))
        .join(emb.select(F.col("vec_id").alias("_parent"), "label"), "_parent")
        .select("vec_id", "embedding", "label")
    )
    emb10.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    print(f"  embeddings: x{k} written; total {time.perf_counter()-t0:.0f}s", flush=True)


def run(sf_dir: str, names: list[str] | None = None) -> int:
    """Run the probe suite (default: 12 headline + 4 tracking queries;
    ``names`` or $SCALE10X_QUERIES restricts the set — the CI smoke in
    tests/test_scale_probe_smoke.py runs k=2 with 2 queries)."""
    from pyspark.sql import SparkSession

    builder = SparkSession.builder
    mem = os.environ.get("SCALE10X_DRIVER_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    heap_conf = spark.sparkContext.getConf().get(
        "spark.driver.memory", "<default 1g>"
    )
    print(f"bare session: driver.memory={heap_conf} sf_dir={sf_dir}", flush=True)
    registry, headline, tracking = _bench_query_names()
    env_names = os.environ.get("SCALE10X_QUERIES")
    if names is None and env_names:
        names = [n.strip() for n in env_names.split(",") if n.strip()]
    if names is not None:
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise KeyError(f"SCALE10X_QUERIES not in registry: {unknown}")
        headline = [n for n in headline if n in names]
        tracking = [n for n in tracking if n in names]
        # registry queries outside both bench tiers keep a DISTINCT tier
        # label in the artifact (r12 ADVICE item 3: folding them into
        # `headline` mislabeled ad-hoc SCALE10X_QUERIES runs)
        extra = [n for n in names if n not in headline and n not in tracking]
    else:
        extra = []
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()

    # warm-up: JVM, parquet footers — not billed to any query
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    results = []
    rc = 0
    for name in headline + tracking + extra:
        tier = (
            "headline"
            if name in headline
            else ("tracking" if name in tracking else "adhoc")
        )
        t0 = time.perf_counter()
        try:
            df = registry[name].fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            status = "ok"
        except Exception as ex:  # noqa: BLE001 — envelope probe records failures
            status = f"FAIL: {type(ex).__name__}: {str(ex)[:200]}"
            rc = 1
        wall = round(time.perf_counter() - t0, 2)
        try:
            heap_gb = round(
                (rt.totalMemory() - rt.freeMemory()) / (1 << 30), 2
            )
        except Exception:  # noqa: BLE001 — a task OOM can take the JVM with it
            heap_gb = None
        results.append(
            {"query": name, "tier": tier, "wall_sec": wall,
             "heap_used_gb": heap_gb, "status": status}
        )
        print(json.dumps(results[-1]), flush=True)
        if heap_gb is None:
            # the gateway JVM is dead (driver heap is fixed at launch,
            # so an in-process restart cannot restore the envelope) —
            # record the remaining queries as unreached and stop cleanly
            # instead of crashing without the summary line (the k=100
            # bare run died exactly here)
            for rest in (headline + tracking + extra)[
                len(results):
            ]:
                results.append(
                    {"query": rest, "tier": "unreached", "wall_sec": 0.0,
                     "heap_used_gb": None,
                     "status": "SKIP: jvm dead after previous failure"}
                )
                print(json.dumps(results[-1]), flush=True)
            rc = 1
            break
    print(json.dumps({
        "metric": "scale10x_probe",
        "sf_dir": sf_dir,
        "driver_memory": heap_conf,
        "total_sec": round(sum(r["wall_sec"] for r in results), 2),
        "failures": [r["query"] for r in results if r["status"] != "ok"],
    }), flush=True)
    return rc


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    out_dir = os.environ.get("SCALE10X_DIR", DEFAULT_DIR)
    if cmd == "materialize":
        materialize(
            os.environ.get("SCALE10X_SRC_DIR", "/root/testdata/sf0.1"), out_dir
        )
        return 0
    if cmd == "run":
        return run(out_dir)
    print(f"unknown command {cmd!r}; use materialize|run", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
