"""Read-side connectors.

Parity targets in the reference:
- multiline JSON scan: ``spark.read.option("multiline","true").json(path)``
  (ETL_pipeline_countries.py:92) -> :func:`read_multiline_json`.
- catalog table scan: ``spark.table(...)`` (ETL_pipeline_countries.py:129) ->
  :func:`register_views` + ``spark.table``.

The fixture tables (TESTDATA.md) are Parquet; Parquet is also the right
100 TB answer (columnar, splittable, min/max pruning, vectorized reader) —
unlike the reference's whole-document multiline JSON, which is unsplittable
and defeats column pruning (SURVEY.md §4, §7 risks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from end_to_end_data_engineering_project_with_databricks_spark.session import pin_session_conf

#: Every fixture table the driver pre-registers for the DuckDB oracle.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table.

    Plain ``spark.read.parquet`` so Catalyst gets filter pushdown, column
    pruning and partition-level min/max skipping for free.
    """
    pin_session_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = df.withColumn("ts", _normalize_event_time(df.schema["ts"].dataType))
    return df


def _normalize_event_time(loaded_type: "DataType") -> "Column":
    """Normalize the events ``ts`` column to TIMESTAMP_NTZ regardless of the
    fixture's physical Parquet layout.

    The fixture has shipped both ``timestamp[ns]`` (surfaced as int64 nanos
    under ``nanosAsLong``) and ``timestamp[us]`` (surfaced directly as a
    timestamp).  Branch on the *loaded* Spark dtype — never assume the
    physical type (the round-2 regression: a hard-coded nanos conversion
    errored on the us layout in batch and silently corrupted it in
    streaming).  TIMESTAMP_NTZ matches the other fixture tables and the
    DuckDB oracle's naive timestamps.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(loaded_type, LongType):
        # int64 epoch-nanos (timestamp[ns] under nanosAsLong)
        return F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")).cast(
            "timestamp_ntz"
        )
    # already a timestamp (timestamp[us/ms] -> TIMESTAMP or TIMESTAMP_NTZ)
    return F.col("ts").cast("timestamp_ntz")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views — the engine's ``spark.sql`` entry point, parity
    with the reference's SQL-warehouse query surface (README.md:250-258)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan.  Always pass ``schema`` on hot paths: without it Spark
    runs an extra full-file inference pass, and CSV pushes down only
    partition filters (no min/max skipping) — CSV is a landing format,
    not a storage format; convert to Parquet at bronze->silver."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan -> single ``value`` column; splittable by
    line, so it parallelizes like any other file source."""
    return spark.read.text(path)


def read_multiline_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Whole-document JSON scan, parity with ETL_pipeline_countries.py:92.

    ``multiLine=true`` parses one JSON document per file; schema is inferred
    when not supplied (the reference always infers).  At scale, pass an
    explicit ``schema`` to skip the extra inference pass, and convert to
    Parquet at the bronze->silver boundary — multiline JSON files are
    unsplittable, so one file == at most one task.
    """
    reader = spark.read.option("multiline", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
