"""Tests for the declarative pipeline framework (DLT capability twin):
dependency ordering from signatures, cycle/unknown detection, and the
three expectation actions (warn metrics, drop filtering, fail abort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.pipeline.declarative import (
    ExpectationFailed,
    Pipeline,
)
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


def _docs_pipeline(sf_dir, fail_gate=False):
    pipe = Pipeline("t")

    @pipe.expect("nonneg", "n_chars >= 0", action="fail" if fail_gate else "warn")
    @pipe.table()
    def bronze(spark):
        return load_table(spark, sf_dir, "documents")

    @pipe.expect("min_tokens", "n_tokens >= 5", action="drop")
    @pipe.table()
    def silver(bronze):
        return bronze.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        )

    @pipe.table()
    def gold(silver):
        return silver.agg(
            F.count("*").alias("n"), F.sum("n_tokens").alias("tot")
        )

    return pipe


def test_topological_order_and_drop_semantics(spark, sf_dir):
    run = _docs_pipeline(sf_dir).run(spark)
    got = run.tables["gold"].collect()[0]
    want = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") >= 5)
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tot"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)
    # warn+drop metrics populated by the single gold action - no extra scans
    m = run.metrics()
    assert m["bronze"]["nonneg"] == 0
    n_short = (
        load_table(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) < 5)
        .count()
    )
    assert m["silver"]["min_tokens"] == n_short


def test_fail_expectation_aborts(spark, sf_dir):
    pipe = Pipeline("f")

    @pipe.expect("impossible", "n_chars < 0", action="fail")
    @pipe.table()
    def bronze(spark):
        return load_table(spark, sf_dir, "documents")

    with pytest.raises(ExpectationFailed, match="impossible"):
        pipe.run(spark)


def test_cycle_and_unknown_dependency_detection(spark):
    pipe = Pipeline("c")

    @pipe.table()
    def a(b):
        return b

    @pipe.table()
    def b(a):
        return a

    with pytest.raises(ValueError, match="cycle"):
        pipe.run(spark)

    pipe2 = Pipeline("u")

    @pipe2.table()
    def c(missing):
        return missing

    with pytest.raises(KeyError, match="undefined table"):
        pipe2.run(spark)


def test_duplicate_table_rejected():
    pipe = Pipeline("d")

    @pipe.table(name="x")
    def one(spark):
        return None

    with pytest.raises(ValueError, match="duplicate"):

        @pipe.table(name="x")
        def two(spark):
            return None
