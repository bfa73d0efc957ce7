"""Tests for distributed sequential-id assignment (operators/ids.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.operators.ids import (
    assign_sequential_ids,
)
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


def test_ids_match_global_rank_and_survive_multibatch(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    got = assign_sequential_ids(d, "doc_id", num_partitions=7)
    rows = got.orderBy("row_id").collect()
    n = len(rows)
    # contiguous permutation 0..n-1
    assert [r["row_id"] for r in rows] == list(range(n))
    # id order == doc_id order (the declared total order)
    doc_ids = [r["doc_id"] for r in rows]
    assert doc_ids == sorted(doc_ids)
    # original columns preserved
    assert set(got.columns) == {"doc_id", "lang", "row_id"}


def test_ids_single_partition_edge(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id").limit(5)
    got = assign_sequential_ids(d, "doc_id", num_partitions=1)
    assert sorted(r["row_id"] for r in got.collect()) == [0, 1, 2, 3, 4]
