"""PySpark-native analytics engine with the capability surface of the
reference ETL project (``/root/reference``), rebuilt Spark-first.

The reference (LeeJihyun99/End-to-End-Data-Engineering-Project-with-Databricks)
is a Databricks notebook ETL: REST extract -> raw JSON landing -> explode/
flatten transform -> left-anti-join idempotent Delta append
(ETL_pipeline_countries.py:144-147).  This package re-expresses that surface —
plus the full relational operator inventory in SURVEY.md §2 and the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) — as a library of composable PySpark operators.

Design stance (SURVEY.md §7): DataFrame/SQL declarative plans, Catalyst as the
optimizer, Parquet/Delta as storage.  No custom planner rules; no RDDs.
"""

from end_to_end_data_engineering_project_with_databricks_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
