from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from end_to_end_data_engineering_project_with_databricks_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    sql_cosine,
)
from end_to_end_data_engineering_project_with_databricks_spark.functions.textfns import (
    tokens,
)

__all__ = [
    "davg",
    "dsum",
    "sql_davg",
    "sql_dsum",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "sql_cosine",
    "tokens",
]
