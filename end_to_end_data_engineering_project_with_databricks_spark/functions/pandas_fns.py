"""Arrow-vectorized Python UDFs (the sanctioned slow path).

The reference has no UDFs at all — its Python functions are driver-side
orchestration (SURVEY.md §2.2 UDF row).  When an operator genuinely needs
Python, the scale rule is: Arrow-batched ``pandas_udf`` /
``applyInPandas``, never row-at-a-time ``udf`` — the serialization
boundary is then one Arrow batch per ~10k rows instead of one pickled
row per call (10-100x, SNIPPETS.md patterns).

Every function here uses exactness-safe arithmetic (integer counts,
single IEEE-754 ops on unreordered operands) so results stay bit-equal
with the DuckDB oracle despite crossing the Python boundary.
"""

from __future__ import annotations

import sys

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

try:
    # Module-level UDFs are cloudpickled BY REFERENCE (module + qualname),
    # which breaks when executors' Python workers can't import this
    # package (driver-only sys.path entry, no --py-files).  Registering
    # the module for by-value serialization ships the function bodies in
    # the task closure instead — the module is tiny, so the per-task cost
    # is negligible and the UDFs run on any worker.
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - older vendored cloudpickle
    pass


@pandas_udf(LongType())  # DataType instance: importable with no active session
def token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch.  Integer
    output — exact across engines."""
    return text.str.split(" ").str.len().astype("int64")


@pandas_udf(DoubleType())
def acctbal_range(bal: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDF: max - min of the group.  Both
    extrema are exact selections and the subtraction is a single IEEE
    op, so the result is bit-equal with SQL ``MAX(x) - MIN(x)``."""
    return float(bal.max() - bal.min())


def minmax_normalize(pdf: pd.DataFrame, value_col: str, out_col: str) -> pd.DataFrame:
    """Per-group min-max normalization for ``applyInPandas``: each value
    mapped to (x - min) / (max - min), NULL when the group is constant.
    Exact: extrema are selections; one subtraction + one division per
    row on identical operands in any engine."""
    lo, hi = pdf[value_col].min(), pdf[value_col].max()
    pdf = pdf.copy()
    pdf[out_col] = (pdf[value_col] - lo) / (hi - lo) if hi != lo else None
    return pdf


def arrow_audit_batches(batches):
    """RecordBatch -> RecordBatch transform for the mapInArrow audit
    query (queries/pandas_queries.arrow_batch_audit): zero-copy columnar
    kernels (utf8_length, equality) — no pandas conversion, no per-row
    Python.  Lives here so the module's pickle-by-value registration
    ships the body in the task closure (workers need no PYTHONPATH)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        utf8_len = pc.cast(pc.utf8_length(batch.column("text")), pa.int64())
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                utf8_len,
                pc.equal(utf8_len, batch.column("n_chars")),
            ],
            names=["doc_id", "utf8_len", "len_matches"],
        )
