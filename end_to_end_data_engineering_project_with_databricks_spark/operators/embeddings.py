"""Embedding-matrix moments: distributed Gram/covariance and PCA.

The standard embedding-hygiene step before indexing or clustering a
100 TB embedding corpus: estimate the second-moment (Gram) matrix
X^T X, derive the covariance, eigendecompose on the driver (d x d is
tiny — 64 x 64 here), and project every vector onto the top-k principal
components (whitening / dimensionality reduction for ANN recall).

Distribution shape (the only one that scales):
- the d x d moment matrix is an ASSOCIATIVE aggregate — every partition
  reduces its rows to one d x d partial (BLAS ``X.T @ X`` per Arrow
  batch inside ``mapInPandas``), and partials sum elementwise.  The
  shuffle carries d*(d+1)/2-ish rows per task, never a row per vector;
- the eigendecomposition is driver-side numpy over d x d — O(d^3) once,
  independent of corpus size (same stance as the k-means codebook
  trainer in operators/similarity.py);
- the projection back over the corpus is a narrow JVM map: k dot
  products against literal component arrays (functions/vectors.dot),
  whole-stage codegen, no Python in the per-row path.

Two Gram implementations, deliberately:
- :func:`gram_matrix_exact` — pure-JVM generate + fixed-point ``dsum``;
  order-independent and bit-equal to a DuckDB oracle, so the driver can
  hash-check it (queries/llm_curation.emb_gram_matrix).  Costs an
  n * d^2/2 row amplification through whole-stage codegen before the
  map-side partial agg;
- :func:`gram_partials` (used by :func:`pca_components`) — the
  throughput path: numpy/BLAS per Arrow batch, ~10-50x faster per flop,
  float-rounded in batch order (so NOT hash-stable — verified by recall
  tests instead, like the other ANN paths).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import dsum
from end_to_end_data_engineering_project_with_databricks_spark.functions.vectors import dot

if TYPE_CHECKING:
    import numpy as np


def gram_matrix_exact(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle Gram matrix ``G[i,j] = sum_rows(x_i * x_j)`` as
    (i, j, gram) rows, exact fixed-point sums (hash-checkable).

    Plan: cast to double once, chain two ``posexplode`` generates to
    emit the (i, j, x_i*x_j) upper triangle per row, then one hash
    aggregate with map-side partials — after partial aggregation each
    task ships at most d*(d+1)/2 rows regardless of corpus size.  The
    generate stage is the honest n*d^2/2 element cost of an exact
    cross-moment matrix; for model FITTING (where last-ulp determinism
    is not required) :func:`pca_components` does the same flops in
    BLAS, ~10-50x faster.

    The scan is widened (``scale_out``) before the generate: the d^2/2
    amplification makes this compute-bound, and a small parquet file
    would otherwise pin millions of generated rows on a handful of
    splits (measured 1.9 s -> 1.0 s at sf0.1 on local[32]; no-op at
    real scale where the scan already has enough splits).
    """
    from end_to_end_data_engineering_project_with_databricks_spark.operators.scaling import (
        scale_out,
    )

    v = scale_out(df).select(F.col(vec_col).cast("array<double>").alias("v"))
    first = v.select(F.posexplode("v").alias("i", "xi"), "v")
    pairs = first.select(
        "i", "xi", F.posexplode("v").alias("j", "xj")
    ).filter(F.col("j") >= F.col("i"))
    return pairs.groupBy("i", "j").agg(
        dsum(F.col("xi") * F.col("xj")).alias("gram")
    )


#: one partial-moment row per PARTITION: count, column sums, flattened Gram
_PARTIAL_SCHEMA = "n long, s array<double>, g array<double>"


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-partition second-moment partials via BLAS: each ``mapInPandas``
    partition folds all its Arrow batches into ONE (n, sum, X^T X) row,
    so downstream reduction cost scales with partition count, not row
    count."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n, s, g = 0, None, None
        for pdf in it:
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X if g is None else g + X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(batches, schema=_PARTIAL_SCHEMA)


def _reduce_partials(parts: DataFrame) -> tuple[int, "np.ndarray", "np.ndarray"]:
    """Sum the per-partition partials into (n, mean-sum vector, Gram).

    Elementwise array summation is expressed as posexplode + hash agg —
    the shuffle carries one row per (which, pos) slot per task, so the
    reduction stays flat no matter how many partitions contributed —
    and only the 1 + d + d^2 final cells are collected to the driver.

    The row count rides along as a third ``which`` slot (constant pos)
    so the whole reduction is ONE action — a second action here would
    re-run the expensive BLAS ``mapInPandas`` pass over the entire
    corpus (ADVICE r3)."""
    import numpy as np

    exploded = parts.select(
        F.posexplode("s").alias("pos", "val")
    ).withColumn("which", F.lit("s")).unionAll(
        parts.select(F.posexplode("g").alias("pos", "val")).withColumn(
            "which", F.lit("g")
        )
    ).unionAll(
        parts.select(
            F.lit(0).alias("pos"), F.col("n").cast("double").alias("val")
        ).withColumn("which", F.lit("n"))
    )
    sums = exploded.groupBy("which", "pos").agg(F.sum("val").alias("v")).collect()
    n = sum(r["v"] for r in sums if r["which"] == "n")
    s = {r["pos"]: r["v"] for r in sums if r["which"] == "s"}
    g = {r["pos"]: r["v"] for r in sums if r["which"] == "g"}
    d = len(s)
    svec = np.array([s[i] for i in range(d)])
    gmat = np.array([g[i] for i in range(d * d)]).reshape(d, d)
    return int(n), svec, gmat


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 4
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray", "np.ndarray"]:
    """Fit top-``k`` principal components over the full corpus.

    Covariance from the distributed moments (``C = G/n - mean mean^T``),
    eigendecomposition driver-side on the d x d matrix.  Components are
    sign-canonicalized (largest-|weight| element made positive) so the
    fit is deterministic run-to-run; eigenvalue order is descending.
    Returns (components k x d, explained variances k, mean d,
    per-dimension variances d — the covariance diagonal, used by the
    Rayleigh quality bound in emb_pca_quality)."""
    import numpy as np

    n, s, g = _reduce_partials(gram_partials(df, vec_col))
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean, np.diag(cov)


def pca_components(
    df: DataFrame, vec_col: str = "embedding", k: int = 4
) -> tuple["np.ndarray", "np.ndarray"]:
    """Back-compat face of :func:`pca_fit`: (components, variances)."""
    comps, vals, _, _ = pca_fit(df, vec_col, k)
    return comps, vals


def project(
    df: DataFrame, components: "np.ndarray", vec_col: str = "embedding"
) -> DataFrame:
    """Project every vector onto the fitted components: one JVM ``dot``
    against a literal component array per output dimension — narrow,
    codegen, no shuffle and no Python in the per-row path."""
    out = df
    for i, comp in enumerate(components):
        lit = F.array(*[F.lit(float(c)) for c in comp])
        out = out.withColumn(f"pc{i}", dot(F.col(vec_col), lit))
    return out.drop(vec_col)


def pca_quality_checks(
    df: DataFrame,
    comps: "np.ndarray",
    mean: "np.ndarray",
    top_dim_var: float,
    vec_col: str = "embedding",
) -> DataFrame:
    """Basis-independent invariants of a correct PCA fit, as one
    hash-checkable summary row (queries/llm_curation.emb_pca_quality):

    * ``pythagoras_ok`` — per row, ||proj||^2 + ||explicit residual||^2
      must equal ||x-mean||^2; fails unless ``comps`` is orthonormal
      (the residual is constructed, not derived by subtraction, so this
      is not an arithmetic identity);
    * ``rayleigh_ok`` — corpus explained variance >= ``top_dim_var``
      (the best coordinate projection); PCA maximizes over all rank-k
      projections, so a correct fit always clears it.

    One narrow JVM pass (literal arrays, whole-stage codegen) + one
    single-row aggregate; tolerances 1e-6 vs ~1e-13 float noise."""

    def arr(v) -> "F.Column":
        return F.array(*[F.lit(float(x)) for x in v])

    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), arr(mean), lambda a, b: a - b
    )
    out = df.select(centered.alias("c"))
    for i, comp in enumerate(comps):
        out = out.withColumn(f"p{i}", dot("c", arr(comp)))

    def _subtract_component(idx: int):
        return lambda a, b: a - F.col(f"p{idx}") * b

    resid = F.col("c")
    for i, comp in enumerate(comps):
        resid = F.zip_with(resid, arr(comp), _subtract_component(i))
    proj_sq = sum(F.col(f"p{i}") * F.col(f"p{i}") for i in range(len(comps)))
    out = out.select(
        proj_sq.alias("proj_sq"),
        dot("c", "c").alias("total_sq"),
        dot(resid, resid).alias("resid_sq"),
    )
    return out.agg(
        F.count("*").alias("n_rows"),
        (
            F.max(F.abs(F.col("proj_sq") + F.col("resid_sq") - F.col("total_sq")))
            <= F.lit(1e-6)
        ).alias("pythagoras_ok"),
        (
            (F.sum("proj_sq") / F.count("*")) >= F.lit(top_dim_var - 1e-6)
        ).alias("rayleigh_ok"),
    )


__all__ = [
    "gram_matrix_exact",
    "gram_partials",
    "pca_components",
    "pca_fit",
    "pca_quality_checks",
    "project",
]
