"""Round-14 optimization pins: the Arrow/NumPy within-cell scorers must
stay BIT-IDENTICAL to the JVM fold + join/window forms they replaced
(operators/similarity.knn_graph_within_cells /
threshold_pairs_within_cells) — including the (score DESC, id ASC)
tie-break and Spark's NaN-largest DESC ordering."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.vectors import (
    dot,
    l2_norm,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
    deterministic_centroids,
    ivf_assign,
    knn_graph_within_cells,
    threshold_pairs_within_cells,
)
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    load_table,
)


def _assigned(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_assign(e, deterministic_centroids(e, 16))


def _knn_join_reference(assigned, k=3):
    """The pre-r14 join + window formulation (hoisted norms)."""
    a = assigned.select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("src_vec"),
        l2_norm("embedding").alias("_sn"),
        "cell_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("nbr_vec"),
        l2_norm("embedding").alias("_nn"),
        "cell_id",
    )
    scored = (
        a.join(b, "cell_id")
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select(
            "src_id",
            "nbr_id",
            (dot("src_vec", "nbr_vec") / (F.col("_sn") * F.col("_nn"))).alias("score"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def test_knn_cell_scorer_bit_identical_to_join_window(spark, sf_dir):
    assigned = _assigned(spark, sf_dir)
    got = sorted(map(tuple, knn_graph_within_cells(assigned, k=3).collect()))
    ref = sorted(map(tuple, _knn_join_reference(assigned, k=3).collect()))
    assert got == ref  # including exact float64 score bits


def test_threshold_cell_scorer_bit_identical_to_join(spark, sf_dir):
    assigned = _assigned(spark, sf_dir)
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
        l2_norm("embedding").alias("_na"),
        "cell_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
        l2_norm("embedding").alias("_nb"),
        "cell_id",
    )
    ref = sorted(
        map(
            tuple,
            a.join(b, "cell_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                "cell_id",
                (dot("vec_a", "vec_b") / (F.col("_na") * F.col("_nb"))).alias("score"),
            )
            .filter(F.col("score") >= 0.35)
            .collect(),
        )
    )
    got = sorted(
        map(tuple, threshold_pairs_within_cells(assigned, threshold=0.35).collect())
    )
    assert got == ref


def test_cell_scorer_nan_orders_largest_like_spark_desc(spark):
    """A zero-norm vector makes every cosine against it 0/0 = NaN.  The
    pre-r14 JVM join form CRASHED on such inputs (ANSI DIVIDE_BY_ZERO —
    it never reached an ordering decision), while DuckDB's IEEE
    division yields NaN; the NumPy scorer follows the IEEE/oracle
    semantics and must order NaN LARGEST (Spark's DESC convention, via
    np.where(isnan, inf) before the lexsort) so that degenerate scores
    rank deterministically."""
    rows = [
        (0, [0.0] * 4, 7),
        (1, [1.0, 0.0, 0.0, 0.0], 7),
        (2, [0.9, 0.1, 0.0, 0.0], 7),
        (3, [0.0, 1.0, 0.0, 0.0], 7),
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cell_id long"
    )
    got = knn_graph_within_cells(assigned, k=2).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src_id, {})[r.rank] = r
    # every non-degenerate source ranks its NaN partner first
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        if src != 0:
            # NaN is ranked first; pandas->Arrow emits the NaN double
            # as NULL (pandas' float null sentinel), which only arises
            # on inputs the old form could not process at all
            assert ranks[1].nbr_id == 0 and ranks[1].score is None, ranks[1]
    # the zero vector's own scores are all NaN; ties broken by id asc
    assert [by_src[0][k].nbr_id for k in (1, 2)] == [1, 2]
