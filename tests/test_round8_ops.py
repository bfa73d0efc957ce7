"""Property tests for the round-8 queries (value-level checks beyond
the registry-wide DuckDB hash gate in test_queries_vs_oracle.py)."""

from __future__ import annotations

from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import (
    all_specs,
)


def test_bpe_iterative_properties(spark, sf_dir) -> None:
    rows = sorted(
        all_specs()["text_bpe_iterative"].fn(spark, sf_dir).collect(),
        key=lambda r: r.r,
    )
    assert [r.r for r in rows] == [1, 2, 3, 4]
    # every learned merge fired at least once, so the corpus shrinks
    # strictly every round
    toks = [r.corpus_tokens for r in rows]
    assert all(a > b for a, b in zip(toks, toks[1:])), toks
    # BPE merge counts are monotone non-increasing: a round can only
    # lower (or preserve) the count of any remaining pair, and any NEW
    # pair (x_y, z) inherits at most the old (y, z) count
    ns = [r.n for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns
    assert all(r.n >= 1 for r in rows)
    # round >= 2 must be able to build on earlier merges: pairs are in
    # re-encoded token space (merged atoms carry '_'), and the merge
    # applied in round 1 cannot still be the top pair verbatim unless it
    # genuinely survived re-encoding (non-overlap leftovers) — just pin
    # the output schema contract here
    assert set(rows[0].asDict()) == {"r", "pair", "n", "corpus_tokens"}


def test_quality_classifier_properties(spark, sf_dir) -> None:
    df = all_specs()["text_quality_classifier"].fn(spark, sf_dir)
    rows = df.collect()
    # the gate separates: both classes appear in the output
    kept = [r for r in rows if r.keep == 1]
    assert 0 < len(kept) < len(rows)
    # the classifier learned the label proxy: mean score of 'en' docs
    # exceeds mean score of the rest (it was trained to)
    en = [r.avg_score_fp for r in rows if r.lang == "en"]
    other = [r.avg_score_fp for r in rows if r.lang != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
    # keep decision is exactly the threshold on the emitted score
    assert all((r.avg_score_fp >= 1_000_000) == (r.keep == 1) for r in rows)


def test_quality_classifier_scoring_is_one_shuffle(spark, sf_dir) -> None:
    """Deploy shape: the model is an array literal, so scoring is one
    map-side-combinable hash-agg — a single Exchange, no join, and no
    Python boundary anywhere in the plan."""
    from end_to_end_data_engineering_project_with_databricks_spark.plans.inspect import (
        formatted_plan,
        shuffle_count,
    )

    for name in ("text_quality_classifier", "text_quality_classifier2"):
        df = all_specs()[name].fn(spark, sf_dir)
        assert shuffle_count(df) == 1, (name, formatted_plan(df))
        plan = formatted_plan(df)
        assert "Join" not in plan, (name, plan)
        assert "Pandas" not in plan and "PythonUDF" not in plan, name


def test_hnsw_search_routing_quality(spark, sf_dir) -> None:
    """The layered walk must route usefully: measure overlap of its
    top-5 against the exact brute-force top-5 per query.  The walk can
    legitimately settle in a neighboring cell (hub routing is noisier
    than centroid routing — see the docstring), so the bar is recall
    evidence, not exactness: every query returns exactly 5 ranked
    neighbors, a query that is its own corpus member finds itself at
    rank 1, and mean exact-top-5 overlap clears 1/2 (the r9 beam-width
    bar, VERDICT r8 item 3; sim_hnsw_recall_audit is the oracled
    driver-row twin of this measurement)."""
    from pyspark.sql import functions as F

    res = all_specs()["sim_hnsw_search"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rows in by_q.items():
        assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]
        ranked = sorted(rows, key=lambda r: r.rank)
        scores = [r.score for r in ranked]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        # vec_id < 8 queries are layer-1 members (0 % 8 == 0 only for 0,
        # but every query IS a corpus vector): if its own cell was
        # reached, self sits at rank 1 with score ~1.0
        if any(r.nbr_id == qid for r in rows):
            assert ranked[0].nbr_id == qid

    # exact truth via brute force over the full corpus
    from end_to_end_data_engineering_project_with_databricks_spark.functions.vectors import (
        cosine_similarity,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("c_vec"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("nbr_id")
    )
    exact = (
        q.crossJoin(c)  # bounded: 8-query broadcast exact baseline
        .withColumn("score", cosine_similarity("q_vec", "c_vec"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.nbr_id)
    overlap = [
        len(truth[qid] & {r.nbr_id for r in rows}) / 5.0
        for qid, rows in by_q.items()
    ]
    assert sum(overlap) / len(overlap) >= 0.5, overlap
