"""Tests for the STAGED r7 bigram language-model quality score
(queries/text_analysis.text_bigram_lm_score): hand-computed exact values
on a tiny planted corpus, plus the 3-scale DuckDB full-replay oracle
gate (driver replica run early, same pattern as the staged PQ/span
queries)."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_project_with_databricks_spark.queries.text_analysis import (
    TEXT_BIGRAM_LM_ORACLE,
    _LM_FP_SCALE,
    text_bigram_lm_score,
)


def test_bigram_lm_exact_hand_values(spark, tmp_path):
    """doc1 = 'x x x x' (3 transitions, all (x,x)); doc2 = 'x y x z'.
    Corpus counts: (x,x)=3, (x,y)=1, (y,x)=1, (x,z)=1; first-word
    totals: x=5, y=1.  Fixed-point probabilities are exact integer
    divisions, so the per-doc scores are pinned to the digit."""
    df = spark.createDataFrame(
        [(1, "x x x x", "en", "t", 7), (2, "x y x z", "en", "t", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r for r in text_bigram_lm_score(spark, str(tmp_path)).collect()
    }
    p_xx = (_LM_FP_SCALE * 3) // 5
    p_xy = (_LM_FP_SCALE * 1) // 5
    p_yx = (_LM_FP_SCALE * 1) // 1
    p_xz = (_LM_FP_SCALE * 1) // 5
    assert out[1].n_bigrams == 3
    assert out[1].lm_fp_sum == 3 * p_xx
    assert out[1].avg_prob_fp == p_xx
    assert out[2].n_bigrams == 3
    assert out[2].lm_fp_sum == p_xy + p_yx + p_xz
    assert out[2].avg_prob_fp == (p_xy + p_yx + p_xz) // 3


def test_bigram_lm_boilerplate_scores_full_scale(spark, tmp_path):
    """A corpus where every transition is deterministic (each first word
    has exactly one continuation) gives every document the maximum score
    SCALE — the boilerplate end of the quality dial."""
    df = spark.createDataFrame(
        [(1, "a b c a b c", "en", "t", 11), (2, "b c a b", "en", "t", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = text_bigram_lm_score(spark, str(tmp_path)).collect()
    assert len(out) == 2
    assert all(r.avg_prob_fp == _LM_FP_SCALE for r in out)


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_staged_text_bigram_lm_vs_oracle(spark, scale_dir: str) -> None:
    from tests.oracle import duckdb_connection, compare

    con = duckdb_connection(scale_dir)
    try:
        problems = compare(
            text_bigram_lm_score(spark, scale_dir), con, TEXT_BIGRAM_LM_ORACLE
        )
    finally:
        con.close()
    assert not problems, "; ".join(problems)
