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
