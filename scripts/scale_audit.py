#!/usr/bin/env python
"""Empirical scale-growth audit (VERDICT r7 item 2): replicate the
documents/embeddings fixtures k-fold with linearly-growing duplicate
structure (operators/scale_audit.py) and measure candidate volume for
the four quadratic-knob operators.  Prints one JSON line per (operator,
k) plus a fitted growth-exponent summary for pasting into docs/SCALE.md.

    python scripts/scale_audit.py                    # sf0.01, k=1,3,10,30
    SCALE_AUDIT_KS=1,4 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
        python scripts/scale_audit.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_engineering_project_with_databricks_spark.session import get_spark
from end_to_end_data_engineering_project_with_databricks_spark.operators.scale_audit import (
    growth_exponent,
    ivf_growth_stats,
    lsh_growth_stats,
    ppjoin_growth_stats,
    replicate_documents,
    replicate_embeddings,
    simhash_growth_stats,
    span_growth_stats,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    ks = [int(k) for k in os.environ.get("SCALE_AUDIT_KS", "1,3,10,30").split(",")]
    spark = get_spark(app_name="scale-audit")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    curves: dict[str, list[tuple[float, float]]] = {}

    def record(op: str, k: int, n: int, cand: int, stats: dict, secs: float) -> None:
        curves.setdefault(op, []).append((float(n), float(cand)))
        print(
            json.dumps(
                {"op": op, "k": k, "n": n, "candidates": cand,
                 "sec": round(secs, 2), **stats}
            ),
            flush=True,
        )

    for k in ks:
        rd = replicate_documents(docs, k).localCheckpoint(eager=True)
        re_ = replicate_embeddings(emb, k).localCheckpoint(eager=True)

        t0 = time.time()
        s = lsh_growth_stats(rd)
        record("lsh_banding", k, s["n_docs"], s["distinct_candidate_pairs"],
               s, time.time() - t0)

        t0 = time.time()
        s = ppjoin_growth_stats(rd)
        record("ppjoin_prefix", k, s["n_docs"], s["candidate_pairs"],
               s, time.time() - t0)

        t0 = time.time()
        s = span_growth_stats(rd)
        record("span_df_gated_grams", k, s["n_docs"], s["candidate_join_rows"],
               s, time.time() - t0)

        # fixed-band-width control: 4x15-bit SimHash bands collide by
        # birthday math once n ~ 2^15 — candidates grow superlinearly,
        # the exact Hamming check absorbs them (cost, not correctness)
        t0 = time.time()
        s = simhash_growth_stats(rd)
        record("simhash_fixed_15bit_bands", k, s["n_docs"],
               s["candidate_join_rows"], s, time.time() - t0)

        t0 = time.time()
        s = ivf_growth_stats(re_, n_cells=16 * k, trained=True)
        record("semdedup_scaled_cells", k, s["n_vecs"], s["within_cell_pairs"],
               s, time.time() - t0)

        t0 = time.time()
        s = ivf_growth_stats(re_, n_cells=16 * k, trained=False)
        record("knn_graph_scaled_cells", k, s["n_vecs"], s["within_cell_pairs"],
               s, time.time() - t0)

        # fixed-knob contrast: the documented-quadratic curve that shows
        # the n_cells knob (not luck) is what bounds the work
        t0 = time.time()
        s = ivf_growth_stats(re_, n_cells=16, trained=False)
        record("ivf_fixed_16_cells", k, s["n_vecs"], s["within_cell_pairs"],
               s, time.time() - t0)

    summary = {
        op: round(growth_exponent(pts), 3) for op, pts in curves.items()
    }
    print(json.dumps({"growth_exponents": summary, "sf_dir": sf_dir, "ks": ks}))


if __name__ == "__main__":
    main()
