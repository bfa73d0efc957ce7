"""Heavy-hitter (frequent-item) detection with bounded memory.

The exact way to find items with frequency >= s*N is a full hash
aggregate — fine when the key cardinality fits the shuffle, which at
100 TB of tokens/URLs/user-ids it may not.  The streaming-algorithms
answer is **Misra-Gries**: a fixed-size counter summary per partition
whose candidate set is guaranteed to contain EVERY item above the
support threshold (misses are impossible; only false candidates occur).

Two-pass exact pipeline (the standard production shape):

1. **Candidate pass** — ``mapInPandas`` runs a k-counter Misra-Gries
   summary over each partition (k > 1/support; memory O(k) per task
   regardless of partition cardinality) and emits only the surviving
   candidate keys.  The union of per-partition candidates is a superset
   of the global heavy hitters: if an item's global frequency is >= s,
   its LOCAL frequency is >= s in at least one partition (the global
   frequency is the n_p-weighted average of local ones), i.e. its local
   count exceeds n_p * s > n_p / k there — and Misra-Gries guarantees
   any item with local count > n_p/k still holds a counter at
   end-of-stream.  Misses are therefore impossible for any partitioning,
   balanced or not; only false candidates occur.
2. **Exact recount** — one aggregation of the raw stream SEMI-JOINED to
   the (tiny, broadcast) candidate set, then the exact ``>= s*N``
   filter.  False candidates drop out here, so the final result is
   EXACT — which is why the registry query carries a full value-hash
   DuckDB oracle even though pass 1 is a sketch.

Cost shape: pass 1 is a narrow map (no shuffle); pass 2 shuffles only
rows whose key is a candidate (|candidates| <= partitions * k keys).
The full-cardinality shuffle of the naive GROUP BY never happens.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """Per-partition k-counter Misra-Gries summaries -> distinct
    candidate keys.  Guarantees: every item with count > n_p/k in some
    partition p appears; at most k keys emitted per partition."""
    import pandas as pd

    def summarize(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for pdf in it:
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {df.schema[key_col].dataType.simpleString()}"
    ).distinct()


def heavy_hitters_exact(
    df: DataFrame, key_col: str, support: float
) -> DataFrame:
    """All keys with frequency >= ``support`` * N, with EXACT counts —
    sketch-pruned (pass 1) then exactly recounted (pass 2); see module
    docstring.  Returns (key, n, total_n) so the caller can derive the
    frequency with one division."""
    if not 0 < support <= 1:
        raise ValueError("support must be in (0, 1]")
    k = max(2, int(1.0 / support) + 1)
    cands = misra_gries_candidates(df, key_col, k)
    total = df.select(F.count("*").alias("_N"))
    counted = (
        df.select(key_col)
        .join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.col("_N") * F.lit(support))
        .select(key_col, "n", F.col("_N").alias("total_n"))
    )
