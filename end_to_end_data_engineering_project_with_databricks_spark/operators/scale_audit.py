"""Empirical scale-growth audit for the candidate-bounded operators
(VERDICT r7 item 2).

The dedup/ANN family's 100 TB viability rests on one claim: candidate
volume grows ~LINEARLY with corpus size because every pair generator is
bucketed (LSH bands, PPJoin prefixes, IVF cells).  Through round 7 that
claim was argued by plan shape (no cartesian nodes, equi-join keys) but
never MEASURED beyond sf0.1.  This module turns the argument into
evidence: build k-times-larger corpora whose true duplicate structure
grows linearly by construction, run exactly the candidate stages the
production operators run, and fit the growth exponent.

Replication design — why the measurement is honest:

- ``replicate_documents``: replica ``r`` suffixes every non-hub token
  with ``r<r>``, so replicas share NO shingles except all-hub-token
  grams ("the a the ...") — the hub/stop-gram collisions a real corpus
  has are PRESERVED across replicas (they are exactly the quadratic
  hazard prefix filtering and rarest-first ordering must survive),
  while the true near-dup clusters stay replica-local.  Truth pairs
  therefore grow exactly k-fold; any super-linear candidate growth is
  the algorithm's, not the data's.  Replica 0 keeps the original text,
  so k=1 is the unmodified corpus.
- ``replicate_embeddings``: replica ``r`` circularly shifts each vector
  by ``r`` positions — an orthogonal transform, so WITHIN-replica
  cosine structure is preserved exactly while cross-replica cosines
  decorrelate (the fixture vectors carry no shift symmetry).
- ids interleave (``id*k + r``) rather than stride, so id-prefix
  samples (``lloyd_kmeans_fixed``'s ``id < sample_bound`` scan filter,
  ``deterministic_centroids``'s lowest-id seeds) span all replicas the
  way a uniform sample of a genuinely larger corpus would.

Knob-scaling protocol (what the audit grades): the published recipes
grow the bucket count with the corpus — SemDeDup/IVF scale ``n_cells``
proportionally to N, LSH keeps band width fixed (bucket count grows
with the hash space for free), PPJoin prefixes scale per-document.  The
audit therefore measures IVF-family candidates with ``n_cells = base*k``
— the knob a 100 TB deployment would actually turn — and additionally
records the FIXED-knob curve, which is expected (and documented in
docs/SCALE.md) to be quadratic: per-cell occupancy grows k-fold, pairs
k-squared.  The measured contrast is the evidence that the knob, not
luck, is what bounds the work.

Everything here is audit tooling: the ``.collect()``/``.count()`` calls
aggregate a handful of stat rows, never corpus rows, but the module is
deliberately NOT a registry query — it exists for scripts/scale_audit.py
and tests/test_scale_growth.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.textfns import (
    tokens,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
    jaccard_prefix_candidate_pairs,
    lsh_band_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.scaling import (
    scale_out,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
    _vector_dim,
    deterministic_centroids,
    ivf_assign,
    lloyd_kmeans_fixed,
)

#: Tokens left UNTAGGED across replicas: the fixture vocabulary's
#: stop-token analogues.  Grams made only of these collide across all k
#: replicas — the deliberate hub-shingle hazard.
HUB_TOKENS: tuple[str, ...] = ("the", "a")


def _with_replica_spine(df: DataFrame, k: int) -> DataFrame:
    """Broadcast crossJoin against the k-row replica spine — the
    standard bounded-dimension spine join (never a data-x-data
    cartesian; k <= ~100 by construction)."""
    spark = df.sparkSession
    spine = F.broadcast(
        spark.range(int(k)).select(F.col("id").cast("int").alias("_rep"))
    )
    return df.crossJoin(spine)


def replicate_documents(
    df: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """k-fold corpus replica with linearly-growing duplicate structure.

    Replica r > 0 rewrites every non-hub token ``t -> t + 'r' + r`` (a
    pure JVM transform over the token array), so its shingle sets are
    disjoint from every other replica's except all-hub grams; replica 0
    is byte-identical to the input.  New id = ``id*k + r`` (interleaved,
    collision-free for dense non-negative ids)."""
    rep = _with_replica_spine(df, k)
    tag = F.concat(F.lit("r"), F.col("_rep").cast("string"))
    tagged = F.concat_ws(
        " ",
        F.transform(
            tokens(text_col),
            lambda t: F.when(t.isin(*HUB_TOKENS), t).otherwise(F.concat(t, tag)),
        ),
    )
    return rep.select(
        (F.col(id_col) * k + F.col("_rep")).alias(id_col),
        F.when(F.col("_rep") == 0, F.col(text_col)).otherwise(tagged).alias(text_col),
    )


def replicate_embeddings(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """k-fold embedding replica: replica r circularly shifts each vector
    by r positions (orthogonal — norms and within-replica cosines are
    exactly preserved; cross-replica cosines decorrelate).  Requires
    k <= dim so all shifts are distinct.  New id = ``id*k + r``."""
    dim = _vector_dim(df, vec_col)
    if k > dim:
        raise ValueError(f"k={k} exceeds vector dim {dim}: shifts would repeat")
    rep = _with_replica_spine(df, k)
    shift = F.col("_rep") % dim
    shifted = F.concat(
        F.slice(F.col(vec_col), shift + 1, F.lit(dim) - shift),
        F.slice(F.col(vec_col), F.lit(1), shift),
    )
    return rep.select(
        (F.col(id_col) * k + F.col("_rep")).alias(id_col),
        shifted.alias(vec_col),
    )


def lsh_growth_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 16,
    rows_per_band: int = 4,
) -> dict:
    """Candidate-volume stats for the MinHash-LSH banding pipeline:
    distinct candidate pairs (what the verify pays), raw bucket join
    rows sum(occ*(occ-1)/2) (what the shuffle pays), and the max band-
    bucket occupancy (the skew hazard)."""
    sigs = minhash_signatures(
        docs, id_col, text_col, num_hashes=bands * rows_per_band
    )
    buckets = lsh_band_buckets(sigs, id_col, bands, rows_per_band)
    occ = buckets.groupBy("band", "bh").agg(F.count("*").alias("occ"))
    row = occ.agg(
        F.max("occ").alias("max_bucket"),
        F.sum(F.col("occ") * (F.col("occ") - 1) / 2).alias("join_rows"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]
    return {
        "n_docs": docs.count(),
        "max_bucket": int(row["max_bucket"]),
        "candidate_join_rows": int(row["join_rows"]),
        "n_buckets": int(row["n_buckets"]),
        "distinct_candidate_pairs": lsh_candidate_pairs(
            sigs, id_col, bands, rows_per_band
        ).count(),
    }


def ppjoin_growth_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 3,
) -> dict:
    """Candidate-volume stats for the PPJoin prefix filter: distinct
    candidate pairs entering the exact verify."""
    cand = jaccard_prefix_candidate_pairs(docs, id_col, text_col, threshold, k)
    return {
        "n_docs": docs.count(),
        "candidate_pairs": cand.count(),
    }


def ivf_growth_stats(
    emb: DataFrame,
    n_cells: int,
    trained: bool,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_factor: int = 16,
) -> dict:
    """Cell-occupancy stats for the IVF family (SemDeDup within-cell
    pairs, k-NN graph single-probe candidates).  Candidate volume is
    EXACTLY sum(occ*(occ-1)/2) over cells — determined by occupancy, so
    the audit never needs to materialize the pair join itself.
    ``trained=True`` uses the fixed-point Lloyd codebook (the SemDeDup
    path, sample_bound scaled ``sample_factor`` x n_cells so the fit
    sample stays an order denser than the cells — the O(sample x cells)
    fit cost is the knob the test trims); ``False`` uses deterministic
    lowest-id seeds (the sim_knn_graph path)."""
    if trained:
        cents = lloyd_kmeans_fixed(
            emb,
            n_cells=n_cells,
            iters=2,
            sample_bound=sample_factor * n_cells,
            id_col=id_col,
            vec_col=vec_col,
        )
    else:
        cents = deterministic_centroids(emb, n_cells, id_col, vec_col)
    assigned = ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col)
    occ = assigned.groupBy("cell_id").agg(F.count("*").alias("occ"))
    row = occ.agg(
        F.max("occ").alias("max_cell"),
        F.sum(F.col("occ") * (F.col("occ") - 1) / 2).alias("pairs"),
        F.count("*").alias("n_occupied"),
    ).collect()[0]
    return {
        "n_vecs": emb.count(),
        "n_cells": n_cells,
        "max_cell": int(row["max_cell"]),
        "within_cell_pairs": int(row["pairs"]),
        "n_occupied_cells": int(row["n_occupied"]),
    }


def growth_exponent(points: list[tuple[float, float]]) -> float:
    """Least-squares slope in log-log space: candidates ~ N**exponent.
    1.0 = linear, 2.0 = quadratic.  Zero-candidate points are clamped to
    1 so an empty small-k measurement cannot produce -inf."""
    xs = [math.log(max(n, 1.0)) for n, _ in points]
    ys = [math.log(max(c, 1.0)) for _, c in points]
    n = len(points)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return 0.0
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def simhash_growth_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Band-bucket stats for the SimHash 4x15-bit banded Hamming join
    (the simhash_near_dups configuration).  Unlike LSH bands (hashes of
    a signature slice — an effectively unbounded key space), a 15-bit
    band VALUE space holds only 32,768 buckets per band, so random
    birthday collisions make the candidate stream grow ~quadratically
    once n approaches 2^bits_per_band — the audit MEASURES that knee so
    docs/SCALE.md can state when ``bits_per_band`` must widen with the
    corpus.  The verified output (Hamming <= 3) stays linear: two
    random 60-bit fingerprints sit ~30 bits apart, so birthday
    candidates die in the exact check — cost, not correctness."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        _h60,
        hamming_band_buckets,
        simhash64,
        simhash_near_dups,
    )

    hashed = scale_out(docs).select(
        F.col(id_col).alias("_id"),
        F.transform(tokens(text_col), _h60).alias("_th"),
    )
    fp = hashed.select("_id", simhash64("_th", n_bits=60).alias("fp"))
    occ = hamming_band_buckets(fp, "_id", "fp", bits_per_band=15).groupBy(
        "band", "bv"
    ).agg(F.count("*").alias("occ"))
    row = occ.agg(
        F.max("occ").alias("max_bucket"),
        F.sum(F.col("occ") * (F.col("occ") - 1) / 2).alias("join_rows"),
    ).collect()[0]
    return {
        "n_docs": docs.count(),
        "max_bucket": int(row["max_bucket"]),
        "candidate_join_rows": int(row["join_rows"]),
        "verified_pairs": simhash_near_dups(docs, id_col, text_col).count(),
    }


def span_growth_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_k: int = 8,
    max_df: int = 64,
) -> dict:
    """df-gated gram-join stats for the duplicated-spans operator: the
    positional-gram equi-join shuffles sum(m*(m-1)/2) rows over grams
    whose document frequency passes the 2..max_df gate (m = the gram's
    total positions).  Also counts the verified output spans — both
    should track the corpus' (linear) duplicate structure."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        duplicated_spans,
        span_gram_positions,
    )

    grams = span_gram_positions(docs, id_col, text_col, gram_k)
    per_gram = grams.groupBy("gh").agg(
        F.count("*").alias("m"), F.count_distinct("_id_").alias("df")
    )
    gated = per_gram.filter((F.col("df") >= 2) & (F.col("df") <= max_df))
    row = gated.agg(
        F.max("m").alias("max_m"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("join_rows"),
        F.count("*").alias("n_gated_grams"),
    ).collect()[0]
    return {
        "n_docs": docs.count(),
        "max_gram_positions": int(row["max_m"] or 0),
        "candidate_join_rows": int(row["join_rows"] or 0),
        "n_gated_grams": int(row["n_gated_grams"]),
        "verified_spans": duplicated_spans(
            docs, id_col, text_col, gram_k=gram_k, max_df=max_df
        ).count(),
    }
