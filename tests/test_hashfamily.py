"""Cross-engine identity of the md5-derived hash family.

Every dedup replay oracle (queries/dedup.py) rests on ONE invariant: the
Spark expressions and the DuckDB SQL generated from
functions/hashfamily.py produce bit-identical integers for the same
input strings.  This pins that invariant directly — on ASCII, unicode,
empty, and whitespace-edge inputs — so a drift in either engine's md5 /
conv / cast semantics fails here with a readable message instead of as
an opaque value-hash mismatch in a 200-line replay oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.hashfamily import (
    MERSENNE_P,
    MINHASH_A,
    MINHASH_B,
    SHINGLE_C,
    h60_duck,
    h60_spark,
    minhash_perm_duck,
    minhash_perm_spark,
)

SAMPLES = [
    "hello world",
    "",
    " ",
    "a",
    "the quick brown fox",
    "ümlaut tëst",
    "日本語のテキスト",
    "tab\tand:colon",
    "0",
    "repeated repeated repeated",
]


def test_constants_well_formed() -> None:
    assert len(MINHASH_A) == len(MINHASH_B) == 64
    assert all(1 <= a < MERSENNE_P for a in MINHASH_A)
    assert all(0 <= b < MERSENNE_P for b in MINHASH_B)
    assert len(SHINGLE_C) == 3
    assert all(1 <= c < MERSENNE_P for c in SHINGLE_C)
    # no-overflow guarantee: coefficient * (value < P) stays under 2^62
    assert max(max(MINHASH_A), max(SHINGLE_C)) * (MERSENNE_P - 1) < 2**62


def test_h60_and_perms_match_duckdb(spark) -> None:
    sp_h60 = h60_spark("s")
    sp_h31 = f"pmod({sp_h60}, {MERSENNE_P})"
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    sp = df.selectExpr(
        "s",
        sp_h60 + " AS h60",
        sp_h31 + " AS h31",
        minhash_perm_spark(0, sp_h31) + " AS p0",
        minhash_perm_spark(63, sp_h31) + " AS p63",
    ).collect()
    du_h60 = h60_duck("?")
    du_h31 = f"({du_h60} % {MERSENNE_P})"
    con = duckdb.connect()
    for r in sp:
        got = con.execute(
            f"SELECT {du_h60} AS h60, {du_h31} AS h31, "
            f"{minhash_perm_duck(0, du_h31)} AS p0, "
            f"{minhash_perm_duck(63, du_h31)} AS p63",
            [r.s, r.s, r.s, r.s],
        ).fetchone()
        assert (r.h60, r.h31, r.p0, r.p63) == got, f"drift on {r.s!r}"
        assert 0 <= r.h60 < 2**60


@pytest.mark.parametrize("text", ["a b c d e", "x y z"])
def test_shingle_combine_matches_duckdb(spark, text: str) -> None:
    """The positional token-combine (operators/dedup._hashed_shingle_docs)
    equals the oracle-side _HS_CTE replay for the same text."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        _hashed_shingle_docs,
    )

    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    [row] = _hashed_shingle_docs(df, "doc_id", "text", 3).collect()
    combine = " + ".join(
        f"({SHINGLE_C[j]} * ({h60_duck(f'toks[i+{j}]')} % {MERSENNE_P}))"
        f" % {MERSENNE_P}"
        for j in range(3)
    )
    duck = duckdb.connect().execute(
        f"""
        WITH docs AS (SELECT string_split(?, ' ') AS toks),
        pos AS (
          SELECT toks, unnest(generate_series(1, len(toks) - 2)) AS i
          FROM docs
        )
        SELECT DISTINCT ({combine}) % {MERSENNE_P} AS h FROM pos
        """,
        [text],
    ).fetchall()
    assert sorted(row._sh) == sorted(h for (h,) in duck)
