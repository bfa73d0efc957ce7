"""Country dimension.

The reference ships a 230-row static Python list of (iso_code, name) tuples
in a notebook (countries.py:2-233) pulled in via ``%run ./countries``
(ETL_pipeline_countries.py:6) and consumed only by ``random.choice``.  We
keep the same shape but (a) as an importable module, not notebook magic,
and (b) promoted to a real Spark dimension table so it can participate in
joins — SURVEY.md §1.1 row 5.

The list here is an independent selection of well-known ISO 3166-1 alpha-2
pairs (public standard), not a copy of the reference's data.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

#: (iso_alpha2_code, english_short_name)
COUNTRIES: list[tuple[str, str]] = [
    ("AR", "Argentina"),
    ("AU", "Australia"),
    ("AT", "Austria"),
    ("BE", "Belgium"),
    ("BR", "Brazil"),
    ("CA", "Canada"),
    ("CL", "Chile"),
    ("CN", "China"),
    ("CO", "Colombia"),
    ("CZ", "Czechia"),
    ("DK", "Denmark"),
    ("EG", "Egypt"),
    ("FI", "Finland"),
    ("FR", "France"),
    ("DE", "Germany"),
    ("GR", "Greece"),
    ("HU", "Hungary"),
    ("IN", "India"),
    ("ID", "Indonesia"),
    ("IE", "Ireland"),
    ("IL", "Israel"),
    ("IT", "Italy"),
    ("JP", "Japan"),
    ("KE", "Kenya"),
    ("KR", "South Korea"),
    ("MX", "Mexico"),
    ("MA", "Morocco"),
    ("NL", "Netherlands"),
    ("NZ", "New Zealand"),
    ("NG", "Nigeria"),
    ("NO", "Norway"),
    ("PE", "Peru"),
    ("PH", "Philippines"),
    ("PL", "Poland"),
    ("PT", "Portugal"),
    ("RO", "Romania"),
    ("SA", "Saudi Arabia"),
    ("SG", "Singapore"),
    ("ZA", "South Africa"),
    ("ES", "Spain"),
    ("SE", "Sweden"),
    ("CH", "Switzerland"),
    ("TH", "Thailand"),
    ("TR", "Turkey"),
    ("UA", "Ukraine"),
    ("AE", "United Arab Emirates"),
    ("GB", "United Kingdom"),
    ("US", "United States"),
    ("UY", "Uruguay"),
    ("VN", "Vietnam"),
]


def pick_keyword(seed: int | None = None) -> tuple[str, str]:
    """Uniform random (code, name) pick — parity with
    ``random.choice(countries)`` (ETL_pipeline_countries.py:10-13), but
    seedable: the reference is unseeded, which makes runs unreproducible
    (SURVEY.md §3.1 step 3); tests pass a seed."""
    rng = random.Random(seed)
    return rng.choice(COUNTRIES)


def countries_dimension(spark: SparkSession) -> DataFrame:
    """The list as a proper broadcast-sized dimension table."""
    return spark.createDataFrame(COUNTRIES, "code string, name string")
