"""Text-analysis operators: token counting, language ID, quality scoring,
document fingerprinting (BASELINE.json north star; targets the fixture
``documents`` table).

All pure ``pyspark.sql.functions`` expressions — these run inside
whole-stage codegen, and every one is mirrored exactly in the DuckDB
oracle SQL of queries/text_analysis.py (counts and single IEEE divisions
only, so doubles stay bit-equal cross-engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.textfns import (
    tokens,
)

#: Tiny per-language stopword lists for the heuristic language scorer.
#: Public common function words; intentionally small — language ID here is
#: a cheap n-gram/stopword heuristic, not a model.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "et", "les", "est", "un"),
    "zh": ("de", "shi", "le", "he"),
}

#: BPE-ish word-piece pattern: runs of letters, runs of digits, or a
#: single non-space symbol — a public regex approximation of byte-pair
#: pretokenization.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """How many tokens are in ``lang``'s stopword list."""
    return F.size(
        F.filter(tokens(text), lambda t: t.isin(*STOPWORDS[lang]))
    )


def language_scores(text: Column | str) -> dict[str, Column]:
    return {lang: stopword_hits(text, lang) for lang in STOPWORDS}


def predict_language(text: Column | str) -> Column:
    """Argmax over per-language stopword hits; 'und' (undetermined) when no
    list matches at all.  Ties break by language-code order — mirrored
    exactly in the oracle SQL's CASE chain."""
    scores = language_scores(text)
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(STOPWORDS):
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred.otherwise(F.lit("und"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic quality features: token count, mean token length,
    stopword ratio, alnum ratio.  All ratios are single IEEE divisions of
    exact integer counts."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = whitespace_token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    n_alnum = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", "")).cast("double")
    en_hits = stopword_hits(c, "en").cast("double")
    return {
        "n_tokens": n_tok,
        "mean_token_len": (n_chars - (n_tok - 1)) / n_tok,
        "stopword_ratio": en_hits / n_tok,
        "alnum_ratio": n_alnum / n_chars,
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1]-ish score: rewards stopword presence (fluency
    proxy) and plausible mean token length.  Arithmetic over exact counts
    -> cross-engine deterministic."""
    f = quality_features(text)
    len_term = 1.0 - F.least(
        F.abs(f["mean_token_len"] - F.lit(5.0)) / F.lit(5.0), F.lit(1.0)
    )
    stop_term = F.least(f["stopword_ratio"] * 4, F.lit(1.0))
    return (len_term + stop_term) / 2


#: Gopher rule stopwords (Rae et al. 2021, "Scaling Language Models",
#: appendix A1.1): a document must contain at least 2 of these.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Gopher rule thresholds: (min_words, max_words, min/max mean word len,
#: max symbol-to-word ratio, max bullet-start line fraction, max
#: ellipsis-end line fraction, min alphabetic-word fraction, min distinct
#: required stopwords).
GOPHER_BOUNDS = {
    "n_words": (50, 100_000),
    "mean_word_len": (3.0, 10.0),
    "symbol_ratio_max": 0.1,
    "bullet_line_frac_max": 0.9,
    "ellipsis_line_frac_max": 0.3,
    "alpha_word_frac_min": 0.8,
    "n_required_stopwords_min": 2,
}

#: Portable regexes (valid and identical in Java and RE2, no SQL-escape
#: differences — the PII-pattern convention from operators/curation.py).
_SYMBOL_RE = "[#…]|[.][.][.]"
_BULLET_RE = "^[ ]*[-*•]"
_ELLIPSIS_END_RE = "([.][.][.]|…)[ ]*$"
_ALPHA_RE = "[A-Za-z]"


def gopher_features(text: Column | str) -> dict[str, Column]:
    """Per-document Gopher quality-rule features (Rae et al. 2021 §A1.1,
    the rule set C4/RefinedWeb-style curation pipelines apply): word
    count, mean word length, symbol-to-word ratio (# and ellipses),
    bullet-start and ellipsis-end line fractions, alphabetic-word
    fraction, distinct required-stopword count.

    All JVM-side array/regex expressions (whole-stage codegen, no UDF);
    every ratio is one IEEE division of exact integer counts, so values
    are bit-equal to the DuckDB oracle mirror
    (queries/text_analysis.text_quality_gopher).  Completes the quality
    ladder next to :func:`quality_features` (generic fluency features)
    and operators/curation.repetition_stats (the Gopher repetition
    rules)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    lines = F.split(c, "\n")
    n_words_d = F.size(toks).cast("double")
    n_lines_d = F.size(lines).cast("double")
    n_chars = F.length(c).cast("double")
    return {
        "n_words": F.size(toks),
        "mean_word_len": (n_chars - (n_words_d - 1)) / n_words_d,
        "symbol_ratio": (
            F.size(F.regexp_extract_all(c, F.lit(_SYMBOL_RE), 0)).cast("double")
            / n_words_d
        ),
        "bullet_line_frac": (
            F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE))).cast("double")
            / n_lines_d
        ),
        "ellipsis_line_frac": (
            F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_RE))).cast("double")
            / n_lines_d
        ),
        "alpha_word_frac": (
            F.size(F.filter(toks, lambda w: w.rlike(_ALPHA_RE))).cast("double")
            / n_words_d
        ),
        "n_required_stopwords": F.size(
            F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
        ),
    }


def gopher_pass(feats: dict[str, Column]) -> Column:
    """AND of the Gopher rules over :func:`gopher_features` output."""
    b = GOPHER_BOUNDS
    return (
        feats["n_words"].between(*b["n_words"])
        & feats["mean_word_len"].between(*b["mean_word_len"])
        & (feats["symbol_ratio"] <= b["symbol_ratio_max"])
        & (feats["bullet_line_frac"] <= b["bullet_line_frac_max"])
        & (feats["ellipsis_line_frac"] <= b["ellipsis_line_frac_max"])
        & (feats["alpha_word_frac"] >= b["alpha_word_frac_min"])
        & (feats["n_required_stopwords"] >= b["n_required_stopwords_min"])
    )


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: xxhash64 chained over tokens
    (h = xxhash64(h, token)) — a rolling hash that distinguishes
    permutations, unlike the content-set fingerprints in dedup.py.
    Engine-specific hash family; :func:`polynomial_fingerprint` is the
    engine-neutral (oracle-checkable) twin."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )


#: Karp-Rabin parameters for :func:`polynomial_fingerprint`.  Mersenne
#: modulus 2^31-1 keeps every intermediate (acc*base + code < 2^39) well
#: inside a 64-bit long on both engines.
_POLY_MOD = 2_147_483_647
_CHAR_BASE = 31
_TOKEN_BASE = 131


def polynomial_fingerprint(text: Column | str) -> Column:
    """Order-sensitive Karp-Rabin fingerprint built ONLY from portable
    integer arithmetic: each token folds its character codes with Horner
    base 31, the document folds token codes with Horner base 131, both
    mod 2^31-1.  Same discrimination structure as the xxhash chain
    (permutations hash apart) but reproducible in any engine with
    higher-order list functions — the DuckDB oracle replays it with
    ``list_reduce``.  Whole expression is JVM codegen (nested
    ``aggregate`` over ``split``), no Python."""
    token_code = lambda t: F.aggregate(  # noqa: E731 - local expression builder
        F.split(t, ""),
        F.lit(0).cast("long"),
        lambda a, ch: (a * _CHAR_BASE + F.ascii(ch)) % _POLY_MOD,
    )
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda a, t: (a * _TOKEN_BASE + token_code(t)) % _POLY_MOD,
    )
