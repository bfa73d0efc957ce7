"""Text-analysis query surface over ``documents`` (operators/text.py).

Every heuristic is mirrored expression-for-expression in the oracle SQL:
integer counts + single IEEE divisions keep doubles bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.functions.numeric import (
    davg,
    sql_davg,
)
from end_to_end_data_engineering_project_with_databricks_spark.functions.textfns import (
    fingerprint,
    tokens,
)
from end_to_end_data_engineering_project_with_databricks_spark.operators.text import (
    STOPWORDS,
    TOKEN_REGEX,
    predict_language,
    quality_features,
    quality_score,
    regex_token_count,
    polynomial_fingerprint,
    rolling_fingerprint,
    whitespace_token_count,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({words})))"
    )


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS n_bpe_tokens
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    pretokenizer (letters | digits | single symbol)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        whitespace_token_count("text").alias("n_ws_tokens"),
        regex_token_count("text").alias("n_bpe_tokens"),
    )


@query(
    "text_language_profile",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs,
           {sql_davg('n_chars')} AS avg_chars,
           {sql_davg("len(string_split(text, ' '))")} AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "agg"),
)
def text_language_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (doc counts, size distributions)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        davg(F.size(tokens("text"))).alias("avg_tokens"),
    )


_LANG_CASE = " ".join(
    f"WHEN {_sql_hits(lang)} = best THEN '{lang}'" for lang in sorted(STOPWORDS)
)


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             greatest({', '.join(_sql_hits(lang) for lang in sorted(STOPWORDS))}) AS best,
             text
      FROM documents
    )
    SELECT CASE WHEN best = 0 THEN 'und' {_LANG_CASE} ELSE 'und' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1
    """,
    tags=("text", "agg"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (argmax over per-language hit counts,
    alphabetical tie-break) aggregated to predicted-language counts.
    A cheap heuristic by design — the operator shape (score -> argmax ->
    profile) is what a real n-gram model slots into."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(predict_language("text").alias("predicted_lang")).agg(
        F.count("*").alias("n_docs")
    )


_SQL_NTOK = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
_SQL_MEANLEN = f"((CAST(length(text) AS DOUBLE) - ({_SQL_NTOK} - 1)) / {_SQL_NTOK})"
_SQL_STOPR = f"(CAST({_sql_hits('en')} AS DOUBLE) / {_SQL_NTOK})"
_SQL_SCORE = (
    f"(((1.0 - least(abs({_SQL_MEANLEN} - 5.0) / 5.0, 1.0)) + "
    f"least({_SQL_STOPR} * 4, 1.0)) / 2)"
)


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           {_SQL_NTOK} AS n_tokens,
           {_SQL_MEANLEN} AS mean_token_len,
           {_SQL_STOPR} AS stopword_ratio,
           {_SQL_SCORE} AS quality
    FROM documents
    WHERE doc_id < 150
    """,
    tags=("text",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: token count, mean token length,
    stopword ratio, composite score — the filter stage of a training-data
    pipeline (keep score >= threshold)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    feats = quality_features("text")
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


@query(
    "text_term_frequency",
    oracle="""
    SELECT token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 30
    """,
    tags=("text", "agg", "topk"),
    bench=True,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top 30: explode -> hash agg -> top-k.  The
    explode is a narrow map; the agg shuffles one row per distinct term
    per partition (map-side combine)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(30)
    )


@query(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(text)) AS content_fp,
           list_min(list_transform(string_split(text, ' '), t -> md5(t))) AS min_token_fp
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("text", "dedup"),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-content md5 + min-token-md5 (a 1-hash
    MinHash — the set-sensitive variant).  The order-sensitive rolling
    fingerprint is text_rolling_fingerprint (Karp-Rabin, fully
    oracle-checked)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        fingerprint("text").alias("content_fp"),
        F.array_min(F.transform(tokens("text"), lambda t: F.md5(t))).alias(
            "min_token_fp"
        ),
    )


@query(
    "text_rolling_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT), list_transform(
               string_split(text, ' '),
               t -> list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                              list_transform(string_split(t, ''),
                                             ch -> CAST(ord(ch) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 2147483647))),
             (a, b) -> (a * 131 + b) % 2147483647) AS rolling_fp
    FROM documents
    """,
    tags=("text", "dedup"),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling (Karp-Rabin) fingerprint: distinguishes
    permuted near-dups that set-based fingerprints merge.  Uses the
    engine-neutral polynomial hash (Horner over chars then tokens, mod
    2^31-1) so the chain is replayed exactly by the DuckDB oracle's
    ``list_reduce`` — this upgraded the query from the rows-only gate
    to a full value-hash check; the xxhash64-chain variant
    (operators/text.rolling_fingerprint) remains for engine-internal
    use where oracle portability doesn't matter."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", polynomial_fingerprint("text").alias("rolling_fp"))


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE lang IN ('en', 'de', 'fr')
        AND n_chars BETWEEN 50 AND 10000
        AND len(string_split(text, ' ')) >= 5
    ),
    deduped AS (
      SELECT text, lang, MIN(doc_id) AS canonical_id,
             COUNT(*) AS n_copies, MIN(n_tokens) AS n_tokens
      FROM filtered
      GROUP BY text, lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_dups_removed,
           {sql_davg('n_tokens')} AS avg_tokens
    FROM deduped
    GROUP BY lang
    """,
    tags=("pipeline", "dedup", "text"),
    bench=True,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation, composed from the engine's own
    operators: language filter -> quality gate (length + token count) ->
    exact content dedup (keep min doc_id) -> per-language corpus stats.

    The composed plan is exactly what a 100 TB curation run needs: all
    filters push to the scan, the dedup groupBy is the only wide op over
    the full corpus (keyed on (text, lang) so hot languages spread by
    content), and the stats aggregate runs on one row per distinct
    document.  Exact ops only, so the whole pipeline carries a full
    DuckDB oracle; the fuzzy stage (MinHash-LSH) chains after this in
    practice and is verified separately (dedup_minhash_lsh)."""
    d = load_table(spark, sf_dir, "documents")
    filtered = d.filter(
        F.col("lang").isin("en", "de", "fr")
        & F.col("n_chars").between(50, 10000)
        & (F.size(tokens("text")) >= 5)
    ).withColumn("n_tokens", F.size(tokens("text")))
    deduped = filtered.groupBy("text", "lang").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_copies") - F.count("*")).cast("long").alias("n_dups_removed"),
        davg("n_tokens").alias("avg_tokens"),
    )


@query(
    "text_tfidf_distinctive_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.token,
             CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
             CAST(tf.tf AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (token)
      WHERE tf.doc_id < 50
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, token
             ) AS BIGINT) AS rnk
      FROM scored
    )
    SELECT doc_id, token, tf, df, score, rnk FROM ranked WHERE rnk <= 3
    """,
    tags=("text", "tfidf", "window", "topk"),
)
def text_tfidf_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style distinctive terms: top-3 terms per document scored by
    tf/df.  The score is a single IEEE double division (no logarithm),
    so it is bit-identical across engines — ln-based IDF would differ in
    the last ulp between libm implementations and break the value hash;
    the tf/df ratio preserves the exact same ranking for this use.

    Scale: document frequency must aggregate the FULL corpus while
    scoring is restricted to the query docs — the doc_id filter pushes
    through the tf aggregation (it is a grouping key) so only the df
    branch pays a full-corpus shuffle, and the tf-df join shuffles on
    token (never broadcast: vocabulary grows with corpus size)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(df_t, "token")
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("tf").cast("double") / F.col("df")).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


def _gopher_oracle() -> str:
    """DuckDB mirror of operators/text.gopher_features + gopher_pass —
    same counts, same single IEEE divisions, same inclusive bounds."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.text import (
        _ALPHA_RE,
        _BULLET_RE,
        _ELLIPSIS_END_RE,
        _SYMBOL_RE,
        GOPHER_BOUNDS,
        GOPHER_STOPWORDS,
    )

    b = GOPHER_BOUNDS
    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    WITH f AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS nw,
        CAST(len(string_split(text, chr(10))) AS DOUBLE) AS nl,
        CAST(length(text) AS DOUBLE) AS nc,
        CAST(len(regexp_extract_all(text, '{_SYMBOL_RE}')) AS DOUBLE) AS nsym,
        CAST(len(list_filter(string_split(text, chr(10)),
                             l -> regexp_matches(l, '{_BULLET_RE}'))) AS DOUBLE) AS nbul,
        CAST(len(list_filter(string_split(text, chr(10)),
                             l -> regexp_matches(l, '{_ELLIPSIS_END_RE}'))) AS DOUBLE) AS nell,
        CAST(len(list_filter(string_split(text, ' '),
                             w -> regexp_matches(w, '{_ALPHA_RE}'))) AS DOUBLE) AS nalpha,
        CAST(len(list_intersect(string_split(text, ' '), [{stop}])) AS INT)
          AS n_required_stopwords
      FROM documents
    )
    SELECT doc_id, n_words,
      (nc - (nw - 1)) / nw AS mean_word_len,
      nsym / nw AS symbol_ratio,
      nbul / nl AS bullet_line_frac,
      nell / nl AS ellipsis_line_frac,
      nalpha / nw AS alpha_word_frac,
      n_required_stopwords,
      (n_words BETWEEN {b["n_words"][0]} AND {b["n_words"][1]})
        AND ((nc - (nw - 1)) / nw BETWEEN {b["mean_word_len"][0]} AND {b["mean_word_len"][1]})
        AND nsym / nw <= {b["symbol_ratio_max"]}
        AND nbul / nl <= {b["bullet_line_frac_max"]}
        AND nell / nl <= {b["ellipsis_line_frac_max"]}
        AND nalpha / nw >= {b["alpha_word_frac_min"]}
        AND n_required_stopwords >= {b["n_required_stopwords_min"]} AS passes
    FROM f
    """


@query(
    "text_quality_gopher",
    oracle=_gopher_oracle(),
    tags=("text", "quality", "curation"),
)
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher quality-rule pack (Rae et al. 2021 §A1.1) per
    document: word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, bullet-start / ellipsis-end line fractions, alphabetic-word
    fraction, required-stopword presence — plus the AND-of-all-rules
    ``passes`` verdict used as a pre-dedup corpus filter.

    One narrow projection over the corpus scan (no shuffle, no UDF, all
    whole-stage codegen) — at 100 TB this pipelines with the read and is
    I/O-bound, which is exactly what a first-pass quality gate must be.
    Line-based rules are exercised on constructed multi-line docs in
    tests/test_curation_ops.py (the fixture corpus is single-line)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.text import (
        gopher_features,
        gopher_pass,
    )

    d = load_table(spark, sf_dir, "documents")
    feats = gopher_features("text")
    return d.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["symbol_ratio"].alias("symbol_ratio"),
        feats["bullet_line_frac"].alias("bullet_line_frac"),
        feats["ellipsis_line_frac"].alias("ellipsis_line_frac"),
        feats["alpha_word_frac"].alias("alpha_word_frac"),
        feats["n_required_stopwords"].alias("n_required_stopwords"),
        gopher_pass(feats).alias("passes"),
    )


@query(
    "text_zipf_token_share",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT token, COUNT(*) AS freq FROM tok WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT token, freq,
             CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
             SUM(freq) OVER (ORDER BY freq DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_freq,
             SUM(freq) OVER () AS total
      FROM tf
    )
    SELECT token, freq, rank,
           CAST(cum_freq AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
    FROM ranked
    WHERE rank <= 100
    """,
    tags=("text", "window", "agg", "tokenizer"),
)
def text_zipf_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head analysis for tokenizer/vocabulary design: corpus term
    frequencies ranked, with each rank's CUMULATIVE share of all token
    occurrences — the "how much of the corpus do the top-k tokens
    cover" curve that sizes a vocabulary.

    Shape: explode -> one hash agg on token -> a single global-ordered
    window over the AGGREGATED term table.  The window's input is the
    vocabulary (~1e6 rows at any corpus size), not the corpus, so the
    single-partition global sort is bounded no matter how many tokens
    the corpus has; integer cum/total with one final IEEE division keeps
    the doubles bit-equal to the oracle."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    ranked = tf.select(
        "token",
        "freq",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_freq"),
        F.sum("freq").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    return ranked.filter(F.col("rank") <= 100).select(
        "token",
        "freq",
        "rank",
        (F.col("cum_freq").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )


@query(
    "agg_heavy_hitter_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    t AS (SELECT token FROM tok WHERE token <> ''),
    tot AS (SELECT COUNT(*) AS total_n FROM t)
    SELECT t.token, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(tot.total_n) AS BIGINT) AS total_n
    FROM t, tot
    GROUP BY t.token
    HAVING COUNT(*) >= MAX(tot.total_n) * 0.005
    """,
    tags=("text", "sketch", "heavy-hitters", "agg"),
)
def agg_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (frequency >= 0.5%) via the two-pass
    Misra-Gries pipeline (operators/heavy_hitters.py): a bounded-memory
    per-partition sketch prunes the candidate set WITHOUT the
    full-cardinality shuffle a plain GROUP BY needs, then an exact
    recount of candidates makes the result precise — which is why this
    sketch query carries a full value-hash oracle (the naive exact SQL)
    rather than a rows-only gate.  At 100 TB the avoided shuffle is the
    whole token vocabulary; the candidate recount shuffles only rows
    whose token is among <= partitions * k candidates."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.heavy_hitters import (
        heavy_hitters_exact,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return heavy_hitters_exact(toks, "token", support=0.005)


@query(
    "text_chunk_windows",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE doc_id < 300
    ),
    chunks AS (
      SELECT doc_id,
             CAST(u.i AS BIGINT) AS chunk_no,
             array_to_string(t[u.i * 24 + 1 : u.i * 24 + 32], ' ') AS chunk,
             least(len(t) - u.i * 24, 32) AS n_tokens
      FROM toks,
           unnest(generate_series(0,
             greatest(CAST(ceil((len(t) - 32) / 24.0) AS BIGINT), 0))) AS u(i)
      WHERE len(t) >= 1
    )
    SELECT doc_id, chunk_no, chunk, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM chunks WHERE n_tokens > 0
    """,
    tags=("text", "chunking", "generator", "training-data"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG / pretraining step
    that splits long documents into overlapping fixed-size pieces:
    32-token windows with stride 24 (8-token overlap), the final
    partial window kept.  Everything is JVM array work — one split,
    a sequence of window starts, slice + array_join per window — and
    the only row growth is the chunk fan-out itself (posexplode of a
    computed sequence; no shuffle at all, so the operator pipelines
    with the scan at any corpus size).  The oracle mirrors the window
    arithmetic with list slicing; exact string and integer outputs."""
    size, stride = 32, 24
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 1
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.size("t") - F.lit(size)) / F.lit(float(stride))).cast("long"),
            F.lit(0).cast("long"),
        ),
    )
    chunks = toks.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_no", "_i"),
        F.col("t"),
    ).select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.array_join(
            F.slice(F.col("t"), F.col("chunk_no") * stride + 1, size), " "
        ).alias("chunk"),
        F.least(
            F.size("t") - F.col("chunk_no") * stride, F.lit(size)
        ).cast("long").alias("n_tokens"),
    )
    return chunks.filter(F.col("n_tokens") > 0)


_BM25_TERMS = ("hash", "merge", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle() -> str:
    per_term_cols = ",\n        ".join(
        f"COALESCE(MAX(CASE WHEN token = '{t}' THEN s END), 0.0) AS s_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(f"s_{t}" for t in _BM25_TERMS)
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    qtf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN ({terms}) GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM qtf GROUP BY 1),
    per_term AS (
      SELECT qtf.doc_id, qtf.token,
        ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
        ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         (tf + 1.2 * (1.0 - 0.75 +
            (0.75 * CAST(dl AS DOUBLE)) /
            (CAST(sum_dl AS DOUBLE) / n_docs)))) AS s
      FROM qtf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    per_doc AS (
      SELECT doc_id,
        {per_term_cols}
      FROM per_term GROUP BY 1
    )
    SELECT doc_id, {score} AS bm25_score
    FROM per_doc
    ORDER BY bm25_score DESC, doc_id
    LIMIT 20
    """


@query(
    "text_bm25_search",
    oracle=_bm25_oracle(),
    tags=("text", "search", "topk", "training-data"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 full-corpus search for a fixed 3-term query, top-20
    docs (k1=1.2, b=0.75).

    The IDF is the log-free rational Robertson form
    ``(N - df + 0.5) / (df + 0.5)`` — monotone in df exactly like
    ``ln`` of it, so rankings are preserved while every arithmetic op
    stays +,*,/ (IEEE-exact and bit-equal with the DuckDB oracle;
    libm ``ln`` differs in the last ulp between engines).

    Per-doc scores sum the (<=3) per-term contributions in FIXED term
    order via conditional aggregation — a float sum under groupBy would
    be accumulation-order-dependent and break bit-equality.

    Scale: one token explode feeds both the doc-length agg and the
    query-term tf agg; df (3 rows) and the corpus stats (1 row) are
    broadcast, so the only big shuffles are the two doc_id/token hash
    aggs and the tf-dl join on doc_id.  The final global top-20 is
    ``orderBy().limit()`` -> TakeOrderedAndProject: per-partition heap
    + single driver merge of 20-row heads, no global sort at any
    corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))
    qtf = (
        toks.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = qtf.groupBy("token").agg(F.count("*").alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0)
        - F.lit(_BM25_B)
        + (F.lit(_BM25_B) * F.col("dl").cast("double")) / avgdl
    )
    s = idf * ((F.col("tf").cast("double") * (F.lit(_BM25_K1) + F.lit(1.0))) / denom)

    per_term = (
        qtf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", s.alias("s"))
    )
    per_doc = per_term.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
            ).alias(f"s_{t}")
            for t in _BM25_TERMS
        ]
    )
    score = F.col(f"s_{_BM25_TERMS[0]}")
    for t in _BM25_TERMS[1:]:
        score = score + F.col(f"s_{t}")
    return (
        per_doc.select("doc_id", score.alias("bm25_score"))
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "text_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ),
    uni AS (SELECT unnest(t) AS w FROM toks),
    cx AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_tokens FROM uni),
    big AS (
      SELECT t[CAST(u.i AS BIGINT)] AS x, t[CAST(u.i AS BIGINT) + 1] AS y
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM big GROUP BY 1, 2)
    SELECT x, y, c_xy,
           (CAST(n_tokens AS DOUBLE) * c_xy) /
           (CAST(cx1.c AS DOUBLE) * cx2.c) AS pmi_ratio
    FROM cxy
    JOIN cx cx1 ON cxy.x = cx1.w
    JOIN cx cx2 ON cxy.y = cx2.w
    CROSS JOIN n
    WHERE c_xy >= 5
    ORDER BY pmi_ratio DESC, x, y
    LIMIT 30
    """,
    tags=("text", "collocation", "ngram", "training-data"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-30 bigrams by pointwise-mutual-information
    ratio ``P(x,y) / (P(x)P(y)) = N*c(x,y) / (c(x)*c(y))`` with minimum
    support 5 — the phrase-detection pass (word2vec-style) a tokenizer
    pipeline runs to promote frequent collocations to single tokens.
    The log of the ratio is classic PMI; the ratio itself preserves the
    exact ranking while staying log-free for cross-engine bit-equality.

    Bigrams come from a row-local array fold (posexplode over the
    token array — narrow, no shuffle); the three aggregates (unigram
    counts, bigram counts, corpus total) each map-side combine before
    one hash shuffle, and the two unigram-count joins shuffle on the
    word key (never broadcast: vocabulary grows with the corpus).
    The support filter drops the long tail BEFORE the joins, so the
    join input is the (tiny) frequent-bigram set, and the global
    top-30 is TakeOrderedAndProject.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tokens("text").alias("t")).filter(F.size("t") >= 2)
    uni = toks.select(F.explode("t").alias("w"))
    cx = uni.groupBy("w").agg(F.count("*").alias("c"))
    n = uni.agg(F.count("*").alias("n_tokens"))
    big = toks.select(
        F.col("t"),
        F.posexplode(F.slice(F.col("t"), F.lit(1), F.size("t") - 1)).alias("i", "x"),
    ).select("x", F.element_at("t", F.col("i") + 2).alias("y"))
    cxy = (
        big.groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    scored = (
        cxy.join(cx.withColumnRenamed("w", "x").withColumnRenamed("c", "c_x"), "x")
        .join(cx.withColumnRenamed("w", "y").withColumnRenamed("c", "c_y"), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            "c_xy",
            (
                (F.col("n_tokens").cast("double") * F.col("c_xy"))
                / (F.col("c_x").cast("double") * F.col("c_y"))
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(F.desc("pmi_ratio"), F.asc("x"), F.asc("y")).limit(30)


@query(
    "text_bpe_pair_merges",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT t[u.i] || ' ' || t[u.i + 1] AS pair
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    counts AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair)
    SELECT pair, n FROM counts
    ORDER BY n DESC, pair
    LIMIT 20
    """,
    tags=("text", "tokenizer", "training-data", "topk"),
)
def text_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE-style merge induction over the corpus: count
    every ADJACENT token pair and return the top-20 merge candidates
    (count desc, pair asc — the deterministic tie-break a reproducible
    tokenizer trainer needs).  Plan: the pair stream is a zip of the
    token array with its own tail (``arrays_zip`` over two slices — no
    self-join, no shuffle to form pairs), then one map-side-combinable
    hash aggregate and a TakeOrderedAndProject top-k — no full sort.
    Iterated to convergence (re-pairing after each merge) this is
    exactly distributed BPE training; one round is the primitive, and
    each round keeps this same one-shuffle shape at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("a"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("b"),
    )
    pairs = d.select(F.explode(zipped).alias("z")).select(
        F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(20)
    )


_BPE_K = 8

_BPE_ORACLE_MERGES = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT t[u.i] || ' ' || t[u.i + 1] AS pair
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    counts AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair),
    merges AS (
      SELECT pair, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS r
      FROM counts ORDER BY n DESC, pair LIMIT 8
    )
"""


def _bpe_oracle_apply_expr() -> str:
    """Nested replace() chain: merge r=1 applied first, r=8 last — each
    pattern/replacement drawn from the merges CTE by scalar subquery."""
    expr = "'|' || replace(text, ' ', '|') || '|'"
    for r in range(1, _BPE_K + 1):
        pat = f"(SELECT '|' || replace(pair, ' ', '|') || '|' FROM merges WHERE r = {r})"
        rep = f"(SELECT '|' || replace(pair, ' ', '_') || '|' FROM merges WHERE r = {r})"
        expr = f"replace({expr}, {pat}, {rep})"
    return expr


@query(
    "text_bpe_apply",
    oracle=f"""
    WITH {_BPE_ORACLE_MERGES},
    enc AS (SELECT doc_id, {_bpe_oracle_apply_expr()} AS e FROM documents)
    SELECT doc_id,
           md5(e) AS encoded_fp,
           CAST(length(e) - length(replace(e, '|', '')) - 1 AS BIGINT)
             AS n_tokens
    FROM enc
    """,
    tags=("text", "tokenizer", "training-data"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of distributed BPE (text_bpe_pair_merges is the
    learn half): collect the top-8 first-round merges (count desc, pair
    asc — a bounded 8-row driver action, the fit/apply split of the
    k-means codebook and PCA), then encode every document by applying
    the merges in priority order as sentinel-delimited literal replaces
    ('|a|b|' -> '|a_b|').  Both engines' replace() scans left-to-right
    non-overlapping and does NOT rescan replacement text, so
    '(a b)(a b)' merges once per non-overlapping occurrence — identical
    semantics, hash-checked via the encoded md5 and post-merge token
    count.  The oracle re-derives the merge table itself (no literals
    leak from the engine), so learn AND apply are both verified.  Apply
    is a narrow JVM map — no shuffle; the learn pass is the one-shuffle
    hash-agg of text_bpe_pair_merges."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("a"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("b"),
    )
    merges = (
        d.select(F.explode(zipped).alias("z"))
        .select(F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(_BPE_K)
        .collect()
    )
    enc = F.translate(F.concat(F.lit("|"), F.col("text"), F.lit("|")), " ", "|")
    for row in merges:
        pat = "|" + row["pair"].replace(" ", "|") + "|"
        rep = "|" + row["pair"].replace(" ", "_") + "|"
        enc = F.replace(enc, F.lit(pat), F.lit(rep))
    n_tokens = (
        F.length(enc) - F.length(F.replace(enc, F.lit("|"), F.lit(""))) - 1
    ).cast("long")
    return d.select(
        "doc_id", F.md5(enc).alias("encoded_fp"), n_tokens.alias("n_tokens")
    )


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             greatest({', '.join(_sql_hits(lang) for lang in sorted(STOPWORDS))}) AS best,
             text
      FROM documents
    )
    SELECT lang,
           CASE WHEN best = 0 THEN 'und' {_LANG_CASE} ELSE 'und' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
    tags=("text", "agg", "quality"),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled language x predicted
    language with counts — the accuracy audit run before trusting a
    classifier to gate or rebalance a multilingual corpus (the diagonal
    over the row sum is per-language recall).  Same single
    map-side-combinable aggregate shape as text_language_id, one extra
    grouping column."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(
        "lang", predict_language("text").alias("predicted_lang")
    ).agg(F.count("*").alias("n_docs"))


@query(
    "profile_corpus_datasheet",
    oracle=f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
           quantile_disc(len(string_split(text, ' ')), 0.5) AS med_tokens,
           CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
    FROM documents
    GROUP BY lang, source
    """,
    tags=("text", "agg", "quality", "training-data"),
)
def profile_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet: the per-(lang, source) summary block a corpus
    release ships with — document/token/char volumes, token-length
    spread (exact discrete median), and exact-duplicate exposure
    (distinct md5 fingerprints vs rows).  One grouped aggregate; the
    count-distinct shuffles fingerprints (16 bytes/doc), never text —
    at 100 TB swap in approx_count_distinct's mergeable HLL sketch
    (registered separately) if a tolerance is acceptable."""
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    d.select(
        "lang", "source", "n_chars",
        ntok.alias("ntok"), F.md5("text").alias("fp"),
    ).createOrReplaceTempView("_datasheet_base")
    return spark.sql(
        """
        SELECT lang, source,
               COUNT(*) AS n_docs,
               SUM(CAST(ntok AS BIGINT)) AS n_tokens,
               SUM(n_chars) AS n_chars,
               MIN(CAST(ntok AS BIGINT)) AS min_tokens,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ntok)
                    AS BIGINT) AS med_tokens,
               MAX(CAST(ntok AS BIGINT)) AS max_tokens,
               COUNT(DISTINCT fp) AS n_unique_texts
        FROM _datasheet_base
        GROUP BY lang, source
        """
    )


# ---------------------------------------------------------------------------
# Corpus bigram language-model quality score.  Staged in r6 under the
# registry freeze, registered r7.  No guard entries needed: equi-joins
# on bigram keys only, no windows.
# ---------------------------------------------------------------------------

#: Fixed-point scale for the conditional bigram probability.  The whole
#: score stays EXACT integer algebra — ``p_fp = (SCALE * cnt_bg) div
#: cnt_w1`` — instead of the textbook sum-of-log-probs, because log()
#: doubles are libm-vs-JVM territory where the two engines may differ in
#: the last ulp; integer division they compute identically.  (Monotone
#: in the true probability, so ranking/filtering behavior matches an LM
#: score; docs full of never-repeated word transitions score near 0,
#: boilerplate scores near SCALE.)
_LM_FP_SCALE = 1_000_000_000

#: FULL pipeline replay for :func:`text_bigram_lm_score`: tokenize,
#: adjacent-pair bigrams, corpus counts, integer fixed-point conditional
#: probabilities, per-document totals — value-for-value.  DuckDB SUM
#: returns HUGEINT; every emitted aggregate casts to BIGINT (the
#: oracle-output-types contract).
TEXT_BIGRAM_LM_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    el AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i FROM el)
    ),
    dbg AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM bg GROUP BY doc_id, w1, w2),
    cbg AS (SELECT w1, w2, SUM(c) AS cnt_bg FROM dbg GROUP BY w1, w2),
    cw1 AS (SELECT w1, SUM(cnt_bg) AS cnt_w1 FROM cbg GROUP BY w1),
    probs AS (
      SELECT cbg.w1, cbg.w2, ({_LM_FP_SCALE} * cnt_bg) // cnt_w1 AS p_fp
      FROM cbg JOIN cw1 USING (w1)
    ),
    sc AS (
      SELECT doc_id, SUM(c * p_fp) AS lm_fp_sum, SUM(c) AS n_bigrams
      FROM dbg JOIN probs USING (w1, w2) GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(lm_fp_sum AS BIGINT) AS lm_fp_sum,
           CAST(lm_fp_sum // n_bigrams AS BIGINT) AS avg_prob_fp
    FROM sc
"""


def bigram_lm_scores(base: DataFrame) -> DataFrame:
    """Score every document of a tokenized corpus by the corpus-
    conditional bigram LM of :func:`text_bigram_lm_score` (which see for
    the fixed-point rationale and the 100 TB shape).  ``base`` must be
    ``(doc_id, _tk array<string>)`` with ``size(_tk) >= 2``; returns
    ``(doc_id, n_bigrams, lm_fp_sum, avg_prob_fp)``.  Factored out so
    the span-dedup-rewrite capstone (queries/llm_curation.py) can train
    and score the SAME model on a REWRITTEN corpus."""
    bg = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_tk) - 1), "
                "i -> struct(element_at(_tk, i) AS w1, element_at(_tk, i + 1) AS w2))"
            )
        ).alias("_b"),
    ).select("doc_id", "_b.w1", "_b.w2")
    dbg = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    cbg = dbg.groupBy("w1", "w2").agg(F.sum("c").alias("cnt_bg"))
    cw1 = cbg.groupBy("w1").agg(F.sum("cnt_bg").alias("cnt_w1"))
    probs = cbg.join(cw1, "w1").select(
        "w1", "w2", F.expr(f"({_LM_FP_SCALE} * cnt_bg) div cnt_w1").alias("p_fp")
    )
    return (
        dbg.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("p_fp")).alias("lm_fp_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "lm_fp_sum",
            F.expr("lm_fp_sum div n_bigrams").alias("avg_prob_fp"),
        )
    )


@query(
    "text_bigram_lm_score",
    oracle=TEXT_BIGRAM_LM_ORACLE,
    tags=("text", "agg", "join"),
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score: each document is
    scored by the average corpus-conditional probability of its adjacent
    token transitions — the quality-filter stage the published pipelines
    run a KenLM for, re-expressed as two hash-aggregations and two
    equi-joins that never shuffle the corpus text, only its bigram
    VOCABULARY.  The probability is fixed-point integer
    (``(SCALE * cnt_bg) div cnt_w1``), so both engines agree bit-exactly
    where sum-of-log doubles could drift (see TEXT_BIGRAM_LM_ORACLE).

    100 TB shape: the bigram projection is a narrow map/explode; the
    doc-level count agg shuffles doc-distinct bigrams (map-side combined);
    corpus counts aggregate THAT output (vocabulary-sized); the score join
    is keyed on the bigram, with AQE free to broadcast the (small)
    probability table.  Per-doc sums are int64-safe to ~9e9 corpus
    occurrences of a single bigram and ~9e9 tokens per document; beyond
    that, widen to DECIMAL(38).

    Overflow envelope aside, ``doc_bigram_counts`` is referenced by both
    the corpus-count subtree and the scoring join, so it is materialized
    once (localCheckpoint) — without the barrier Spark recomputes the
    tokenize+explode pipeline per reference (the lsh_candidate_pairs
    lesson)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.size(tokens("text")) >= 2).select(
        "doc_id", tokens("text").alias("_tk")
    )
    return bigram_lm_scores(base)


# ---------------------------------------------------------------------------
# n-gram diversity profile (round 7) — distinct-n ratios per source, the
# corpus-diversity signal Self-BLEU approximates: a source whose bigram
# type/token ratio collapses is template/boilerplate-heavy (or already
# contaminated by duplication) and gets flagged before training.
# ---------------------------------------------------------------------------

_DIVERSITY_FP_SCALE = 1_000_000

TEXT_NGRAM_DIVERSITY_ORACLE = f"""
    WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
    uni AS (
      SELECT source, toks[i] AS g
      FROM (SELECT source, toks, unnest(generate_series(1, len(toks))) AS i FROM t)
    ),
    ua AS (
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT g) AS n_types
      FROM uni GROUP BY source
    ),
    bi AS (
      SELECT source, toks[i] || ' ' || toks[i + 1] AS g
      FROM (SELECT source, toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t WHERE len(toks) >= 2)
    ),
    ba AS (
      SELECT source, COUNT(*) AS n_bigrams, COUNT(DISTINCT g) AS n_bigram_types
      FROM bi GROUP BY source
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(({_DIVERSITY_FP_SCALE} * n_types) // n_tokens AS BIGINT) AS ttr_fp,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(n_bigram_types AS BIGINT) AS n_bigram_types,
           CAST(({_DIVERSITY_FP_SCALE} * n_bigram_types) // n_bigrams AS BIGINT)
             AS bigram_diversity_fp
    FROM ua JOIN ba USING (source)
"""


@query(
    "text_ngram_diversity",
    oracle=TEXT_NGRAM_DIVERSITY_ORACLE,
    tags=("text", "agg", "quality"),
)
def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram diversity: type/token ratio of unigrams and the
    distinct-bigram ratio — the cheap corpus-level proxy for the
    Self-BLEU diversity check run before a source is admitted to a
    training mix (boilerplate and template farms collapse the bigram
    ratio long before exact dedup catches them).

    Ratios are integer fixed-point (``SCALE * types div total``), so the
    result hash-matches the oracle with no float division.  Sources whose
    documents are ALL single-token would drop from the inner join; the
    profile is only meaningful (and emitted) for sources with at least
    one bigram.

    100 TB shape: two explode → hash-agg pipelines, each map-side
    combined on (source, gram) — the shuffle carries per-task DISTINCT
    (source, gram) partials, never raw token streams; the final join is
    on ``source`` (20 rows — AQE broadcasts it).  No windows, no
    collect."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("source", tokens("text").alias("_tk"))
    uni = (
        base.select("source", F.explode("_tk").alias("g"))
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
        )
    )
    bi = (
        base.filter(F.size("_tk") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_tk) - 1), "
                    "i -> concat(element_at(_tk, i), ' ', element_at(_tk, i + 1)))"
                )
            ).alias("g"),
        )
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_bigram_types"),
        )
    )
    s = _DIVERSITY_FP_SCALE
    return (
        uni.join(bi, "source")
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.expr(f"({s} * n_types) div n_tokens").alias("ttr_fp"),
            "n_bigrams",
            "n_bigram_types",
            F.expr(f"({s} * n_bigram_types) div n_bigrams").alias(
                "bigram_diversity_fp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Multi-round BPE induction (VERDICT r7 item 5).  text_bpe_pair_merges
# is one LEARN round and text_bpe_apply one APPLY pass; real tokenizer
# training alternates them — each round's pair statistics come from the
# corpus AS RE-ENCODED by every previous merge.
# ---------------------------------------------------------------------------

_BPE_ITER_ROUNDS = 4


def _bpe_apply_merges(enc: F.Column, merges: list[str]) -> F.Column:
    """Apply ``merges`` in order to an already-sentinel-encoded column:
    each learned pair 'a b' rewrites '|a|b|' -> '|a_b|' (the
    text_bpe_apply representation — replace() is left-to-right
    non-overlapping and identical in both engines).  The replace-chain
    DEPTH of the resulting expression is exactly ``len(merges)`` — the
    quantity the materialized deep trainer bounds."""
    for pair in merges:
        pat = "|" + pair.replace(" ", "|") + "|"
        rep = "|" + pair.replace(" ", "_") + "|"
        enc = F.replace(enc, F.lit(pat), F.lit(rep))
    return enc


def _bpe_iter_enc(merges: list[str]) -> F.Column:
    """Sentinel encoding of ``text`` after applying ``merges`` in
    order: '|'-delimited tokens."""
    raw = F.translate(F.concat(F.lit("|"), F.col("text"), F.lit("|")), " ", "|")
    return _bpe_apply_merges(raw, merges)


def _bpe_iter_pairs(d: DataFrame, enc: F.Column) -> DataFrame:
    """Adjacent-pair stream of the RE-ENCODED corpus: re-split the
    sentinel string (dropping the leading/trailing empties the
    delimiters create, keeping any interior empties so both engines see
    the same token stream) and zip the token array with its own tail —
    the same no-shuffle pair primitive as text_bpe_pair_merges."""
    t_all = F.split(enc, "\\|")
    toks = F.slice(t_all, 2, F.size(t_all) - 2)
    zipped = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("a"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("b"),
    )
    return d.select(F.explode(zipped).alias("z")).select(
        F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("pair")
    )


def _bpe_iter_oracle(rounds: int = _BPE_ITER_ROUNDS) -> str:
    """DuckDB replay of the FULL iterative chain: each round's merge is
    re-derived from the previous round's encoding, then applied — no
    literal learned on the Spark side leaks into the oracle.  The replay
    is the same for the materialized deep trainer: materialization
    changes WHERE the encoding is computed from, never WHAT it is (the
    encoding is a pure function of the merge list)."""
    # AS MATERIALIZED: every enc{r} is referenced by m{r+1} AND
    # enc{r+1} (twice, via scalar subqueries) — without the hint DuckDB
    # re-inlines the whole prefix chain per reference and replay cost
    # grows ~6x PER ROUND (measured: 4 rounds 2.5 s, 6 rounds 87 s at
    # sf0.001); materialized, 8 rounds replay in ~2 s
    ctes = [
        "enc0 AS MATERIALIZED (SELECT doc_id, '|' || replace(text, ' ', '|')"
        " || '|' AS e FROM documents)"
    ]
    for r in range(1, rounds + 1):
        prev = f"enc{r - 1}"
        ctes.append(
            f"""m{r} AS MATERIALIZED (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT t[u.i] || ' ' || t[u.i + 1] AS pair
        FROM (SELECT t[2:len(t) - 1] AS t
              FROM (SELECT string_split(e, '|') AS t FROM {prev}) raw{r}) tk{r},
             unnest(generate_series(1, len(t) - 1)) AS u(i)
      ) p{r} GROUP BY pair ORDER BY n DESC, pair LIMIT 1
    )"""
        )
        ctes.append(
            f"""enc{r} AS MATERIALIZED (
      SELECT doc_id, replace(e,
        (SELECT '|' || replace(pair, ' ', '|') || '|' FROM m{r}),
        (SELECT '|' || replace(pair, ' ', '_') || '|' FROM m{r})) AS e
      FROM {prev}
    )"""
        )
        ctes.append(
            f"tok{r} AS (SELECT CAST(SUM(length(e) - length(replace(e, '|', ''))"
            f" - 1) AS BIGINT) AS nt FROM enc{r})"
        )
    selects = "\n    UNION ALL ".join(
        f"SELECT {r} AS r, (SELECT pair FROM m{r}) AS pair,"
        f" (SELECT n FROM m{r}) AS n,"
        f" (SELECT nt FROM tok{r}) AS corpus_tokens"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects + "\n    ORDER BY r"


@query(
    "text_bpe_iterative",
    oracle=_bpe_iter_oracle(),
    tags=("text", "tokenizer", "training-data"),
)
def text_bpe_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-round BPE induction — the real tokenizer-training loop
    (Sennrich et al. 2016): 4 rounds of learn-one-merge -> re-encode ->
    re-count, where round r's pair statistics come from the corpus as
    re-encoded by merges 1..r-1 (so round 2 can learn a pair whose left
    atom IS round 1's merged token).  Returns the learned merge table
    with per-round provenance: (r, pair, n = the pair's count in the
    round-(r-1) encoding, corpus_tokens = total corpus tokens AFTER
    applying merges 1..r).

    Execution shape per round: one narrow re-encode map (the literal
    replace chain — no shuffle), one map-side-combinable pair hash-agg,
    one TakeOrderedAndProject(limit=1) — exactly the
    text_bpe_pair_merges shape, iterated.  The per-round ``limit(1)
    .collect()`` is the bounded fit/apply driver action this repo's
    trained operators share (k-means codebook, PQ, top-8 BPE): 1 row x
    4 rounds.  At 100 TB each round re-scans the raw corpus through an
    r-deep replace chain; a production trainer would MATERIALIZE the
    re-encoded corpus every few rounds instead — the trade is a write
    amplification vs re-scan cost, orthogonal to the per-round plan
    shape pinned here.

    The oracle replays the whole chain (merges re-derived per round,
    never copied from the engine), so learn AND apply of every round
    are hash-verified; ties break (count desc, pair asc) identically in
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    merges: list[str] = []
    learned: list[tuple[int, str, int]] = []
    for r in range(1, _BPE_ITER_ROUNDS + 1):
        top = (
            _bpe_iter_pairs(d, _bpe_iter_enc(merges))
            .groupBy("pair")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(f"BPE round {r}: corpus has no adjacent pairs")
        merges.append(top[0]["pair"])
        learned.append((r, top[0]["pair"], int(top[0]["n"])))

    parts = []
    for r, pair, n in learned:
        enc_r = _bpe_iter_enc(merges[:r])
        ntok = (
            F.length(enc_r) - F.length(F.replace(enc_r, F.lit("|"), F.lit(""))) - 1
        ).cast("long")
        parts.append(
            d.select(ntok.alias("_nt"))
            .agg(F.sum("_nt").alias("corpus_tokens"))
            .select(
                F.lit(r).alias("r"),
                F.lit(pair).alias("pair"),
                F.lit(n).cast("long").alias("n"),
                "corpus_tokens",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("r")


_BPE_DEEP_ROUNDS = 8
_BPE_DEEP_MAT_EVERY = 4


def bpe_train_materialized(
    d: DataFrame, rounds: int, materialize_every: int
) -> tuple[DataFrame, list[int]]:
    """The text_bpe_iterative trainer with PERIODIC MATERIALIZATION
    (VERDICT r8 item 5): every ``materialize_every`` rounds the
    re-encoded corpus checkpoints, and later rounds apply only the
    merges learned SINCE — so the replace-chain depth any single pass
    evaluates is bounded by ``materialize_every`` instead of growing
    with the round number.  At 100 TB this is the write-amplification
    vs re-scan trade a production tokenizer trainer actually makes
    (materialize ~every few merges; HuggingFace/SentencePiece trainers
    keep the encoded corpus resident for the same reason).

    Returns ``(result_df, depths)`` — the result in text_bpe_iterative's
    schema (r, pair, n, corpus_tokens) and the list of replace-chain
    depths every corpus pass evaluated (training passes first, then the
    per-round token-count passes), so tests can pin
    ``max(depths) <= materialize_every``.

    The learned merges and all outputs are IDENTICAL to the
    unmaterialized trainer: the encoding is a pure function of the
    merge list, so checkpointing intermediate encodings changes where
    each pass starts, never what it computes — which is why the DuckDB
    oracle replays the plain chain unchanged."""
    raw = F.translate(F.concat(F.lit("|"), F.col("text"), F.lit("|")), " ", "|")
    base = d.select(raw.alias("e"))
    merges: list[str] = []
    learned: list[tuple[int, str, int]] = []
    depths: list[int] = []
    snapshots: list[tuple[int, DataFrame]] = [(0, base)]
    m = 0  # number of merges baked into `base`
    for r in range(1, rounds + 1):
        pending = merges[m:]
        depths.append(len(pending))
        enc = _bpe_apply_merges(F.col("e"), pending)
        top = (
            _bpe_iter_pairs(base, enc)
            .groupBy("pair")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(f"BPE round {r}: corpus has no adjacent pairs")
        merges.append(top[0]["pair"])
        learned.append((r, top[0]["pair"], int(top[0]["n"])))
        if r % materialize_every == 0 and r < rounds:
            base = base.select(
                _bpe_apply_merges(F.col("e"), merges[m:]).alias("e")
            ).localCheckpoint(eager=True)
            m = r
            snapshots.append((m, base))

    # per-round corpus token counts, each computed from the NEAREST
    # materialized snapshot at or below the round — the returned plan's
    # replace depth is bounded too, not just the training passes'.
    # All rounds served by one snapshot are FUSED into a single
    # aggregate pass over it (r11 perf): one sum per round side by
    # side, exploded back to rows — the result plan pays one corpus
    # scan per snapshot (2 at the deep query's 8/4 settings) instead
    # of one per round (8), with identical values, depths, and schema.
    parts = []
    per_snapshot: dict[int, tuple[DataFrame, list[tuple[int, str, int]]]] = {}
    for r, pair, n in learned:
        sm, sbase = max(
            (s for s in snapshots if s[0] <= r), key=lambda s: s[0]
        )
        per_snapshot.setdefault(sm, (sbase, []))[1].append((r, pair, n))
    for sm, (sbase, rows) in sorted(per_snapshot.items()):
        aggs = []
        for r, pair, n in rows:
            depths.append(r - sm)
            enc_r = _bpe_apply_merges(F.col("e"), merges[sm:r])
            ntok = (
                F.length(enc_r)
                - F.length(F.replace(enc_r, F.lit("|"), F.lit("")))
                - 1
            ).cast("long")
            aggs.append(F.sum(ntok).alias(f"_ct{r}"))
        entries = F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.lit(pair).alias("pair"),
                    F.lit(n).cast("long").alias("n"),
                    F.col(f"_ct{r}").alias("corpus_tokens"),
                )
                for r, pair, n in rows
            ]
        )
        parts.append(
            sbase.agg(*aggs).select(F.explode(entries).alias("_x")).select("_x.*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("r"), depths


@query(
    "text_bpe_iterative_deep",
    oracle=_bpe_iter_oracle(rounds=_BPE_DEEP_ROUNDS),
    tags=("text", "tokenizer", "training-data"),
)
def text_bpe_iterative_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-round BPE induction with the re-encoded corpus MATERIALIZED
    every 4 rounds (bpe_train_materialized) — the
    answer to text_bpe_iterative's documented depth concession: that
    trainer re-scans the raw corpus through an r-deep replace chain
    each round; this one checkpoints the encoding so no pass ever
    evaluates more than 4 replaces (tests/test_round9_ops.py pins the
    measured depths).

    Learned merges, counts, and per-round corpus token totals are
    identical to the unmaterialized chain by construction, so the
    oracle is the SAME full replay at 8 rounds: every learn AND apply
    is hash-verified; ties break (count desc, pair asc) identically in
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    out, _ = bpe_train_materialized(d, _BPE_DEEP_ROUNDS, _BPE_DEEP_MAT_EVERY)
    return out
