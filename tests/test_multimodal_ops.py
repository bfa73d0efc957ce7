"""Multimodal plumbing tests: binary payload round-trip through Arrow
batches, metadata struct pruning, frame sampling shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample_plan,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world", "s1"), (2, "x" * 100, "s2"), (3, "", "s3")],
        "doc_id long, text string, source string",
    )


def test_payload_bytes_roundtrip(spark):
    mm = attach_binary_payload(_docs(spark), "text", "doc_id", "source")
    rows = {r.doc_id: r for r in mm.collect()}
    assert bytes(rows[1].payload) == b"hello world"
    assert rows[1].meta.n_bytes == 11
    assert rows[1].meta.modality == "text"
    assert rows[3].meta.n_bytes == 0


def test_decode_features_arrow_batches(spark):
    mm = attach_binary_payload(_docs(spark), "text", "doc_id", "source")
    feats = {r.doc_id: r for r in decode_features(mm).collect()}
    assert feats[2].n_bytes == 100
    assert feats[2].width == 64 + 100 % 512
    assert feats[2].height == 64 + 700 % 512
    assert feats[2].checksum_mod == (100 * 31) % 251
    assert feats[3].n_bytes == 0


def test_frame_sample_plan_shape(spark):
    mm = attach_binary_payload(_docs(spark), "text", "doc_id", "source")
    frames = frame_sample_plan(mm, every_n=2).collect()
    # doc 2: 100 bytes -> 6 frames (100/16) -> indices 0,2,4
    idx = sorted(r.frame_idx for r in frames if r.doc_id == 2)
    assert idx == [0, 2, 4]
    # empty doc still yields frame 0 (greatest(n-1, 0) floor)
    assert sorted(r.frame_idx for r in frames if r.doc_id == 3) == [0]


def test_resize_payload_bytes_are_strided_slices(spark, sf_dir):
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        attach_binary_payload,
        resize_payloads,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )
    import pyspark.sql.functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    mm = attach_binary_payload(d, "text", "doc_id", "source")
    out = {r.doc_id: r for r in resize_payloads(mm, target_width=64).collect()}
    for row in d.select("doc_id", "text").collect():
        payload = row.text.encode()
        n = len(payload)
        ow, oh = 64 + n % 512, 64 + (n * 7) % 512
        h = (oh * 64) // ow
        stride = max(1, n // max(1, 8 * h))
        got = out[row.doc_id]
        assert bytes(got.payload) == payload[::stride]
        assert (got.orig_width, got.orig_height) == (ow, oh)
        assert got.n_bytes == len(payload[::stride])


def test_wav_payloads_are_real_riff_containers(spark, sf_dir):
    """The synthesized payloads must be genuine WAV files: RIFF magic,
    parseable by the stdlib reader, with the declared frame layout."""
    import io
    import wave

    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        synthesize_wav,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 3)
    rows = synthesize_wav(d, "doc_id", n_samples=100, sample_rate=4000).collect()
    assert len(rows) == 3
    for r in rows:
        assert bytes(r.payload[:4]) == b"RIFF" and bytes(r.payload[8:12]) == b"WAVE"
        with wave.open(io.BytesIO(bytes(r.payload)), "rb") as w:
            assert w.getnframes() == 100
            assert w.getframerate() == 4000
            assert w.getsampwidth() == 2 and w.getnchannels() == 1


def test_ahash_band_join_recall_matches_brute_force(spark, sf_dir):
    """The 4x16-bit banded equi-join must find EXACTLY the pairs a
    brute-force Hamming scan over the fingerprints finds (pigeonhole
    guarantees recall at distance <= 3; the exact filter kills the rest)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        ahash_features,
        synthesize_bmp_groups,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    fps = ahash_features(synthesize_bmp_groups(d, "doc_id", group_size=3))
    hashes = {r["doc_id"]: r["ahash"] & ((1 << 64) - 1) for r in fps.collect()}
    want = {
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup_pairs(fps, "doc_id", "ahash", 3).collect()
    }
    assert got == want
    assert want, "fixture should contain at least one near-dup pair"


def test_ahash_within_group_images_are_near_or_exact_dups(spark, sf_dir):
    """Perturbing one pixel must leave within-group images within a few
    aHash bits of their canonical sibling (that is the fixture's point)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        ahash_features,
        synthesize_bmp_groups,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    fps = {r["doc_id"]: r["ahash"] & ((1 << 64) - 1)
           for r in ahash_features(synthesize_bmp_groups(d, "doc_id", 3)).collect()}
    for doc, h in fps.items():
        base = fps[(doc // 3) * 3]
        assert bin(h ^ base).count("1") <= 3
