"""Multimodal plumbing tests: binary payload round-trip through Arrow
batches, metadata struct pruning, frame sampling shape."""

from __future__ import annotations

import pytest
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


def test_png_filter_vectors():
    """Hand-computed spec vectors so an encoder/decoder bug pair that
    cancels in the round-trip still fails (Paeth/Average per RFC 2083)."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        _filter_row,
        _paeth,
        _unfilter_row,
    )

    # Sub (t=1), bpp=1: out[i] = raw[i] - raw[i-1]
    assert _filter_row(1, bytes([10, 20, 30]), bytes(3), 1) == bytes([10, 10, 10])
    # Up (t=2): out[i] = raw[i] - prev[i]
    assert _filter_row(2, bytes([10, 20, 30]), bytes([1, 2, 3]), 1) == bytes([9, 18, 27])
    # Average (t=3), bpp=1: pred = (left + up) >> 1 -> 0:(0+4)//2=2, 1:(20-?)..
    # raw=[20, 30], prev=[4, 6]: out[0]=20-(0+4)//2=18, out[1]=30-(20+6)//2=17
    assert _filter_row(3, bytes([20, 30]), bytes([4, 6]), 1) == bytes([18, 17])
    # Paeth predictor picks nearest of (a, b, c) to p=a+b-c, ties a then b
    assert _paeth(3, 9, 8) == 3   # p=4: |4-3|=1 < |4-9|=5, |4-8|=4 -> a
    assert _paeth(9, 3, 8) == 3   # p=4: pa=5, pb=1, pc=4 -> b
    # p=11: pa=1, pb=1, pc=0 -> c wins (strictly smallest)
    assert _paeth(10, 12, 11) == 11
    # round-trip inverse on every filter type
    raw = bytes([7, 250, 3, 128, 99, 200])
    prev = bytes([1, 9, 255, 0, 42, 77])
    for t in range(5):
        assert _unfilter_row(t, _filter_row(t, raw, prev, 3), prev, 3) == raw


def test_png_bmp_cross_container_parity(spark, sf_dir):
    """The same pixel pattern rendered to PNG and BMP must decode to
    identical channel sums AND identical aHash fingerprints — the dedup
    pipeline is container-agnostic."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        ahash_features,
        bmp_features,
        png_ahash_features,
        png_features,
        synthesize_bmp,
        synthesize_png,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    png = synthesize_png(d, "doc_id", width=13, height=8)
    bmp = synthesize_bmp(d, "doc_id", width=13, height=8)
    png_sums = {tuple(r) for r in png_features(png).collect()}
    bmp_sums = {tuple(r) for r in bmp_features(bmp).collect()}
    assert png_sums == bmp_sums and len(png_sums) == 40
    png_h = {r["doc_id"]: r["ahash"] for r in png_ahash_features(png).collect()}
    bmp_h = {r["doc_id"]: r["ahash"] for r in ahash_features(bmp).collect()}
    assert png_h == bmp_h


def test_codec_corruption_sweep_raises_clean() -> None:
    """Every decoder honors the clean-error contract under single-byte
    corruption: flip any byte to several adversarial values and the
    reader either still decodes or raises AssertionError/ValueError —
    never struct.error / KeyError / RuntimeError / OverflowError (each of
    which was a REAL escape found by this sweep: stdlib wave's bare
    RuntimeError on a corrupt chunk-size seek, the JPEG undefined-table
    KeyError, SOF0 struct.error, and DC-category OverflowError).  This is
    the poison-payload guarantee the mapInPandas paths rely on: a corrupt
    record must surface as a typed per-record failure, not an executor
    crash."""
    import io
    import struct
    import wave

    import numpy as np

    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        _decode_bmp_sums,
        _decode_jpeg,
        _decode_png,
        _decode_wav,
        _encode_jpeg,
        _encode_png,
    )

    x = np.arange(13)[None, :]
    y = np.arange(8)[:, None]
    rgb = np.stack(
        np.broadcast_arrays(
            (7 * 7 + x * 3 + y * 5) % 256,
            (7 * 11 + x + y * 2) % 256,
            (7 * 13 + x * 2 + y) % 256,
        ),
        axis=-1,
    ).astype(np.uint8)

    # BMP payload (same layout synthesize_bmp emits: odd width -> padding)
    rows = np.zeros((8, 40), dtype=np.uint8)
    rows[:, :39] = rgb[..., ::-1].reshape(8, 39)
    bmp = (
        struct.pack("<2sIHHI", b"BM", 14 + 40 + 320, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 13, 8, 1, 24, 0, 320, 2835, 2835, 0, 0)
        + rows[::-1].tobytes()
    )

    # WAV payload (same layout synthesize_wav emits)
    i = np.arange(200, dtype=np.int64)
    samples = ((5 * 31 + i * 7) % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())

    cases = [
        ("jpeg", _encode_jpeg(rgb), _decode_jpeg),
        ("png", _encode_png(rgb), _decode_png),
        ("bmp", bmp, _decode_bmp_sums),
        ("wav", buf.getvalue(), _decode_wav),
    ]
    for name, payload, decode in cases:
        mutable = bytearray(payload)
        for pos in range(len(mutable)):
            old = mutable[pos]
            for v in (0x00, 0xFF, old ^ 0x01, old ^ 0x80):
                if v == old:
                    continue
                mutable[pos] = v
                try:
                    decode(bytes(mutable))
                except (AssertionError, ValueError):
                    pass
                except Exception as ex:  # pragma: no cover - the assertion
                    raise AssertionError(
                        f"{name}: unclean {type(ex).__name__} at byte {pos} "
                        f"value {v:#x}: {ex!r}"
                    ) from ex
                finally:
                    mutable[pos] = old


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_staged_mm_decode_permissive_vs_oracle(spark, scale_dir: str) -> None:
    """The STAGED r7 permissive-decode query hash-matches its value-exact
    DuckDB oracle at every fixture scale (driver t2-gate replica, run
    early so r7's registration commit is a pre-validated one-liner)."""
    from tests.oracle import duckdb_connection, compare
    from end_to_end_data_engineering_project_with_databricks_spark.queries.multimodal import (
        MM_DECODE_PERMISSIVE_ORACLE,
        mm_decode_permissive,
    )

    con = duckdb_connection(scale_dir)
    try:
        problems = compare(
            mm_decode_permissive(spark, scale_dir), con, MM_DECODE_PERMISSIVE_ORACLE
        )
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_permissive_decode_tolerates_only_clean_errors(spark) -> None:
    """decode_features_permissive converts AssertionError/ValueError to
    decode_ok=false rows but lets contract-violating error classes (a
    decoder BUG, not corrupt data) propagate and fail the task."""
    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        decode_features_permissive,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"ok")), (2, bytearray(b"bad"))],
        "doc_id long, payload binary",
    )

    def decoder(payload: bytes) -> tuple:
        if payload == b"bad":
            raise ValueError("corrupt record")
        return (len(payload),)

    rows = {
        r.doc_id: r
        for r in decode_features_permissive(df, decoder, ("n_bytes",)).collect()
    }
    assert rows[1].decode_ok and rows[1].n_bytes == 2 and rows[1].error is None
    assert not rows[2].decode_ok and rows[2].n_bytes is None
    assert rows[2].error == "corrupt record"

    def buggy(payload: bytes) -> tuple:
        raise KeyError("decoder bug")

    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        decode_features_permissive(df, buggy, ("n_bytes",)).collect()


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_staged_mm_video_frames_vs_oracle(spark, scale_dir: str) -> None:
    """The STAGED r7 video frame-sampling query hash-matches its full
    byte-regeneration DuckDB oracle at every fixture scale (driver gate
    replica run early, same pattern as the other staged queries)."""
    from tests.oracle import duckdb_connection, compare
    from end_to_end_data_engineering_project_with_databricks_spark.queries.multimodal import (
        MM_VIDEO_FRAMES_ORACLE,
        mm_video_frames,
    )

    con = duckdb_connection(scale_dir)
    try:
        problems = compare(
            mm_video_frames(spark, scale_dir), con, MM_VIDEO_FRAMES_ORACLE
        )
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_fvc_corruption_sweep_raises_clean() -> None:
    """The FVC video parser honors the same clean-error contract as the
    other codecs: single-byte corruption anywhere in the header either
    still decodes or raises AssertionError/ValueError — never
    struct.error or a numpy bounds error.  (Body bytes can't fail — any
    byte value is a valid frame byte — so the sweep covers the header
    plus a truncation ladder.)"""
    import struct

    import numpy as np

    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        _decode_video_frames,
    )

    d, n_frames, frame_size = 9, 7, 16
    f = np.arange(n_frames, dtype=np.int64)[:, None]
    j = np.arange(frame_size, dtype=np.int64)[None, :]
    frames = ((d * 7 + f * 13 + j * 3) % 256).astype(np.uint8)
    payload = b"FVC1" + struct.pack("<III", n_frames, frame_size, 12) + frames.tobytes()

    # sanity: intact payload decodes and samples frames 0, 5
    got = _decode_video_frames(payload, every_n=5)
    assert [t[0] for t in got] == [0, 5]
    assert all(t[1] == n_frames and t[2] == 12 for t in got)

    mutable = bytearray(payload)
    for pos in range(16):  # full header sweep
        old = mutable[pos]
        for v in (0x00, 0xFF, old ^ 0x01, old ^ 0x80):
            if v == old:
                continue
            mutable[pos] = v
            try:
                _decode_video_frames(bytes(mutable), every_n=5)
            except (AssertionError, ValueError):
                pass
            except Exception as ex:
                raise AssertionError(
                    f"FVC: unclean {type(ex).__name__} at byte {pos} "
                    f"value {v:#x}: {ex!r}"
                ) from ex
        mutable[pos] = old
    # truncation ladder: every strict prefix fails cleanly
    for cut in range(len(payload)):
        try:
            _decode_video_frames(payload[:cut], every_n=5)
        except (AssertionError, ValueError):
            pass
        except Exception as ex:
            raise AssertionError(
                f"FVC: unclean {type(ex).__name__} at truncation {cut}: {ex!r}"
            ) from ex
        else:
            raise AssertionError(f"FVC: truncated payload ({cut}B) decoded")


def test_fvc_descriptor_corruption_sweep_raises_clean() -> None:
    """The keyframe-DESCRIPTOR parser honors the same clean-error
    contract as _decode_video_frames (same header walk), including its
    two extra gates: an un-chunkable frame_size and a vec_id-colliding
    n_frames must fail as AssertionError, not divide/reshape errors."""
    import struct

    import numpy as np

    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        _decode_video_descriptors,
    )

    d, n_frames, frame_size = 9, 7, 16
    f = np.arange(n_frames, dtype=np.int64)[:, None]
    j = np.arange(frame_size, dtype=np.int64)[None, :]
    frames = ((d * 7 + f * 13 + j * 3) % 256).astype(np.uint8)
    payload = b"FVC1" + struct.pack("<III", n_frames, frame_size, 12) + frames.tobytes()

    # sanity: intact payload pools frames 0 and 5 into 8 chunk sums
    got = _decode_video_descriptors(payload, every_n=5, n_chunks=8)
    assert [t[0] for t in got] == [0, 5]
    assert all(len(t[1]) == 8 for t in got)
    expect0 = frames[0].astype(np.int64).reshape(8, 2).sum(axis=1)
    assert got[0][1] == [float(x) for x in expect0]

    mutable = bytearray(payload)
    for pos in range(16):  # full header sweep
        old = mutable[pos]
        for v in (0x00, 0xFF, old ^ 0x01, old ^ 0x80):
            if v == old:
                continue
            mutable[pos] = v
            try:
                _decode_video_descriptors(bytes(mutable), every_n=5, n_chunks=8)
            except (AssertionError, ValueError):
                pass
            except Exception as ex:
                raise AssertionError(
                    f"FVC desc: unclean {type(ex).__name__} at byte {pos} "
                    f"value {v:#x}: {ex!r}"
                ) from ex
        mutable[pos] = old
    for cut in range(len(payload)):  # truncation ladder
        try:
            _decode_video_descriptors(payload[:cut], every_n=5, n_chunks=8)
        except (AssertionError, ValueError):
            pass
        except Exception as ex:
            raise AssertionError(
                f"FVC desc: unclean {type(ex).__name__} at truncation {cut}: {ex!r}"
            ) from ex
        else:
            raise AssertionError(f"FVC desc: truncated payload ({cut}B) decoded")
