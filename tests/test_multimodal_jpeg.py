"""Baseline JPEG codec pair (VERDICT r5 stretch 7, operator tier).

The registry is FROZEN this round (the r6 window carries the entire
attestation backlog), so ``mm_jpeg_decode`` registers in r7 with a
window slot; these tests land the codec now: container structure,
Huffman/DCT round-trip determinism, the quantization-loss envelope the
r7 bounded oracle will assert, and the Spark mapInPandas plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest

from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
    _decode_jpeg,
    _encode_jpeg,
    _JPEG_ZIGZAG,
    jpeg_features,
    synthesize_jpeg,
)


def _formula_rgb(d: int, width: int = 13, height: int = 8) -> np.ndarray:
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    r = (d * 7 + x * 3 + y * 5) % 256
    g = (d * 11 + x + y * 2) % 256
    b = (d * 13 + x * 2 + y) % 256
    return np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)


def test_zigzag_is_a_permutation() -> None:
    assert sorted(_JPEG_ZIGZAG) == list(range(64))
    # spec spot-checks: first diagonal and last entries
    assert _JPEG_ZIGZAG[:6] == (0, 1, 8, 16, 9, 2)
    assert _JPEG_ZIGZAG[-4:] == (47, 55, 62, 63)


def test_container_structure() -> None:
    payload = _encode_jpeg(_formula_rgb(3))
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    # marker order: APP0(JFIF), 2x DQT, SOF0, 4x DHT, SOS
    def markers(p: bytes) -> list[int]:
        import struct

        out, pos = [], 2
        while pos < len(p) - 2:
            m = struct.unpack_from(">H", p, pos)[0]
            out.append(m)
            if m == 0xFFDA:
                break
            pos += 2 + struct.unpack_from(">H", p, pos + 2)[0]
        return out

    ms = markers(payload)
    assert ms[0] == 0xFFE0 and payload[6:11] == b"JFIF\x00"
    assert ms.count(0xFFDB) == 2 and ms.count(0xFFC4) == 4
    assert 0xFFC0 in ms and ms[-1] == 0xFFDA


@pytest.mark.parametrize("shape", [(8, 8), (8, 13), (17, 23), (1, 1), (16, 16)])
def test_roundtrip_shape_determinism_and_loss_envelope(shape) -> None:
    h, w = shape
    rgb = _formula_rgb(11, width=w, height=h)
    payload = _encode_jpeg(rgb)
    dec = _decode_jpeg(payload)
    assert dec.shape == rgb.shape and dec.dtype == np.uint8
    # bit-determinism both directions (the property the r7 oracle needs)
    assert payload == _encode_jpeg(rgb)
    assert (dec == _decode_jpeg(payload)).all()
    # loss envelope: the modular pixel formula has 256->0 wrap edges (the
    # hardest content for a DCT codec); measured worst deviation at
    # quality 90 across these shapes is 17/pixel and well under 3/pixel
    # on channel MEANS — the r7 bounded oracle asserts the mean bound
    err = np.abs(dec.astype(np.int64) - rgb.astype(np.int64))
    assert err.max() <= 48, err.max()
    assert err.mean() <= 3.0, err.mean()


def test_truncated_and_corrupt_payloads_fail_cleanly() -> None:
    payload = _encode_jpeg(_formula_rgb(5))
    with pytest.raises(AssertionError, match="SOI"):
        _decode_jpeg(b"\x00\x01" + payload[2:])
    # cuts anywhere in the stream fail with a CLEAN error (assertion or
    # Huffman ValueError), never a bare IndexError from the bit reader
    for cut in (len(payload) - 40, len(payload) // 2, 30):
        with pytest.raises((AssertionError, ValueError)):
            _decode_jpeg(payload[:cut])


def test_magnitude_extend_inverse_property() -> None:
    """F.1.2 magnitude coding and F.2.2.1 EXTEND are exact inverses over
    the full baseline coefficient range — the identity every decoded
    coefficient rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
        _jpeg_extend,
        _jpeg_magnitude,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-2047, max_value=2047))
    def roundtrip(v: int) -> None:
        size, bits = _jpeg_magnitude(v)
        assert 0 <= size <= 11 and 0 <= bits < (1 << max(size, 1))
        assert _jpeg_extend(bits, size) == v

    roundtrip()


def test_flat_block_is_lossless() -> None:
    rgb = np.full((8, 8, 3), 128, dtype=np.uint8)
    assert (_decode_jpeg(_encode_jpeg(rgb)) == rgb).all()


def test_spark_pipeline_channel_sums_within_envelope(spark) -> None:
    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    feats = {
        r.doc_id: r
        for r in jpeg_features(synthesize_jpeg(ids, "doc_id")).collect()
    }
    assert len(feats) == 12
    for d in range(12):
        src = _formula_rgb(d).astype(np.int64)
        row = feats[d]
        n = src.shape[0] * src.shape[1]
        assert row.n_pixels == n
        for ch, col in enumerate(("sum_r", "sum_g", "sum_b")):
            exact = int(src[..., ch].sum())
            # channel-sum deviation <= 3 per pixel on average (see above)
            assert abs(getattr(row, col) - exact) <= 3 * n, (d, col)


@pytest.mark.parametrize(
    "scale_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_staged_mm_jpeg_decode_vs_oracle(spark, scale_dir: str) -> None:
    """The STAGED r7 query hash-matches its bounded DuckDB oracle at every
    fixture scale — exactly the driver's t2 gate, run early so r7's
    registration commit is a pure one-liner with pre-validated evidence."""
    from tests.oracle import duckdb_connection, compare
    from end_to_end_data_engineering_project_with_databricks_spark.queries.multimodal import (
        MM_JPEG_DECODE_ORACLE,
        mm_jpeg_decode,
    )

    con = duckdb_connection(scale_dir)
    try:
        problems = compare(mm_jpeg_decode(spark, scale_dir), con, MM_JPEG_DECODE_ORACLE)
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_random_image_roundtrip_property() -> None:
    """Arbitrary uint8 content (not just the formula pattern): shape and
    dtype survive, encode is bit-deterministic, and the q90 loss envelope
    holds.  White noise is the worst DCT content — measured worst mean
    deviation 7.4/pixel, worst absolute 53 over 30 seeded trials — so the
    bounds here carry ~2x headroom while the formula-pattern envelope the
    staged oracle asserts stays the tight 3/pixel."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def roundtrip(h: int, w: int, seed: int) -> None:
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
        payload = _encode_jpeg(img)
        assert payload == _encode_jpeg(img)
        dec = _decode_jpeg(payload)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(np.int64) - img.astype(np.int64))
        assert err.mean() <= 15.0, err.mean()
        assert err.max() <= 110, err.max()

    roundtrip()


def test_single_byte_corruption_never_crashes_raw() -> None:
    """Flip any single byte: the reader either still decodes (entropy
    bits absorb many flips) or raises a CLEAN AssertionError/ValueError —
    never IndexError/KeyError/struct.error.  This is the poison-payload
    guarantee the Spark mapInPandas path relies on: a corrupt shard must
    surface as a typed per-record failure, not an executor crash."""
    payload = bytearray(_encode_jpeg(_formula_rgb(7)))
    rng = np.random.default_rng(42)
    for _ in range(80):
        pos = int(rng.integers(2, len(payload) - 2))  # keep SOI/EOI anchors
        old = payload[pos]
        payload[pos] = int(rng.integers(0, 256))
        try:
            out = _decode_jpeg(bytes(payload))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (AssertionError, ValueError):
            pass
        finally:
            payload[pos] = old
