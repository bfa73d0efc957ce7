"""Property-based tests for the stdlib PNG codec (operators/multimodal).

The unit vectors pin known filter outputs; hypothesis drives the
encoder/decoder across arbitrary image shapes and pixel contents so a
latent stride/filter/boundary bug can't hide behind the fixture's fixed
13x8 geometry.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from end_to_end_data_engineering_project_with_databricks_spark.operators.multimodal import (
    _decode_png,
    _encode_png,
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_arbitrary_images(w: int, h: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = _decode_png(_encode_png(rgb))
    assert out.shape == (h, w, 3)
    assert (out == rgb).all()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=5, max_value=16),
    const=st.integers(min_value=0, max_value=255),
)
def test_png_constant_images_compress_and_roundtrip(w, h, const) -> None:
    # constant images exercise the filters' zero-delta paths and must
    # still roundtrip exactly (h >= 5 covers all five filter types)
    rgb = np.full((h, w, 3), const, dtype=np.uint8)
    assert (_decode_png(_encode_png(rgb)) == rgb).all()


def test_png_corrupt_crc_rejected() -> None:
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(_encode_png(rgb))
    payload[-5] ^= 0xFF  # flip a bit inside the IEND CRC
    try:
        _decode_png(bytes(payload))
    except AssertionError as e:
        assert "CRC" in str(e)
    else:  # pragma: no cover
        raise AssertionError("corrupt CRC must be rejected")
