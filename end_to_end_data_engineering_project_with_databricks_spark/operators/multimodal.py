"""Multimodal column conventions: opaque ``binary`` payloads + typed
metadata structs, with Arrow-batched Python plumbing for decode /
feature-extraction (BASELINE.json north star).

Conventions (schema contract):
- payload column: ``BinaryType`` — image/audio/video bytes, opaque to SQL;
- metadata column: ``StructType`` with at least (modality string,
  n_bytes long, source string) — prunable, filterable, JVM-side;
- derived features land in additional typed columns, never by mutating
  the payload.

The actual media decoders (PIL/ffmpeg/etc.) are NOT available in this
environment, so the decode step is a clearly marked deterministic stub —
but the Spark-side plumbing is real and tested: schema handling,
``mapInPandas`` Arrow batching, partition-size control.  Swapping
``_decode_stub`` for a real decoder changes no plan shape.

Scale notes: payloads dominate bytes; keep them in their own column so
column pruning skips them unless touched, repartition by size before the
Python stage (Arrow batch memory = batch_rows x payload size), and set
``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # ship function bodies by value: the PNG helpers are referenced by
    # mapInPandas closures, and executors must not need this package on
    # their import path (same rationale as functions/pandas_fns.py)
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

#: Feature schema produced by decode_features (stub or real).
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, checksum_mod int"
)


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, source_col: str
) -> DataFrame:
    """Promote a text column to the multimodal convention: binary payload
    + metadata struct.  (Fixtures have no real media bytes; UTF-8 text
    bytes stand in — the schema contract is what matters.)"""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB media decode — deterministic fake in lieu of image/audio libs
    (not installed in this container).  Derives (width, height,
    checksum_mod) purely from the payload length so results are
    reproducible and oracle-checkable in plain SQL.  Replace with
    PIL/ffmpeg for real media; the Spark plumbing around it is unchanged."""
    n = len(payload)
    return 64 + n % 512, 64 + (n * 7) % 512, (n * 31) % 251


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over payloads via
    ``mapInPandas`` — the standard shape for Python-side media work:
    batches stream through the worker (never a full-partition
    materialization), output schema declared up front."""

    # NOTE: the decode fn is defined inside the closure so cloudpickle
    # serializes it BY VALUE — Spark's Python workers do not have this
    # package on their import path (the driver may launch from any cwd).
    # It must stay in sync with _decode_stub (unit-tested).

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes) -> tuple[int, int, int]:
            n = len(payload)
            return 64 + n % 512, 64 + (n * 7) % 512, (n * 31) % 251

        for pdf in it:
            decoded = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["payload"].map(len),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "checksum_mod": decoded.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


#: Schema produced by resize_payloads: resized payload + old/new dims.
RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, orig_width int, orig_height int, "
    "width int, height int, n_bytes bigint"
)


def resize_payloads(
    df: DataFrame, target_width: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched resize over payloads via ``mapInPandas`` — the write
    path of media preprocessing: unlike decode_features the payload is
    REPLACED (derived payloads never mutate in place; they are a new
    column in a new relation).  The resize itself is a STUB in lieu of
    image libs: the fake decode's dimensions scale to ``target_width``
    preserving aspect ratio, and the output payload is the input bytes
    resampled by stride — deterministic, so byte lengths and dimensions
    are closed-form and the query layer can oracle-check them in SQL.

    Scale: identical batching rules as decode — payload bytes dominate,
    so cap ``arrow.maxRecordsPerBatch`` and repartition by size before
    this stage; the payload column prunes away for any reader that only
    touches dimensions."""

    # defined in-closure for by-value pickling (see decode_features NOTE)
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize(payload: bytes) -> tuple[bytes, int, int, int, int]:
            n = len(payload)
            ow, oh = 64 + n % 512, 64 + (n * 7) % 512  # _decode_stub dims
            w = min(target_width, ow)
            h = max(1, (oh * w) // ow)
            stride = max(1, n // max(1, w * h // 8))
            return payload[::stride], ow, oh, w, h

        for pdf in it:
            out = pdf["payload"].map(resize)
            resized = out.map(lambda t: t[0])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": resized,
                    "orig_width": out.map(lambda t: t[1]),
                    "orig_height": out.map(lambda t: t[2]),
                    "width": out.map(lambda t: t[3]),
                    "height": out.map(lambda t: t[4]),
                    "n_bytes": resized.map(len),
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling as plan-level plumbing: one row per
    sampled frame index, computed from metadata only (duration proxy =
    n_bytes), payload untouched until a decoder needs it.  Demonstrates
    the explode-by-computed-sequence pattern used for real frame tables."""
    n_frames = (F.col("meta.n_bytes") / F.lit(16)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(
        F.col("doc_id"),
        F.col("meta"),
        F.explode(idx).alias("frame_idx"),
    )


#: output schema of :func:`wav_features`
WAV_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, sum_abs long, max_abs long"
)


def synthesize_wav(df: DataFrame, id_col: str = "doc_id", n_samples: int = 800,
                   sample_rate: int = 8000) -> DataFrame:
    """Deterministic REAL WAV payloads (RIFF header + PCM16 frames via the
    stdlib ``wave`` module): sample ``i`` of doc ``d`` is the int16
    ``((d*31 + i*7) mod 65536) - 32768`` — integer arithmetic a SQL
    oracle can reproduce exactly, unlike a sine (cross-engine float
    transcendentals are not bit-stable).  Unlike the image decode stub
    (no image libs in this environment), the audio path is exercised
    END-TO-END: real container bytes out, real parser back in."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                i = np.arange(n_samples, dtype=np.int64)
                samples = ((int(d) * 31 + i * 7) % 65536 - 32768).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def wav_features(df: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode: parse each payload with the stdlib
    ``wave`` reader (the real RIFF/fmt/data chunk walk, not a length
    heuristic), vectorize the PCM16 frames with numpy, and emit integer
    features (count / sum of |s| / max |s|) that stay bit-exact across
    engines.  The per-batch loop is over ROWS, not samples — numpy does
    the per-sample work, the mapInPandas contract every real media
    decoder (PIL, ffmpeg, soundfile) plugs into unchanged."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(payload), "rb") as w:
                    rate = w.getframerate()
                    raw = w.readframes(w.getnframes())
                s = np.abs(np.frombuffer(raw, dtype="<i2").astype(np.int64))
                rows.append((int(d), len(s), rate, int(s.sum()), int(s.max())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "sum_abs", "max_abs"],
            )

    return df.mapInPandas(batches, schema=WAV_SCHEMA)


def synthesize_bmp(
    df: DataFrame, id_col: str = "doc_id", width: int = 13, height: int = 8
) -> DataFrame:
    """Deterministic REAL 24-bit BMP payloads (BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows, pure ``struct`` packing):
    pixel (x, y) of doc ``d`` has channels
    ``r=(d*7+x*3+y*5)%256, g=(d*11+x+y*2)%256, b=(d*13+x*2+y)%256`` —
    integer arithmetic a SQL oracle reproduces exactly.  The default
    width is deliberately ODD so every row needs the 4-byte alignment
    padding real BMP writers must emit (the classic parser gotcha).
    Like the WAV path, this runs END-TO-END with no image libraries:
    real container bytes out, real header walk back in."""
    import struct

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        row_bytes = width * 3
        padded = (row_bytes + 3) & ~3
        img_size = padded * height
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                x = np.arange(width, dtype=np.int64)[None, :]
                y = np.arange(height, dtype=np.int64)[:, None]
                r = (d * 7 + x * 3 + y * 5) % 256
                g = (d * 11 + x + y * 2) % 256
                b = (d * 13 + x * 2 + y) % 256
                bgr = np.stack(
                    np.broadcast_arrays(b, g, r), axis=-1
                ).astype(np.uint8)  # (h, w, 3) in BGR order
                rows = np.zeros((height, padded), dtype=np.uint8)
                rows[:, :row_bytes] = bgr.reshape(height, row_bytes)
                pixel_data = rows[::-1].tobytes()  # bottom-up storage
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
                    2835, 2835, 0, 0,
                )
                payloads.append(header + pixel_data)
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def synthesize_bmp_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    group_size: int = 3,
    width: int = 13,
    height: int = 8,
) -> DataFrame:
    """Near-duplicate BMP corpus: docs sharing ``doc_id // group_size``
    render the SAME base image (pixel pattern keyed by the group id, same
    arithmetic as :func:`synthesize_bmp`), and every non-canonical group
    member (``doc_id % group_size != 0``) additionally overwrites ONE
    pixel with a doc-specific value — the controlled perturbation that
    makes within-group images near- (not exact-) duplicates for the
    perceptual-hash dedup path."""
    import struct

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        row_bytes = width * 3
        padded = (row_bytes + 3) & ~3
        img_size = padded * height
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                g = d // group_size
                x = np.arange(width, dtype=np.int64)[None, :]
                y = np.arange(height, dtype=np.int64)[:, None]
                # frequencies depend on g so base images differ in
                # STRUCTURE across groups (aHash is invariant to global
                # brightness shifts; a g-linear offset alone would make
                # every group hash-collide)
                fx, fy = 3 + g % 5, 5 + g % 7
                r = np.broadcast_to((g * 7 + x * fx + y * fy) % 256, (height, width)).copy()
                gg = np.broadcast_to((g * 11 + x * fy + y * fx) % 256, (height, width)).copy()
                b = np.broadcast_to((g * 13 + x * 2 + y * fy) % 256, (height, width)).copy()
                if d % group_size:
                    px, py = d % width, d % height
                    r[py, px] = (d * 17) % 256
                    gg[py, px] = (d * 19) % 256
                    b[py, px] = (d * 23) % 256
                bgr = np.stack([b, gg, r], axis=-1).astype(np.uint8)
                rows = np.zeros((height, padded), dtype=np.uint8)
                rows[:, :row_bytes] = bgr.reshape(height, row_bytes)
                pixel_data = rows[::-1].tobytes()
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
                    2835, 2835, 0, 0,
                )
                payloads.append(header + pixel_data)
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def ahash_features(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode the BMP, reduce
    to an 8x8 luma grid by nearest-neighbor sampling, set bit (gy*8+gx)
    iff that cell's luma exceeds the grid mean — all integer arithmetic
    (``64 * luma > total``) so the fingerprint is deterministic across
    platforms.  Emits (doc_id, ahash) 64-bit fingerprints; near-dup
    mining is then EXACTLY the text-SimHash machinery —
    operators/dedup.hamming_near_dup_pairs' banded equi-join, never an
    all-pairs image comparison.  The decode runs Arrow-batched in
    ``mapInPandas`` (numpy per batch); a PIL/DCT-based pHash drops in by
    replacing only the grid reduction."""
    import struct

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                assert payload[:2] == b"BM", "not a BMP container"
                (pix_off,) = struct.unpack_from("<I", payload, 10)
                w, h = struct.unpack_from("<ii", payload, 18)
                (bpp,) = struct.unpack_from("<H", payload, 28)
                assert bpp == 24, f"expected 24-bit BMP, got {bpp}"
                assert h > 0, "top-down (negative-height) BMP not supported"
                padded = (w * 3 + 3) & ~3
                raw = np.frombuffer(
                    payload, dtype=np.uint8, count=padded * h, offset=pix_off
                ).reshape(h, padded)
                bgr = raw[::-1, : w * 3].reshape(h, w, 3).astype(np.int64)
                luma = bgr.sum(axis=-1)  # 3*Y proxy; monotone in mean luma
                gx = (np.arange(8) * w) // 8
                gy = (np.arange(8) * h) // 8
                grid = luma[np.ix_(gy, gx)]
                total = int(grid.sum())
                bits = (64 * grid > total).ravel()
                ah = 0
                for i in np.nonzero(bits)[0]:
                    ah |= 1 << int(i)
                # two's-complement into a signed 64-bit Spark long
                if ah >= 1 << 63:
                    ah -= 1 << 64
                rows.append((int(d), ah))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    return df.mapInPandas(batches, schema="doc_id long, ahash long")


def bmp_features(df: DataFrame) -> DataFrame:
    """Arrow-batched BMP decode: validate the magic, read the pixel-array
    offset / dimensions / bit depth from the headers, walk the bottom-up
    padded rows, and reduce the RGB planes to integer channel sums —
    bit-exact across engines.  A wrong byte anywhere (header field,
    row padding, BGR order, bottom-up flip) breaks the value hash."""
    import struct

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                assert payload[:2] == b"BM", "not a BMP container"
                (pix_off,) = struct.unpack_from("<I", payload, 10)
                w, h = struct.unpack_from("<ii", payload, 18)
                (bpp,) = struct.unpack_from("<H", payload, 28)
                assert bpp == 24, f"expected 24-bit BMP, got {bpp}"
                assert h > 0, "top-down (negative-height) BMP not supported"
                padded = (w * 3 + 3) & ~3
                raw = np.frombuffer(
                    payload, dtype=np.uint8, count=padded * h, offset=pix_off
                ).reshape(h, padded)
                bgr = raw[::-1, : w * 3].reshape(h, w, 3).astype(np.int64)
                rows.append(
                    (
                        int(d),
                        w * h,
                        int(bgr[..., 2].sum()),
                        int(bgr[..., 1].sum()),
                        int(bgr[..., 0].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pixels", "sum_r", "sum_g", "sum_b"]
            )

    return df.mapInPandas(
        batches,
        schema="doc_id long, n_pixels long, sum_r long, sum_g long, sum_b long",
    )


# ---------------------------------------------------------------------------
# PNG: the dominant lossless web format, decodable with stdlib zlib alone
# (VERDICT r3 stretch 6).  Real containers both ways: the writer emits
# CRC-checked chunks and per-row FILTERED scanlines, the reader walks the
# chunks, inflates, and reverses all five filter types.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(t: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter type ``t`` to one raw scanline (encoder side)."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if t == 0:
            pred = 0
        elif t == 1:
            pred = a
        elif t == 2:
            pred = b
        elif t == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(t: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    """Reverse PNG filter type ``t`` on one scanline (decoder side)."""
    out = bytearray(len(filt))
    for i in range(len(filt)):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if t == 0:
            pred = 0
        elif t == 1:
            pred = a
        elif t == 2:
            pred = b
        elif t == 3:
            pred = (a + b) >> 1
        elif t == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {t}")
        out[i] = (filt[i] + pred) & 0xFF
    return bytes(out)


def _encode_png(rgb: "np.ndarray") -> bytes:
    """Minimal-but-real truecolor 8-bit PNG writer (stdlib only).

    Filter type cycles y % 5 so every decoder path (None/Sub/Up/Average/
    Paeth) is exercised on every image taller than 4 rows."""
    import struct
    import zlib

    import numpy as np  # noqa: F401 - rgb is an ndarray

    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB, no interlace
    prev = bytes(w * 3)
    scanlines = bytearray()
    for y in range(h):
        raw = rgb[y].tobytes()
        t = y % 5
        scanlines += bytes([t]) + _filter_row(t, raw, prev, 3)
        prev = raw
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> "np.ndarray":
    """Real PNG decoder: signature + CRC-verified chunk walk + zlib
    inflate + per-row unfilter.  Supports the truecolor 8-bit
    non-interlaced subset this engine writes; anything else raises."""
    import struct
    import zlib

    import numpy as np

    assert payload[:8] == _PNG_SIG, "not a PNG container"
    pos, w, h = 8, None, None
    idat = bytearray()
    while pos < len(payload):
        assert pos + 8 <= len(payload), "truncated chunk header"
        (length,) = struct.unpack_from(">I", payload, pos)
        # declared length must fit before slicing, or the CRC unpack
        # below raises struct.error instead of a clean message (ADVICE r4)
        assert pos + 12 + length <= len(payload), "chunk length overruns payload"
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        assert crc == zlib.crc32(ctype + data), f"CRC mismatch in {ctype!r}"
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            assert depth == 8 and color == 2, "only 8-bit truecolor supported"
            assert comp == 0 and filt == 0 and interlace == 0
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    assert w is not None and h is not None, "missing IHDR"
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    assert len(raw) == h * (stride + 1), "inflated size mismatch"
    prev = bytes(stride)
    rows = []
    for y in range(h):
        off = y * (stride + 1)
        prev = _unfilter_row(raw[off], raw[off + 1 : off + 1 + stride], prev, 3)
        rows.append(np.frombuffer(prev, dtype=np.uint8))
    return np.stack(rows).reshape(h, w, 3)


def synthesize_png(
    df: DataFrame, id_col: str = "doc_id", width: int = 13, height: int = 8
) -> DataFrame:
    """Deterministic REAL PNG payloads: same per-pixel arithmetic as
    :func:`synthesize_bmp` (``r=(d*7+x*3+y*5)%256`` etc.), so the two
    container formats share one SQL oracle — the round-trip proves the
    CONTAINER layer (chunks, CRCs, deflate, row filters), not new pixel
    math.  Pure stdlib ``zlib``/``struct``; no image libraries."""
    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                x = np.arange(width, dtype=np.int64)[None, :]
                y = np.arange(height, dtype=np.int64)[:, None]
                r = (d * 7 + x * 3 + y * 5) % 256
                g = (d * 11 + x + y * 2) % 256
                b = (d * 13 + x * 2 + y) % 256
                rgb = np.stack(
                    np.broadcast_arrays(r, g, b), axis=-1
                ).astype(np.uint8)
                payloads.append(_encode_png(rgb))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def png_features(df: DataFrame) -> DataFrame:
    """Arrow-batched PNG decode to integer channel sums — identical
    output contract to :func:`bmp_features`, so the same oracle checks
    both containers bit-for-bit."""
    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                rgb = _decode_png(payload).astype(np.int64)
                h, w, _ = rgb.shape
                rows.append(
                    (
                        int(d),
                        w * h,
                        int(rgb[..., 0].sum()),
                        int(rgb[..., 1].sum()),
                        int(rgb[..., 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pixels", "sum_r", "sum_g", "sum_b"]
            )

    return df.mapInPandas(
        batches,
        schema="doc_id long, n_pixels long, sum_r long, sum_g long, sum_b long",
    )


def png_ahash_features(df: DataFrame) -> DataFrame:
    """aHash over PNG payloads: decode via :func:`_decode_png`, then the
    SAME integer 8x8 grid reduction as :func:`ahash_features` — the
    banded-Hamming dedup pipeline is container-agnostic (tests assert
    BMP and PNG renderings of one image produce identical hashes)."""
    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                rgb = _decode_png(payload).astype(np.int64)
                h, w, _ = rgb.shape
                luma = rgb.sum(axis=-1)
                gx = (np.arange(8) * w) // 8
                gy = (np.arange(8) * h) // 8
                grid = luma[np.ix_(gy, gx)]
                total = int(grid.sum())
                bits = (64 * grid > total).ravel()
                ah = 0
                for i in np.nonzero(bits)[0]:
                    ah |= 1 << int(i)
                if ah >= 1 << 63:
                    ah -= 1 << 64
                rows.append((int(d), ah))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    return df.mapInPandas(batches, schema="doc_id long, ahash long")
