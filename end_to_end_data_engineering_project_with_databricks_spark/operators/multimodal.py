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
                   sample_rate: int = 8000, dead_air: bool = False) -> DataFrame:
    """Deterministic REAL WAV payloads (RIFF header + PCM16 frames via the
    stdlib ``wave`` module): sample ``i`` of doc ``d`` is the int16
    ``((d*31 + i*7) mod 65536) - 32768`` — integer arithmetic a SQL
    oracle can reproduce exactly, unlike a sine (cross-engine float
    transcendentals are not bit-stable).  Unlike the image decode stub
    (no image libs in this environment), the audio path is exercised
    END-TO-END: real container bytes out, real parser back in.

    ``dead_air=True`` zeroes every odd 160-sample window of every
    ``d % 4 == 1`` clip — deterministic silence so the VAD gate
    (:func:`audio_energy_windows` + the curation capstone) has REAL
    dead air to detect instead of a vacuously-false flag; the oracle
    reproduces the gate as a CASE over ``(i // 160) % 2``."""
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
                if dead_air and int(d) % 4 == 1:
                    samples = samples.copy()
                    samples[(i // 160) % 2 == 1] = 0
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def _decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Parse one WAV payload with the stdlib ``wave`` reader (the real
    RIFF/fmt/data chunk walk) and reduce the PCM16 frames to integer
    features ``(n_samples, sample_rate, sum_abs, max_abs)``.

    Failure contract: corrupt payloads raise AssertionError/ValueError
    like the BMP/PNG/JPEG readers — stdlib wave's failure modes
    (``wave.Error``, ``EOFError``, and the bare ``RuntimeError`` its
    chunk seek raises on a corrupt chunk size — found by the
    tests/test_multimodal_ops.py corruption sweep) are normalized to a
    typed per-record ValueError, never an executor crash class."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, RuntimeError) as ex:
        raise ValueError(f"corrupt WAV stream: {ex!r}") from ex
    s = np.abs(np.frombuffer(raw, dtype="<i2").astype(np.int64))
    return len(s), rate, int(s.sum()), int(s.max()) if len(s) else 0


def wav_features(df: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode: :func:`_decode_wav` per payload, emitting
    integer features (count / sum of |s| / max |s|) that stay bit-exact
    across engines.  The per-batch loop is over ROWS, not samples — numpy
    does the per-sample work, the mapInPandas contract every real media
    decoder (PIL, ffmpeg, soundfile) plugs into unchanged."""
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = [
                (int(d), *_decode_wav(payload))
                for d, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "sum_abs", "max_abs"],
            )

    return df.mapInPandas(batches, schema=WAV_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, win_id long, n_samples long, energy_sum long, "
    "peak_abs long, is_silent boolean"
)


def audio_energy_windows(
    df: DataFrame, win: int = 160, silence_rms: int = 1000
) -> DataFrame:
    """Windowed audio energy / silence detection over decoded PCM16 WAV
    payloads — the VAD-shaped front gate of a speech-data curation
    pipeline (silence trimming, dead-air filtering) expressed with the
    same Arrow-batched mapInPandas contract as :func:`wav_features`.

    Each payload's frames split into fixed ``win``-sample windows (20 ms
    at 8 kHz with the default 160; a trailing partial window keeps its
    true ``n_samples``); per window the operator emits the INTEGER
    energy sum (sum of squared samples — int64-exact: 160 x 32768^2 ~
    1.7e11), the peak magnitude, and an ``is_silent`` flag from the pure
    integer comparison ``energy_sum < n * silence_rms^2`` (mean square
    below silence_rms^2, i.e. RMS below ``silence_rms``) — no float
    ever, so a SQL oracle replays every value exactly.

    Scale shape: one narrow Arrow pass, rows out = rows in x
    windows-per-clip; numpy does the per-sample work (reshape + square +
    sum per batch), the Python loop is per ROW.  A real resampler or
    soundfile decoder drops into the same batch function unchanged."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        thresh = silence_rms * silence_rms
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "win_id": [], "n_samples": [],
                "energy_sum": [], "peak_abs": [], "is_silent": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        raw = w.readframes(w.getnframes())
                except (wave.Error, EOFError, RuntimeError) as ex:
                    raise ValueError(f"corrupt WAV stream: {ex!r}") from ex
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                for wid in range(0, (len(s) + win - 1) // win):
                    chunk = s[wid * win : (wid + 1) * win]
                    e = int((chunk * chunk).sum())
                    out["doc_id"].append(int(d))
                    out["win_id"].append(wid)
                    out["n_samples"].append(len(chunk))
                    out["energy_sum"].append(e)
                    out["peak_abs"].append(int(np.abs(chunk).max()) if len(chunk) else 0)
                    out["is_silent"].append(e < len(chunk) * thresh)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)


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


def _decode_bmp_sums(payload: bytes) -> tuple[int, int, int, int]:
    """Parse one 24-bit BMP payload — validate the magic, read the
    pixel-array offset / dimensions / bit depth, walk the bottom-up
    padded rows — and reduce the RGB planes to
    ``(n_pixels, sum_r, sum_g, sum_b)``.  Same AssertionError/ValueError
    failure contract as the WAV/PNG/JPEG readers (corruption-swept in
    tests/test_multimodal_ops.py)."""
    import struct

    import numpy as np

    assert len(payload) >= 30, "truncated BMP header"
    assert payload[:2] == b"BM", "not a BMP container"
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    assert bpp == 24, f"expected 24-bit BMP, got {bpp}"
    assert h > 0, "top-down (negative-height) BMP not supported"
    assert w > 0, "non-positive BMP width"
    padded = (w * 3 + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=padded * h, offset=pix_off
    ).reshape(h, padded)
    bgr = raw[::-1, : w * 3].reshape(h, w, 3).astype(np.int64)
    return (
        w * h,
        int(bgr[..., 2].sum()),
        int(bgr[..., 1].sum()),
        int(bgr[..., 0].sum()),
    )


def bmp_features(df: DataFrame) -> DataFrame:
    """Arrow-batched BMP decode: :func:`_decode_bmp_sums` per payload,
    bit-exact across engines.  A wrong byte anywhere (header field,
    row padding, BGR order, bottom-up flip) breaks the value hash."""
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = [
                (int(d), *_decode_bmp_sums(payload))
                for d, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
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


# ---------------------------------------------------------------------------
# JPEG: the dominant LOSSY format (VERDICT r5 stretch 7).  A real baseline
# sequential DCT codec pair in pure stdlib+numpy: the writer emits a
# spec-shaped JFIF stream (SOI/APP0/DQT/SOF0 4:4:4/DHT Annex-K/SOS/EOI)
# with standard Huffman tables and zigzag order; the reader walks the
# markers, Huffman-decodes the MCUs, dequantizes, runs the IDCT, and
# converts YCbCr back to clamped RGB.  Unlike BMP/PNG the transform is
# lossy, so the r7 oracle plan is the bounded-check pattern: exact
# formula-pixel sums (SQL-replayable, as in mm_bmp/mm_png) plus a boolean
# asserting the decoded sums sit within the quantization-error envelope
# (tests/test_multimodal_jpeg.py measures the actual deviation).
# ---------------------------------------------------------------------------

#: JPEG zigzag scan order (spec Figure 5): index = zigzag position,
#: value = raster position within the 8x8 block.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.1 luminance quantization table (raster order), scaled at the
#: encoder by _JPEG_QUALITY.
_JPEG_QL = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)

#: Annex K.2 chrominance quantization table (raster order).
_JPEG_QC = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

_JPEG_QUALITY = 90

#: Annex K.3 Huffman table specs: (BITS counts per code length 1..16,
#: HUFFVAL symbol list).
_DHT_DC_L = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_DHT_DC_C = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_DHT_AC_L = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)
_DHT_AC_C = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)


def _jpeg_quant_tables():
    """Annex-K tables scaled by the fixed quality (libjpeg convention)."""
    scale = 200 - 2 * _JPEG_QUALITY if _JPEG_QUALITY >= 50 else 5000 // _JPEG_QUALITY
    ql = [max(1, min(255, (q * scale + 50) // 100)) for q in _JPEG_QL]
    qc = [max(1, min(255, (q * scale + 50) // 100)) for q in _JPEG_QC]
    return ql, qc


def _huff_codes(bits, huffval):
    """Spec C.2: generate (symbol -> (code, length)) from BITS/HUFFVAL."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # clean message on truncated scans instead of a bare IndexError
        # (same hardening class as _decode_png's chunk-length bound)
        assert self.pos < len(self.data), "truncated entropy-coded scan"
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:  # un-stuff
            assert self.pos < len(self.data), "truncated byte stuffing"
            nxt = self.data[self.pos]
            assert nxt == 0x00, f"unexpected marker 0xFF{nxt:02X} in scan"
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """DPCM/AC coefficient -> (size category, amplitude bits) per F.1.2."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _jpeg_extend(bits: int, size: int) -> int:
    """Inverse of _jpeg_magnitude (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _dct_matrix():
    import numpy as np

    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * 0.5
    m[0, :] = 0.5 / np.sqrt(2.0)
    return m


def _rgb_to_ycbcr(rgb):
    import numpy as np

    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc):
    import numpy as np

    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _encode_jpeg(rgb) -> bytes:
    """Baseline sequential JFIF writer: 4:4:4 sampling (one 8x8 block
    per component per MCU), Annex-K Huffman/quant tables, quality fixed
    at _JPEG_QUALITY.  Pure numpy + stdlib struct."""
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    ql, qc = _jpeg_quant_tables()
    dctm = _dct_matrix()

    # pad to 8x8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = _rgb_to_ycbcr(rgb)
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    dc_l = _huff_codes(*_DHT_DC_L)
    ac_l = _huff_codes(*_DHT_AC_L)
    dc_c = _huff_codes(*_DHT_DC_C)
    ac_c = _huff_codes(*_DHT_AC_C)

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                block = ycc[by : by + 8, bx : bx + 8, comp] - 128.0
                coef = dctm @ block @ dctm.T
                q = np.array(ql if comp == 0 else qc, dtype=np.float64).reshape(8, 8)
                quant = np.round(coef / q).astype(np.int64)
                zz = quant.ravel()[list(_JPEG_ZIGZAG)]
                dctab = dc_l if comp == 0 else dc_c
                actab = ac_l if comp == 0 else ac_c
                diff = int(zz[0]) - pred[comp]
                pred[comp] = int(zz[0])
                size, bits = _jpeg_magnitude(diff)
                code, length = dctab[size]
                bw.write(code, length)
                if size:
                    bw.write(bits, size)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = actab[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    size, bits = _jpeg_magnitude(v)
                    code, length = actab[(run << 4) | size]
                    bw.write(code, length)
                    bw.write(bits, size)
                    run = 0
                if run:
                    code, length = actab[0x00]  # EOB
                    bw.write(code, length)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, huffval = spec
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)

    zz_ql = bytes(ql[_JPEG_ZIGZAG[i]] for i in range(64))
    zz_qc = bytes(qc[_JPEG_ZIGZAG[i]] for i in range(64))
    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_ql)
    out += seg(0xFFDB, b"\x01" + zz_qc)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling: 4:4:4
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0, _DHT_DC_L))
    out += seg(0xFFC4, dht(1, 0, _DHT_AC_L))
    out += seg(0xFFC4, dht(0, 1, _DHT_DC_C))
    out += seg(0xFFC4, dht(1, 1, _DHT_AC_C))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _decode_jpeg(payload: bytes):
    """Baseline sequential JFIF reader for the subset this engine writes
    (single scan, 4:4:4, 8-bit): marker walk, Huffman MCU decode,
    dequantize, IDCT, YCbCr->RGB.  Tables are read from the STREAM (not
    assumed), so any spec-shaped baseline 4:4:4 JPEG decodes."""
    import struct

    import numpy as np

    assert payload[:2] == b"\xFF\xD8", "not a JPEG (missing SOI)"
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    w = h = None
    comp_spec = []  # (cid, tq)
    scan_comp = []  # (cid, dc_tid, ac_tid)
    scan_start = None
    while pos < len(payload):
        # declared lengths must fit before slicing — truncated or
        # corrupt streams get a clean message, not struct/IndexError
        # (the _decode_png chunk-length hardening class, ADVICE r4)
        assert pos + 4 <= len(payload), "truncated marker segment"
        assert payload[pos] == 0xFF, f"expected marker at {pos}"
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        assert pos + 2 + length <= len(payload), "segment overruns payload"
        data = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            off = 0
            while off < len(data):
                assert off + 65 <= len(data), "truncated DQT segment"
                pq_tq = data[off]
                assert pq_tq >> 4 == 0, "only 8-bit quant tables"
                tid = pq_tq & 0x0F
                zz = list(data[off + 1 : off + 65])
                raster = [0] * 64
                for i, rpos in enumerate(_JPEG_ZIGZAG):
                    raster[rpos] = zz[i]
                qt[tid] = raster
                off += 65
        elif marker == 0xFFC0:
            # length check BEFORE the unpack: a corrupt SOF0 length field
            # otherwise raises struct.error instead of a clean message
            assert len(data) >= 6, "truncated SOF0 segment"
            precision, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            assert precision == 8 and nc == 3, "only 8-bit 3-component"
            assert len(data) >= 6 + 3 * nc, "truncated SOF0 segment"
            for c in range(nc):
                cid, sampling, tq = data[6 + 3 * c : 9 + 3 * c]
                assert sampling == 0x11, "only 4:4:4 (1x1 sampling)"
                comp_spec.append((cid, tq))
        elif marker == 0xFFC4:
            off = 0
            while off < len(data):
                assert off + 17 <= len(data), "truncated DHT segment"
                cls_tid = data[off]
                bits = tuple(data[off + 1 : off + 17])
                n = sum(bits)
                assert off + 17 + n <= len(data), "truncated DHT symbols"
                huffval = tuple(data[off + 17 : off + 17 + n])
                codes = _huff_codes(bits, huffval)
                # decoder-side: (length, code) -> symbol
                huff[(cls_tid >> 4, cls_tid & 0x0F)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                off += 17 + n
        elif marker == 0xFFDA:
            assert len(data) >= 1, "truncated SOS segment"
            ns = data[0]
            assert len(data) >= 1 + 2 * ns + 3, "truncated SOS components"
            for c in range(ns):
                cid, tids = data[1 + 2 * c], data[2 + 2 * c]
                scan_comp.append((cid, tids >> 4, tids & 0x0F))
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    assert w is not None and scan_start is not None, "missing SOF0/SOS"
    # Cross-segment reference checks: a corrupt SOS/SOF0 byte can point a
    # scan component at a Huffman or quant table that no DHT/DQT defined,
    # which would surface as a bare KeyError mid-entropy-decode (found by
    # tests/test_multimodal_jpeg.py single-byte corruption sweep).  Fail
    # clean BEFORE the scan loop instead.
    frame_tq = dict(comp_spec)
    for cid, dc_tid, ac_tid in scan_comp:
        assert cid in frame_tq, f"scan references unknown component {cid}"
        assert (0, dc_tid) in huff, f"undefined DC Huffman table {dc_tid}"
        assert (1, ac_tid) in huff, f"undefined AC Huffman table {ac_tid}"
        assert frame_tq[cid] in qt, f"undefined quant table {frame_tq[cid]}"

    def read_symbol(br: _BitReader, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    dctm = _dct_matrix()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = np.zeros((ph, pw, 3), dtype=np.float64)
    br = _BitReader(payload[scan_start : len(payload) - 2])
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, dc_tid, ac_tid) in enumerate(scan_comp):
                tq = dict(comp_spec)[cid]
                q = np.array(qt[tq], dtype=np.float64).reshape(8, 8)
                zz = np.zeros(64, dtype=np.int64)
                size = read_symbol(br, huff[(0, dc_tid)])
                # spec F.1.2.1.1: DC magnitude category <= 11 for 8-bit
                # baseline (we allow <= 15 slack); a corrupt DHT huffval
                # can deliver up to 255, whose 255-bit magnitude would
                # overflow the int64 coefficient array mid-decode
                assert size <= 15, f"corrupt DC magnitude category {size}"
                diff = _jpeg_extend(br.read(size), size) if size else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = read_symbol(br, huff[(1, ac_tid)])
                    run, size = rs >> 4, rs & 0x0F
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    assert k < 64, "AC run overflows block"
                    zz[k] = _jpeg_extend(br.read(size), size)
                    k += 1
                quant = np.zeros(64, dtype=np.int64)
                quant[list(_JPEG_ZIGZAG)] = zz
                coef = quant.reshape(8, 8) * q
                block = dctm.T @ coef @ dctm + 128.0
                ycc[by : by + 8, bx : bx + 8, ci] = block
    return _ycbcr_to_rgb(ycc[:h, :w, :])


def synthesize_jpeg(
    df: DataFrame, id_col: str = "doc_id", width: int = 13, height: int = 8
) -> DataFrame:
    """Deterministic REAL JPEG payloads over the SAME per-pixel formula
    as :func:`synthesize_bmp` / :func:`synthesize_png` — the source
    pixels stay SQL-replayable, and the codec's loss envelope is what
    the bounded check (r7 oracle plan) measures."""
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
                payloads.append(_encode_jpeg(rgb))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def jpeg_features(df: DataFrame) -> DataFrame:
    """Arrow-batched JPEG decode to integer channel sums — the same
    output contract as :func:`bmp_features` / :func:`png_features`, so
    the r7 bounded oracle can anchor on the SQL-replayable source-pixel
    sums and bound the codec deviation."""
    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                rgb = _decode_jpeg(payload).astype(np.int64)
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


def poison_payload_byte(
    df: DataFrame,
    byte_pos: int,
    value: int,
    when: Column,
    payload_col: str = "payload",
) -> DataFrame:
    """Overwrite one byte of ``payload_col`` (1-indexed ``byte_pos``)
    with ``value`` on the rows matching ``when`` — a deterministic
    poison-injection harness for the permissive decode path.  Pure
    JVM-side binary surgery (``substring``/``concat`` work on BinaryType),
    so the corruption itself costs no Python round-trip."""
    poisoned = F.concat(
        F.expr(f"substring({payload_col}, 1, {byte_pos - 1})"),
        F.lit(bytes([value])),
        F.expr(f"substring({payload_col}, {byte_pos + 1}, 2147483647)"),
    )
    return df.withColumn(payload_col, F.when(when, poisoned).otherwise(F.col(payload_col)))


def decode_features_permissive(
    df: DataFrame,
    decoder: "Callable[[bytes], tuple]",
    feature_names: tuple[str, ...],
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Poison-tolerant Arrow-batched decode: apply ``decoder`` (one of
    the ``_decode_*`` readers, all of which honor the clean-error
    contract — see the corruption sweep in tests/test_multimodal_ops.py)
    per record; a clean failure (AssertionError/ValueError) becomes a
    ``decode_ok = false`` row with null features and the typed message in
    ``error`` instead of a task-killing exception.  The BinaryType twin
    of the JSON scan's PERMISSIVE + columnNameOfCorruptRecord mode
    (queries/sources_sinks.py): at 100 TB a handful of poison records per
    billion is CERTAIN, and one of them must not kill a 1000-executor
    job.  Any error class OUTSIDE the contract still propagates — a
    decoder bug should fail loudly, only corrupt DATA is tolerated."""
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = []
            for d, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    feats = decoder(bytes(payload))
                    rows.append((int(d), True, *feats, None))
                except (AssertionError, ValueError) as ex:
                    rows.append(
                        (int(d), False, *([None] * len(feature_names)), str(ex))
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "decode_ok", *feature_names, "error"]
            )

    feature_schema = ", ".join(f"{n} long" for n in feature_names)
    return df.mapInPandas(
        batches,
        schema=f"{id_col} long, decode_ok boolean, {feature_schema}, error string",
    )


#: Schema produced by video_frame_features: one row per SAMPLED frame.
VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, fps int, "
    "sum_bytes bigint, max_byte int"
)

#: Magic prefix of the deterministic fake video container ("fake video
#: container v1") — the stand-in for MP4/MKV, which need ffmpeg.
_FVC_MAGIC = b"FVC1"
_FVC_HEADER_LEN = 16


def synthesize_video(
    df: DataFrame, id_col: str = "doc_id", frame_size: int = 64, fps: int = 12
) -> DataFrame:
    """Deterministic fake VIDEO containers into a binary column: a
    16-byte header (magic ``FVC1`` + little-endian uint32 n_frames /
    frame_size / fps) followed by ``n_frames`` fixed-size frames where
    byte ``j`` of frame ``f`` for doc ``d`` is ``(d*7 + f*13 + j*3) %
    256`` — the same integer-arithmetic convention as the WAV/BMP/PNG
    synthesizers, so a SQL oracle regenerates every byte.  ``n_frames =
    24 + d % 40`` varies per doc to exercise variable-length streams.

    Real video needs ffmpeg (not in this container); per the multimodal
    contract the CONTAINER is the deterministic fake while the Spark
    plumbing — binary column, Arrow batches, header parse, frame slicing
    — is real and is exactly what an ffmpeg demuxer drops into."""
    import struct

    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                n_frames = 24 + d % 40
                f = np.arange(n_frames, dtype=np.int64)[:, None]
                j = np.arange(frame_size, dtype=np.int64)[None, :]
                frames = ((d * 7 + f * 13 + j * 3) % 256).astype(np.uint8)
                payloads.append(
                    _FVC_MAGIC
                    + struct.pack("<III", n_frames, frame_size, fps)
                    + frames.tobytes()
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def _decode_video_frames(
    payload: bytes, every_n: int = 5
) -> list[tuple[int, int, int, int, int]]:
    """Parse one FVC container and extract every ``every_n``-th frame,
    reduced to integer features ``(frame_idx, n_frames, fps, sum_bytes,
    max_byte)`` — the frame-SAMPLING read path: only sampled frames are
    touched, the rest of the payload is skipped by offset arithmetic
    exactly as a real demuxer seeks keyframes.

    Failure contract (the codec-wide clean-error rule, enforced by the
    tests/test_multimodal_ops.py corruption sweep): corrupt payloads
    raise AssertionError/ValueError only — header shorter than 16
    bytes, wrong magic, zero/over-size fields, or a payload length that
    disagrees with ``n_frames * frame_size`` all fail cleanly before
    any slicing."""
    import struct

    import numpy as np

    assert len(payload) >= _FVC_HEADER_LEN, "FVC: truncated header"
    assert payload[:4] == _FVC_MAGIC, "FVC: bad magic"
    n_frames, frame_size, fps = struct.unpack("<III", payload[4:_FVC_HEADER_LEN])
    assert 0 < n_frames <= 1 << 20, "FVC: implausible n_frames"
    assert 0 < frame_size <= 1 << 24, "FVC: implausible frame_size"
    assert 0 < fps <= 1000, "FVC: implausible fps"
    body = len(payload) - _FVC_HEADER_LEN
    assert body == n_frames * frame_size, "FVC: length mismatch"
    out = []
    for f in range(0, n_frames, every_n):
        start = _FVC_HEADER_LEN + f * frame_size
        frame = np.frombuffer(payload, dtype=np.uint8, count=frame_size, offset=start)
        out.append((f, n_frames, fps, int(frame.astype(np.int64).sum()), int(frame.max())))
    return out


def video_frame_features(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Arrow-batched frame-sample + feature-extract: one output row per
    SAMPLED frame (explode happens Python-side inside the batch, the
    declared schema keeps it a single mapInPandas stage — no shuffle).
    The per-batch loop is over rows; numpy does the per-byte work."""
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = [
                (int(d), *feat)
                for d, payload in zip(pdf["doc_id"], pdf["payload"])
                for feat in _decode_video_frames(payload, every_n)
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "fps", "sum_bytes", "max_byte",
                ],
            )

    return df.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


def _decode_video_descriptors(
    payload: bytes, every_n: int = 5, n_chunks: int = 8
) -> "list[tuple[int, list[float]]]":
    """Parse one FVC container and pool every ``every_n``-th frame into
    an ``n_chunks``-dim chunk-sum descriptor — ``(frame_idx,
    descriptor)`` pairs.  Same header walk and clean-error contract as
    :func:`_decode_video_frames` (corrupt payloads raise
    AssertionError/ValueError only — covered by the corruption sweep in
    tests/test_multimodal_ops.py), plus two descriptor-specific gates:
    the frame must split into equal chunks, and ``n_frames`` must stay
    below the 1024 stride that keeps ``doc_id * 1024 + frame_idx``
    collision-free."""
    import struct

    import numpy as np

    assert len(payload) >= _FVC_HEADER_LEN, "FVC: truncated header"
    assert payload[:4] == _FVC_MAGIC, "FVC: bad magic"
    n_frames, frame_size, fps = struct.unpack("<III", payload[4:_FVC_HEADER_LEN])
    assert 0 < n_frames <= 1 << 20, "FVC: implausible n_frames"
    assert 0 < frame_size <= 1 << 24, "FVC: implausible frame_size"
    assert 0 < fps <= 1000, "FVC: implausible fps"
    assert frame_size % n_chunks == 0, "FVC: frame not chunkable"
    assert n_frames < 1024, "FVC: frame_idx would collide vec_id"
    body = len(payload) - _FVC_HEADER_LEN
    assert body == n_frames * frame_size, "FVC: length mismatch"
    sub = frame_size // n_chunks
    out = []
    for f in range(0, n_frames, every_n):
        start = _FVC_HEADER_LEN + f * frame_size
        frame = np.frombuffer(
            payload, dtype=np.uint8, count=frame_size, offset=start
        ).astype(np.int64)
        desc = frame.reshape(n_chunks, sub).sum(axis=1)
        out.append((f, [float(x) for x in desc]))
    return out


def video_frame_descriptors(
    df: DataFrame, every_n: int = 5, n_chunks: int = 8
) -> DataFrame:
    """Arrow-batched keyframe DESCRIPTOR extraction: every ``every_n``-th
    frame of each FVC container reduces to an ``n_chunks``-dim embedding
    (sum of the bytes in each equal frame slice — the integer stand-in
    for the pooled CNN feature a real pipeline would emit), keyed by a
    globally unique ``vec_id = doc_id * 1024 + frame_idx`` so the frame
    corpus drops straight into the ANN operators
    (operators/similarity.ivfpq_topk and friends).

    Same single-stage mapInPandas shape as :func:`video_frame_features`
    (decode + explode happen Python-side inside the batch, no shuffle),
    same clean-error contract (corrupt containers raise
    AssertionError/ValueError from the shared header walk).  Descriptor
    values are small integers carried as float64, so every downstream
    dot product is EXACT and the whole ANN index replays in SQL."""
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            rows = [
                (int(d) * 1024 + f, int(d), f, desc)
                for d, payload in zip(pdf["doc_id"], pdf["payload"])
                for f, desc in _decode_video_descriptors(
                    bytes(payload), every_n, n_chunks
                )
            ]
            yield pd.DataFrame(
                rows, columns=["vec_id", "doc_id", "frame_idx", "descriptor"]
            )

    return df.mapInPandas(
        batches,
        schema="vec_id long, doc_id long, frame_idx int, descriptor array<double>",
    )
