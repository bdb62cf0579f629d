"""Multimodal (image/audio/video) column operators.

The reference has no media path at all; this is part of the LLM-pipeline
extension surface (scope directive, SURVEY.md preamble).  Design for a
100 TB media lake:

- Media are **opaque ``binary`` columns with typed metadata** — a struct
  column carrying (kind, format, width, height, sample_rate, n_frames).
  Nothing ever assumes the payload fits in driver memory; all per-item work
  runs inside Arrow-batched ``mapInPandas`` so bytes move executor-side in
  columnar batches, never through the driver.
- Decode is **pluggable and import-gated**: real decoders (PIL / soundfile /
  av) are looked up at runtime; this container has none of them, so the
  shipped decoder understands only the deterministic FAKE container format
  below (used by tests) and raises ``NotImplementedError`` for real formats.
  The Spark-side plumbing — schema, batch iteration, UDF signatures, output
  chunking — is the real deliverable and is fully exercised.

FAKE container format (deterministic, test-generated):
    b"FAKM" | kind:1 byte (I/A/V) | width:u16be | height:u16be |
    n_frames:u16be | payload  (images: w*h bytes; video: n_frames frames of
    w*h bytes; audio: payload = raw u8 samples, width=sample_rate/100)

Every operator is a narrow map (no shuffle): partitioning of the input
carries through, so a media table bucketed by media_id stays bucketed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKM"
HEADER_FMT = ">4sc3H"  # magic, kind, width, height, n_frames
HEADER_SIZE = struct.calcsize(HEADER_FMT)

# Worker-side closures below reference this module's helpers.  Default
# cloudpickle serializes module functions BY REFERENCE, which requires the
# package to be importable inside every Python worker — not guaranteed (the
# driver may run from any cwd with sys.path patched).  Registering the
# module for by-value pickling ships the code with the closure instead, so
# the engine needs no worker-side install.
def _self_register_by_value() -> None:
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:  # pragma: no cover - older pickler; workers need install
        pass


_self_register_by_value()

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", MEDIA_META_TYPE),
    ]
)


def encode_fake(kind: str, width: int, height: int, payload: bytes,
                n_frames: int = 1) -> bytes:
    """Build a FAKE-container blob (test data generator)."""
    return struct.pack(HEADER_FMT, MAGIC, kind[:1].upper().encode(), width,
                       height, n_frames) + payload


def _decode_wav(data: bytes) -> tuple[str, int, int, int, bytes] | None:
    """Real audio without dependencies: RIFF/WAVE via stdlib ``wave``.

    Returns the same tuple shape as the FAKE 'A' container — payload is
    u8 samples (16-bit PCM is mapped to u8 by taking the high byte + 128
    bias, a deterministic downscale), ``width`` = sample_rate/100 (the
    FAKE convention), ``height`` = channel count, ``n_frames`` = WAV
    frame count.  None = not a WAV (caller tries the next decoder).
    """
    import io
    import wave

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data)) as wf:
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            sr = wf.getframerate()
            nf = wf.getnframes()
            frames = wf.readframes(nf)
    except wave.Error as e:
        raise NotImplementedError(f"corrupt/unsupported WAV: {e}") from e
    if sw == 1:
        samples = np.frombuffer(frames, dtype=np.uint8)
    elif sw == 2:
        samples = (
            (np.frombuffer(frames, dtype="<i2").astype(np.int32) >> 8) + 128
        ).astype(np.uint8)
    else:
        raise NotImplementedError(
            f"WAV sample width {sw} needs soundfile (not installed); "
            "8/16-bit PCM decode is built in"
        )
    return "A", sr // 100, nch, nf, samples.tobytes()


def _decode_png(data: bytes) -> tuple[str, int, int, int, bytes] | None:
    """Real images without dependencies: 8-bit non-interlaced PNG via
    stdlib ``zlib`` — chunk walk, IDAT inflate, full scanline-filter
    reconstruction (None/Sub/Up/Average/Paeth, RFC 2083 §6), then
    ITU-R 601-2 luma for color images so the payload is grayscale bytes
    exactly like the FAKE 'I' container and the PIL path.  None = not a
    PNG; unsupported PNG variants (16-bit, palette, interlaced) raise
    the capability gate.
    """
    import zlib

    import numpy as np

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    ihdr = None
    idat = bytearray()
    try:
        while pos + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            ctype = data[pos + 4 : pos + 8]
            chunk = data[pos + 8 : pos + 8 + ln]
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", chunk)
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
            pos += 12 + ln  # length + type + data + crc32
    except struct.error:
        ihdr = None  # malformed chunk stream: not decodable as PNG
    if ihdr is None:
        return None
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace} needs "
            "PIL (not installed); 8-bit gray/RGB/RGBA decode is built in"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise NotImplementedError(f"corrupt PNG pixel data: {e}") from e
    stride = w * nch
    if len(raw) < (stride + 1) * h:
        raise NotImplementedError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    off = 0
    for y in range(h):
        ftype = raw[off]
        off += 1
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off
        ).astype(np.int32)
        off += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub — per-channel prefix sum mod 256
            cur = line.copy()
            for c0 in range(nch):
                cur[c0::nch] = (
                    np.cumsum(line[c0::nch], dtype=np.int64) & 0xFF
                )
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (3, 4):  # Average / Paeth — sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - nch]) if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    )
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    if nch in (1, 2):  # gray / gray+alpha
        gray = px[:, :, 0]
    else:  # RGB / RGBA → PIL's EXACT integer ITU-R 601-2 luma
        # ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16) — bit-identical
        # to Image.convert("L"), so the stdlib and PIL decode paths can
        # never disagree on the same 8-bit image
        rgb = px[:, :, :3].astype(np.uint32)
        gray = (
            (
                rgb[:, :, 0] * 19595
                + rgb[:, :, 1] * 38470
                + rgb[:, :, 2] * 7471
                + 0x8000
            )
            >> 16
        ).astype(np.uint8)
    return "I", w, h, 1, gray.tobytes()


def _decode(data: bytes) -> tuple[str, int, int, int, bytes]:
    """Decode one blob → (kind, width, height, n_frames, payload).

    Dispatch order: FAKE container → stdlib WAV (unambiguous RIFF
    signature; PIL can't open audio) → PIL when importable (C-speed
    decode for every raster format) → stdlib PNG (zero-dependency
    fallback; the per-pixel Python filter loops for Average/Paeth rows
    make it correctness-tier, not throughput-tier — which is exactly
    right for a container without PIL).  The stdlib luma is
    bit-identical to ``Image.convert("L")``, so WHICH path decoded an
    8-bit image never changes the payload.  Formats nobody can decode
    raise ``NotImplementedError`` — an honest capability gate, not a
    stub.
    """
    if data is not None and len(data) >= HEADER_SIZE and data[:4] == MAGIC:
        _, kind, w, h, nf = struct.unpack(HEADER_FMT, data[:HEADER_SIZE])
        return kind.decode(), w, h, nf, data[HEADER_SIZE:]
    got = _decode_wav(data)
    if got is not None:
        return got
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        got = _decode_png(data)
        if got is not None:
            return got
        raise NotImplementedError(
            "real media decode beyond PNG/WAV needs PIL/soundfile/av "
            "(not installed); FAKE container, 8-bit PNG and 8/16-bit PCM "
            "WAV are supported in this build"
        ) from None
    import io  # pragma: no cover - exercised only where PIL is installed

    try:
        with PIL.Image.open(io.BytesIO(data)) as img:
            gray = img.convert("L")
            w, h = gray.size
            return "I", w, h, 1, gray.tobytes()
    except Exception as e:
        # non-image bytes (audio/video containers, truncated FAKE
        # headers): the capability gate, not a PIL internals leak
        raise NotImplementedError(
            "unsupported media format (PIL could not decode; "
            "audio/video need soundfile/av, not installed)"
        ) from e


# ---------------------------------------------------------------------------
# Feature extraction (image/audio/video → numeric features)
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("min_value", T.IntegerType()),
        T.StructField("max_value", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item decode + pixel/sample statistics via ``mapInPandas``.

    Arrow ships the binary column to Python in batches; numpy reduces each
    payload.  Narrow map — scales with executor count, no shuffle.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, nf, payload = _decode(bytes(data))
                arr = np.frombuffer(payload, dtype=np.uint8)
                out.append(
                    (
                        mid,
                        kind,
                        len(data),
                        w,
                        h,
                        nf,
                        float(arr.mean()) if arr.size else None,
                        int(arr.min()) if arr.size else None,
                        int(arr.max()) if arr.size else None,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.select("media_id", "data").mapInPandas(
        _batches, FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Image resize (payload transform, bytes in → bytes out)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of FAKE images inside ``mapInPandas``.

    Stands in for a PIL ``Image.resize`` call with identical plumbing: the
    output is a re-encoded binary column, so the result composes with every
    other media operator (a real pipeline would chain decode→resize→encode
    in ONE pass exactly like this, amortizing the Arrow transfer).
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, nf, payload = _decode(bytes(data))
                if kind != "I":
                    continue  # resize only applies to images
                img = np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                resized = img[np.ix_(ys, xs)]
                rows.append(
                    (
                        mid,
                        encode_fake("I", out_w, out_h, resized.tobytes()),
                        out_w,
                        out_h,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.select("media_id", "data").mapInPandas(
        _batches, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video frame sampling (1 row in → k rows out)
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Every ``every_n``-th frame of FAKE videos as its own row.

    ``mapInPandas`` is the right tool for 1→many binary expansion: the
    output batch size is decoupled from the input batch, so a 10 GB video
    row never forces a 10 GB task output buffer (frames stream out in
    Arrow-sized chunks).
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                kind, w, h, nf, payload = _decode(bytes(data))
                if kind != "V":
                    continue
                frame_sz = w * h
                arr = np.frombuffer(payload, dtype=np.uint8)
                for i in range(0, nf, every_n):
                    rows.append(
                        (mid, i, arr[i * frame_sz:(i + 1) * frame_sz].tobytes())
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return media.select("media_id", "data").mapInPandas(
        _batches, FRAMES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Fingerprint (oracle-verifiable: byte length + md5 of payload)
# ---------------------------------------------------------------------------

def media_fingerprint(media: DataFrame) -> DataFrame:
    """``[media_id, n_bytes, content_md5]`` — pure built-in expressions
    (``length``/``md5`` work on binary JVM-side), zero Python.  The exact
    dedup path for media: group on content_md5 exactly like
    :func:`~..operators.dedup.exact_dedup_groups` on text."""
    return media.select(
        "media_id",
        F.length("data").cast("long").alias("n_bytes"),
        F.md5("data").alias("content_md5"),
    )
