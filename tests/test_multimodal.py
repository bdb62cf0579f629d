"""Multimodal operators: FAKE-container decode, features, resize, frames,
plus REAL media decode with zero dependencies — 8-bit PNG (stdlib zlib,
full scanline-filter reconstruction) and 8/16-bit PCM WAV (stdlib wave).
Formats beyond that stay import-gated on PIL/soundfile/av (absent in this
container).  The Spark-side plumbing — binary columns through Arrow
batches, mapInPandas schemas, 1→many frame expansion — is exercised over
both FAKE and real bytes.
"""

from __future__ import annotations

import numpy as np
import pytest

from polars_w_inverted_index_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    # two 4x4 images with known pixels
    img0 = bytes(range(16))
    img1 = bytes([255 - i for i in range(16)])
    rows.append((0, MM.encode_fake("I", 4, 4, img0)))
    rows.append((1, MM.encode_fake("I", 4, 4, img1)))
    # a 3-frame 2x2 video
    vid = bytes([10] * 4 + [20] * 4 + [30] * 4)
    rows.append((2, MM.encode_fake("V", 2, 2, vid, n_frames=3)))
    # an audio clip: 8 samples at 800 Hz (width=sample_rate/100)
    rows.append((3, MM.encode_fake("A", 8, 1, bytes([1, 2, 3, 4, 5, 6, 7, 8]))))
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_extract_features(media):
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert out[0]["kind"] == "I"
    assert out[0]["width"] == 4 and out[0]["height"] == 4
    assert out[0]["mean_value"] == pytest.approx(sum(range(16)) / 16)
    assert (out[0]["min_value"], out[0]["max_value"]) == (0, 15)
    assert out[1]["mean_value"] == pytest.approx(sum(255 - i for i in range(16)) / 16)
    assert out[2]["kind"] == "V" and out[2]["n_frames"] == 3
    assert out[3]["kind"] == "A" and out[3]["n_bytes"] == MM.HEADER_SIZE + 8


def test_resize_nearest_neighbor(spark, media):
    out = {r["media_id"]: r for r in MM.resize_images(media, 2, 2).collect()}
    # only images survive a resize
    assert set(out) == {0, 1}
    kind, w, h, nf, payload = MM._decode(bytes(out[0]["data"]))
    assert (kind, w, h) == ("I", 2, 2)
    img = np.frombuffer(bytes(range(16)), dtype=np.uint8).reshape(4, 4)
    expect = img[np.ix_([0, 2], [0, 2])]
    assert np.frombuffer(payload, dtype=np.uint8).reshape(2, 2).tolist() == \
        expect.tolist()


def test_sample_frames(media):
    rows = MM.sample_frames(media, every_n=2).collect()
    # video 2 has frames 0,1,2 → sampled 0 and 2
    assert [(r["media_id"], r["frame_idx"]) for r in rows] == [(2, 0), (2, 2)]
    assert bytes(rows[0]["frame"]) == bytes([10] * 4)
    assert bytes(rows[1]["frame"]) == bytes([30] * 4)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _make_png(arr, color_type=0, filters=None) -> bytes:
    """Independent PNG writer (RFC 2083): per-row filter ENCODING here must
    be inverted exactly by the engine's decoder — covering all 5 filter
    types is the point."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    nch = 1 if arr.ndim == 2 else arr.shape[2]
    px = arr.reshape(h, w * nch).astype(np.int32)
    stride = w * nch
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = px[y]
        f = filters[y]
        raw.append(f)
        left = np.concatenate([np.zeros(nch, dtype=np.int32), cur[:-nch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            enc = np.zeros_like(cur)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
                enc[x] = (int(cur[x]) - pred) & 0xFF
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _make_wav(samples16, sample_rate=8000, nch=1) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples16, dtype="<i2").tobytes())
    return buf.getvalue()


def test_png_gray_all_filter_types():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    blob = _make_png(arr, color_type=0, filters=[0, 1, 2, 3, 4, 2])
    kind, w, h, nf, payload = MM._decode(blob)
    assert (kind, w, h, nf) == ("I", 5, 6, 1)
    assert payload == arr.tobytes()


def test_png_rgb_and_rgba_luma():
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
        dtype=np.uint8,
    )
    kind, w, h, nf, payload = MM._decode(
        _make_png(rgb, color_type=2, filters=[1, 4])
    )
    # PIL's exact integer ITU-R 601-2 form — the stdlib path must be
    # bit-identical to Image.convert("L") so the two decoders agree
    lum = (
        rgb[:, :, 0].astype(int) * 19595
        + rgb[:, :, 1].astype(int) * 38470
        + rgb[:, :, 2].astype(int) * 7471
        + 0x8000
    ) >> 16
    assert (kind, w, h) == ("I", 2, 2)
    assert list(payload) == lum.flatten().tolist()
    rgba = np.dstack([rgb, np.full((2, 2), 128, dtype=np.uint8)])
    _, _, _, _, payload_a = MM._decode(
        _make_png(rgba, color_type=6, filters=[3, 2])
    )
    assert payload_a == payload  # alpha ignored, same luma


def test_wav_decode_16bit_pcm():
    samples = [0, 256, -256, 32512, -32768, 512]
    blob = _make_wav(samples, sample_rate=8000)
    kind, w, h, nf, payload = MM._decode(blob)
    assert (kind, w, h, nf) == ("A", 80, 1, len(samples))
    # high byte + 128 bias
    assert list(payload) == [(s >> 8) + 128 for s in samples]


def test_real_media_through_spark_operators(spark):
    """PNG and WAV bytes ride the SAME mapInPandas operators as FAKE
    media: features and resize end-to-end over a mixed table."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 6), dtype=np.uint8)
    wav = [1000 * i for i in range(-5, 6)]
    rows = [
        (0, _make_png(img, filters=[0, 1, 2, 3, 4, 1, 2, 3])),
        (1, _make_wav(wav, sample_rate=4400)),
        (2, MM.encode_fake("I", 4, 4, bytes(range(16)))),
    ]
    media = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert out[0]["kind"] == "I" and (out[0]["width"], out[0]["height"]) == (6, 8)
    assert out[0]["mean_value"] == pytest.approx(float(img.mean()))
    assert out[1]["kind"] == "A" and out[1]["n_frames"] == len(wav)
    assert out[1]["mean_value"] == pytest.approx(
        float(np.mean([(s >> 8) + 128 for s in wav]))
    )
    assert out[2]["kind"] == "I"

    resized = {
        r["media_id"]: r for r in MM.resize_images(media, 3, 4).collect()
    }
    assert set(resized) == {0, 2}  # images only — real PNG included
    _, w, h, _, payload = MM._decode(bytes(resized[0]["data"]))
    ys = np.arange(4) * 8 // 4
    xs = np.arange(3) * 6 // 3
    assert np.frombuffer(payload, dtype=np.uint8).reshape(4, 3).tolist() == \
        img[np.ix_(ys, xs)].tolist()


def test_unsupported_png_variant_gated():
    # 16-bit depth PNG: an honest capability gate, not silent garbage
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="PNG depth=16"):
        MM._decode(blob)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil_available(), reason="PIL installed: real decode path active"
)
def test_real_decode_gated_without_pil(media):
    with pytest.raises(NotImplementedError, match="FAKE container"):
        MM._decode(b"\x89PNG\r\n\x1a\n not a fake container")


@pytest.mark.skipif(
    not _pil_available(), reason="PIL not installed in this container"
)
def test_real_decode_with_pil(media):
    import io

    import PIL.Image

    img = PIL.Image.new("L", (4, 3), color=7)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    kind, w, h, nf, payload = MM._decode(buf.getvalue())
    assert (kind, w, h, nf) == ("I", 4, 3, 1)
    assert payload == bytes([7] * 12)


def test_fingerprint_jvm_side(spark, media):
    out = MM.media_fingerprint(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[0]["n_bytes"] == MM.HEADER_SIZE + 16
    import hashlib

    blob = MM.encode_fake("I", 4, 4, bytes(range(16)))
    assert rows[0]["content_md5"] == hashlib.md5(blob).hexdigest()
    # the plan stays JVM-side: no Python eval nodes
    assert "Python" not in out._jdf.queryExecution().executedPlan().toString()
