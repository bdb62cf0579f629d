"""Multimodal operators: FAKE-container decode, features, resize, frames.

The decode step is stubbed (no PIL/av in this container — SURVEY.md scope
directive); these tests pin the real Spark-side plumbing: binary columns
through Arrow batches, mapInPandas schemas, 1→many frame expansion.
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
