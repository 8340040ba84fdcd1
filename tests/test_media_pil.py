"""Real-codec (Pillow) image path — the install-if-available twin of the
fake-codec tests in test_multimodal.py, mirroring the live-endpoint
pattern of test_storage_contract.py: this container has no Pillow, so
these skip here; anywhere Pillow exists they close the codec='pil' seam
(multimodal/media.py::_require_pil / _image_decoder) with real PNG bytes.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL.Image", reason="Pillow not installed (codec plug point)")


def _png_bytes(width: int, height: int, pixels: bytes) -> bytes:
    img = PIL.frombytes("L", (width, height), pixels)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_pil_decode_image_features_matches_pixels(spark):
    from g_data_pipeline_spark.multimodal.media import decode_image_features

    px_a = bytes(range(16))             # 4x4 ramp: mean 7.5, max 15
    px_b = bytes([200] * 6)             # 3x2 constant: mean 200, max 200
    df = spark.createDataFrame(
        [
            (1, "image", _png_bytes(4, 4, px_a)),
            (2, "image", _png_bytes(3, 2, px_b)),
        ],
        ["media_id", "media_type", "content"],
    )
    out = {r.media_id: r for r in decode_image_features(df, codec="pil").collect()}
    assert (out[1].width, out[1].height) == (4, 4)
    assert out[1].mean_luma == pytest.approx(7.5)
    assert out[1].max_luma == 15
    assert (out[2].width, out[2].height) == (3, 2)
    assert out[2].mean_luma == pytest.approx(200.0)
    assert out[2].max_luma == 200


def test_pil_and_fake_codec_agree_on_same_pixels(spark):
    """The luma-stat contract is codec-independent: identical pixel
    content through PNG/Pillow and through the FIMG fake container must
    produce identical features."""
    from g_data_pipeline_spark.multimodal.media import (
        decode_image_features,
        encode_fake_image,
    )

    pixels = bytes((i * 37) % 251 for i in range(64))
    real = spark.createDataFrame(
        [(1, "image", _png_bytes(8, 8, pixels))],
        ["media_id", "media_type", "content"],
    )
    fake = spark.createDataFrame(
        [(1, "image", encode_fake_image(8, 8, pixels))],
        ["media_id", "media_type", "content"],
    )
    r = decode_image_features(real, codec="pil").collect()[0]
    f = decode_image_features(fake, codec="fake").collect()[0]
    assert (r.width, r.height, r.mean_luma, r.max_luma) == (
        f.width,
        f.height,
        f.mean_luma,
        f.max_luma,
    )


def test_pil_resize_reencodes_to_fimg(spark):
    """decode(PNG via Pillow) -> nearest-neighbor resize -> FIMG container:
    the cross-codec re-encode pipeline shape."""
    from g_data_pipeline_spark.multimodal.media import (
        decode_image_features,
        resize_images,
    )

    pixels = bytes(range(16))
    df = spark.createDataFrame(
        [(1, "image", _png_bytes(4, 4, pixels))],
        ["media_id", "media_type", "content"],
    )
    small = resize_images(df, 2, 2, codec="pil")
    feats = decode_image_features(small, codec="fake").collect()[0]
    assert (feats.width, feats.height) == (2, 2)
