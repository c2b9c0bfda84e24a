"""Multimodal binary-column plumbing + REAL image codec: the Spark
machinery (schemas, Arrow batch shape, partition-parallel mapInPandas)
AND the decode are real since r5 — image payloads are true PNGs
(pure-stdlib codec, datapipe/png_codec.py) and features come from
decoded pixels. Audio/video codecs remain caller-supplied."""

from __future__ import annotations

import numpy as np
import pytest

from vector_spark.datapipe.multimodal import (
    extract_features,
    frame_sample_plan,
    png_image_decoder,
    png_image_resizer,
    resize_images,
    synth_media_df,
    synth_pixels,
)
from vector_spark.datapipe.png_codec import png_decode, png_encode


def test_png_codec_roundtrip_shapes():
    rng = np.random.RandomState(11)
    for shape in [(4, 7), (9, 5, 3), (3, 8, 4)]:
        a = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(png_decode(png_encode(a)), a)


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # valid signature, truncated body
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)


def test_decoder_reads_dims_from_ihdr_not_meta():
    """The real decoder ignores the metadata sidecar — width/height
    come from the pixels."""
    px = synth_pixels(6)  # 38x38
    w, h, feat = png_image_decoder(png_encode(px), {"w": "999", "h": "999"})
    assert (w, h) == (px.shape[1], px.shape[0])
    assert len(feat) == 8
    # features are the documented integer pixel statistics
    r = px[..., 0].astype(np.int64)
    assert feat[0] == float(int(r.sum()) // r.size)
    assert feat[4] == float(r.min()) and feat[5] == float(r.max())
    assert feat[6] == float(np.unique(r).size)
    assert feat[7] == float(int((r * r).sum()) // r.size)


def test_extract_features_shapes(spark):
    media = synth_media_df(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        if r.kind == "image":
            assert r.width == 32 + r.media_id % 64
            assert r.height == 32 + r.media_id % 48
            assert len(r.feature) == 8
            assert r.n_bytes > 64  # real PNG payload, not the 64-byte fake
        else:  # non-selected kinds: metadata-only rows, no decode
            assert r.feature is None
            assert r.n_bytes == 64


def test_frame_sample_plan(spark):
    media = synth_media_df(spark, n=30)
    frames = frame_sample_plan(media, every_n=4)
    rows = frames.collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(rows) == n_videos * 4
    assert {r.frame_idx for r in rows} == {0, 1, 2, 3}


def test_resize_composes_with_features(spark):
    media = synth_media_df(spark, n=30)
    resized = resize_images(media, target_w=16, target_h=16)
    rows = {r.media_id: r for r in resized.collect()}
    for mid, r in rows.items():
        if r.kind == "image":
            assert r.meta["w"] == "16" and r.meta["h"] == "16"
            # the payload is a REAL 16x16 PNG
            assert png_decode(bytes(r.payload)).shape == (16, 16, 3)
        else:  # pass-through
            assert r.payload is not None and len(r.payload) == 64
    # resized output keeps the MEDIA shape: feature pass composes
    feats = extract_features(resized).collect()
    for r in feats:
        if r.kind == "image":
            assert (r.width, r.height) == (16, 16)


def test_resize_is_nearest_neighbour():
    """Downsample-by-2 picks every other pixel (index resample)."""
    px = synth_pixels(0)  # 32x32
    out_png, meta = png_image_resizer(png_encode(px), {}, 16, 16)
    out = png_decode(out_png)
    assert np.array_equal(out, px[::2, ::2])
    assert meta == {"w": "16", "h": "16"}


def test_resize_deterministic(spark):
    media = synth_media_df(spark, n=10)
    a = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 8).collect()}
    b = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 8).collect()}
    assert a == b
