"""Multimodal binary-column plumbing: decode/feature, resize,
frame-sample — the Spark-side machinery is real (schemas, Arrow
batch shape, partition-parallel mapInPandas); codecs are
deterministic stubs by documented design (no image/audio libs in
this environment)."""

from __future__ import annotations

import pytest

from vector_spark.datapipe.multimodal import (
    extract_features,
    fake_image_decoder,
    frame_sample_plan,
    resize_images,
    synth_media_df,
)


def test_extract_features_shapes(spark):
    media = synth_media_df(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        if r.kind == "image":
            assert r.width is not None and len(r.feature) == 8
        else:  # non-selected kinds: metadata-only rows, no decode
            assert r.feature is None
        assert r.n_bytes == 64


def test_decoder_stub_guard():
    with pytest.raises(NotImplementedError):
        fake_image_decoder(None, {})


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
        else:  # pass-through
            assert r.payload is not None and len(r.payload) == 64
    # resized output keeps the MEDIA shape: feature pass composes
    feats = extract_features(resized).collect()
    for r in feats:
        if r.kind == "image":
            assert (r.width, r.height) == (16, 16)
            # byte length scaled by pixel ratio => n_bytes changed
            assert r.n_bytes != 64


def test_resize_deterministic(spark):
    media = synth_media_df(spark, n=10)
    a = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 8).collect()}
    b = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 8).collect()}
    assert a == b


def test_resizer_edge_inputs():
    from vector_spark.datapipe.multimodal import fake_image_resizer

    out, meta = fake_image_resizer(b"", None, 8, 8)
    assert out == b"" and meta == {"w": "8", "h": "8"}
    out2, meta2 = fake_image_resizer(bytes(range(10)), {"w": "2", "h": "2"}, 4, 4)
    assert len(out2) > 0 and meta2["w"] == "4"
