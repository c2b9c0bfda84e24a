"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schema, Arrow batch shape, partition-aware
mapInPandas decode, metadata propagation) is real and tested; the
codec step itself is STUBBED (image/audio libraries are not in this
environment) behind `decoder=` — pass a real decode function in
production, or use `fake_image_decoder` (deterministic, dependency-
free) to exercise the plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media_df(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure
    function of media_id (no real codecs involved)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.array(["image", "audio", "video"])[ids % 3]
            payloads = [bytes((np.arange(64) * (i + 1) % 256).astype(np.uint8)) for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "mime": np.where(kinds == "image", "image/png", "application/octet-stream"),
                    "payload": payloads,
                    "meta": [{"w": str(32 + int(i) % 64), "h": str(32 + int(i) % 48)} for i in ids],
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def fake_image_decoder(payload: bytes, meta: dict) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decode+feature step: 'decodes'
    dimensions from metadata and derives an 8-dim feature from payload
    byte stats. Replace with PIL/torchvision in production."""
    if payload is None:
        raise NotImplementedError("real decode requires an image library")
    w = int(meta.get("w", 0)) if meta else 0
    h = int(meta.get("h", 0)) if meta else 0
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    chunks = np.array_split(arr, 8)
    feat = [float(round(c.mean(), 3)) for c in chunks]
    return w, h, feat


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], tuple[int, int, list[float]]] = fake_image_decoder,
    batch_kinds: tuple[str, ...] = ("image",),
) -> DataFrame:
    """mapInPandas decode/feature pass. Partition-parallel, Arrow
    batched; payloads never pass through the driver. Non-selected
    kinds produce metadata-only rows (no decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind in batch_kinds:
                    w, h, feat = decoder(r.payload, r.meta)
                else:
                    w = h = None
                    feat = None
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "width": w,
                        "height": h,
                        "n_bytes": len(r.payload) if r.payload is not None else 0,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    descriptors (frame_idx, byte_offset) WITHOUT decoding — the
    downstream decode is another extract_features pass. Demonstrates
    the explode-then-decode partition shape."""
    frames = F.sequence(F.lit(0), F.lit(every_n - 1))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(frames))
        .withColumn("byte_offset", F.col("frame_idx") * F.length("payload"))
        .select("media_id", "frame_idx", "byte_offset")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def fake_image_resizer(
    payload: bytes, meta: dict, target_w: int, target_h: int
) -> tuple[bytes, dict]:
    """Deterministic stand-in for a real resize: scales the payload
    byte length by the pixel-count ratio (nearest-neighbor byte
    subsample/repeat) and rewrites w/h metadata. Replace with
    PIL.Image.resize in production."""
    if payload is None:
        raise NotImplementedError("real resize requires an image library")
    meta = dict(meta) if meta else {}
    w = int(meta.get("w", 1)) or 1
    h = int(meta.get("h", 1)) or 1
    src = np.frombuffer(payload, dtype=np.uint8)
    new_meta = dict(meta)
    if len(src) == 0:  # zero-byte payload: nothing to sample from
        new_meta["w"], new_meta["h"] = str(target_w), str(target_h)
        return b"", new_meta
    ratio = (target_w * target_h) / float(w * h)
    n_out = max(1, int(round(len(src) * ratio)))
    idx = (np.arange(n_out) * len(src) // n_out).clip(0, len(src) - 1)
    out = src[idx].tobytes()
    new_meta["w"], new_meta["h"] = str(target_w), str(target_h)
    return out, new_meta


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, dict, int, int], tuple[bytes, dict]] = fake_image_resizer,
) -> DataFrame:
    """mapInPandas resize pass over image rows (same MEDIA-shaped
    output, so resize composes with extract_features / sinks).
    Non-image rows pass through untouched. Partition-parallel, Arrow
    batched — payloads never visit the driver; at 100 TB this is one
    scan-parallel pass with no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind == "image" and r.payload is not None:
                    payload, meta = resizer(r.payload, r.meta, target_w, target_h)
                else:
                    payload, meta = r.payload, r.meta
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "mime": r.mime,
                        "payload": payload,
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, RESIZED_SCHEMA)
