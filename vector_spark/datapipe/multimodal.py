"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schema, Arrow batch shape, partition-aware
mapInPandas decode, metadata propagation) is real and tested, and —
since r5 — so are the lossless codecs: `datapipe.png_codec` is a
pure-stdlib PNG encoder/decoder (public W3C spec, zlib + struct), so
`extract_features` computes features from REAL decoded pixels and
`resize_images` does a REAL nearest-neighbour resample + re-encode;
`datapipe.wav_codec` is a pure-stdlib RIFF/PCM WAV codec, so audio
rows decode to REAL int16 samples (`wav_audio_decoder`); and
`datapipe.y4m_codec` is a pure-stdlib Y4M (YUV4MPEG2) codec, so video
rows decode to REAL luma frames (`y4m_video_decoder`). Every kind now
decodes a real public format with no media library; only LOSSY codecs
(jpeg/mp3/h264...) remain caller-supplied in production — no
pure-stdlib decoder exists for those.

Feature vectors (8 dims, all integer-valued by construction so the
float32 array round-trips exactly and a SQL oracle can re-derive them
from the synth formulas). Image: floor-mean of R/G/B, floor-mean
brightness, min/max of R, distinct R values, floor-mean of R².
Audio: n_samples, sample_rate, channels, min, max, floor-mean,
floor-mean of s² (energy), count of samples >= 2048. Video: n_frames,
w, h, min, max, floor-mean, floor-mean of Y², count of Y >= 128.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.datapipe.png_codec import png_decode, png_encode
from vector_spark.datapipe.wav_codec import wav_decode, wav_encode
from vector_spark.datapipe.y4m_codec import y4m_decode, y4m_encode

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


def synth_pixels(i: int) -> np.ndarray:
    """Deterministic RGB pixel field for image media_id=i — pure
    integer formulas over the (x, y) grid, so a SQL oracle can
    re-derive every pixel without parsing PNG:

      w = 32 + i%64, h = 32 + i%48
      R = (x + 3y + i) % 256
      G = (2x + y + 7i) % 256
      B = (x*y + i*i) % 256
    """
    w, h = 32 + i % 64, 32 + i % 48
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (x + 3 * y + i) % 256
    g = (2 * x + y + 7 * i) % 256
    b = (x * y + i * i) % 256
    return np.stack(
        [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def synth_samples(i: int) -> tuple[np.ndarray, int]:
    """Deterministic mono int16 waveform for audio media_id=i — pure
    integer formulas so a SQL oracle re-derives every sample without
    parsing RIFF:

      n = 256 + i%128, rate = 8000 + (i%5)*2000
      s[t] = (t*t + 5*i*t + i) % 4096     (non-negative by design, so
                                           floor-division stats are
                                           engine-unambiguous)
    """
    n = 256 + i % 128
    t = np.arange(n, dtype=np.int64)
    s = (t * t + 5 * i * t + i) % 4096
    return s.astype(np.int16), 8000 + (i % 5) * 2000


def synth_frames(i: int) -> np.ndarray:
    """Deterministic luma frame stack for video media_id=i — pure
    integer formulas so a SQL oracle re-derives every sample without
    parsing Y4M:

      nf = 4 + i%4, w = 16 + i%16, h = 8 + i%8
      Y[f, y, x] = (x + 2y + 3f + i) % 256
    """
    nf, w, h = 4 + i % 4, 16 + i % 16, 8 + i % 8
    f = np.arange(nf, dtype=np.int64)[:, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None]
    x = np.arange(w, dtype=np.int64)[None, None, :]
    return ((x + 2 * y + 3 * f + i) % 256).astype(np.uint8)


def synth_media_df(spark, n: int = 100) -> DataFrame:
    """Deterministic media table — every kind carries a REAL payload
    in a public format: image rows (media_id % 3 == 0) are PNGs of
    :func:`synth_pixels`, audio rows (% 3 == 1) are RIFF/PCM WAVs of
    :func:`synth_samples`, video rows (% 3 == 2) are Y4M Cmono
    streams of :func:`synth_frames`."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.array(["image", "audio", "video"])[ids % 3]
            payloads = [
                png_encode(synth_pixels(int(i)))
                if i % 3 == 0
                else wav_encode(*synth_samples(int(i)))
                if i % 3 == 1
                else y4m_encode(synth_frames(int(i)))
                for i in ids
            ]
            mimes = np.select(
                [kinds == "image", kinds == "audio"],
                ["image/png", "audio/wav"],
                "video/x-yuv4mpeg",
            )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "mime": mimes,
                    "payload": payloads,
                    # kind-accurate metadata sidecar (image: pixel dims;
                    # audio: frame count + rate; video: frame geometry) —
                    # zero-decode planners (frame_sample_plan) rely on it
                    "meta": [
                        {"w": str(32 + int(i) % 64), "h": str(32 + int(i) % 48)}
                        if i % 3 == 0
                        else {
                            "n": str(256 + int(i) % 128),
                            "rate": str(8000 + (int(i) % 5) * 2000),
                        }
                        if i % 3 == 1
                        else {
                            "nf": str(4 + int(i) % 4),
                            "w": str(16 + int(i) % 16),
                            "h": str(8 + int(i) % 8),
                        }
                        for i in ids
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def png_image_decoder(payload: bytes, meta: dict) -> tuple[int, int, list[float]]:
    """REAL decode + feature step: parses the PNG (datapipe.png_codec),
    reads width/height from IHDR (meta is ignored — dims come from the
    pixels, not the sidecar), and computes 8 integer-valued pixel
    statistics: floor-mean R/G/B, floor-mean brightness, min/max R,
    distinct R values, floor-mean R². Integer arithmetic end-to-end
    (floor-division, no float rounding), every value < 2^24 so the
    float32 feature column is exact."""
    px = png_decode(payload)
    if px.ndim == 2:
        r = g = b = px.astype(np.int64)
    else:
        r = px[..., 0].astype(np.int64)
        g = px[..., 1].astype(np.int64)
        b = px[..., 2].astype(np.int64)
    h, w = px.shape[0], px.shape[1]
    npix = h * w
    sr, sg, sb = int(r.sum()), int(g.sum()), int(b.sum())
    feat = [
        sr // npix,
        sg // npix,
        sb // npix,
        (sr + sg + sb) // (3 * npix),
        int(r.min()),
        int(r.max()),
        int(np.unique(r).size),
        int((r * r).sum()) // npix,
    ]
    return w, h, [float(v) for v in feat]


def wav_audio_decoder(payload: bytes, meta: dict) -> tuple[None, None, list[float]]:
    """REAL audio decode + feature step: parses the RIFF/PCM WAV
    (datapipe.wav_codec) and computes 8 integer-valued sample
    statistics — n_samples, sample_rate, channels, min, max,
    floor-mean, floor-mean of s² (energy), count of samples >= 2048.
    All values < 2^24 for 12-bit-range synth signals, so the float32
    feature column is exact; width/height stay NULL (image-only)."""
    samples, rate = wav_decode(payload)
    s = samples.astype(np.int64)
    n, ch = s.shape
    flat = s.reshape(-1)
    feat = [
        n,
        rate,
        ch,
        int(flat.min()),
        int(flat.max()),
        int(flat.sum()) // flat.size,
        int((flat * flat).sum()) // flat.size,
        int((flat >= 2048).sum()),
    ]
    return None, None, [float(v) for v in feat]


def y4m_video_decoder(payload: bytes, meta: dict) -> tuple[int, int, list[float]]:
    """REAL video decode + feature step: parses the Y4M stream
    (datapipe.y4m_codec) and computes 8 integer-valued luma
    statistics — n_frames, w, h, min, max, floor-mean, floor-mean of
    Y² , count of Y >= 128. width/height are reported from the stream
    header (image-decoder contract)."""
    frames, _fps = y4m_decode(payload)
    nf, h, w = frames.shape
    flat = frames.astype(np.int64).reshape(-1)
    feat = [
        nf,
        w,
        h,
        int(flat.min()),
        int(flat.max()),
        int(flat.sum()) // flat.size,
        int((flat * flat).sum()) // flat.size,
        int((flat >= 128).sum()),
    ]
    return w, h, [float(v) for v in feat]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], tuple[int, int, list[float]]] = png_image_decoder,
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
    """Video frame sampling with ZERO decode: every n-th frame of each
    video expands to a (frame_idx, byte_offset, frame_bytes)
    descriptor computed purely from the metadata sidecar — for a
    canonical Cmono Y4M stream (y4m_codec.y4m_encode's layout) frame
    f's pixel data starts at

        header_len + f*(6 + w*h) + 6,   header_len = 34 + digits(w)
                                                        + digits(h)

    (6 = the ``FRAME\\n`` marker). At 100 TB this is the pushdown that
    matters: schedulers pick frames and issue ranged reads without
    ever shipping or decoding the payload column; the downstream
    decode of SELECTED frames is an extract_features pass. All JVM
    expressions, zero Python, zero shuffle."""
    nf = F.col("meta")["nf"].cast("long")
    w = F.col("meta")["w"].cast("long")
    h = F.col("meta")["h"].cast("long")
    header_len = (
        F.lit(34)
        + F.length(w.cast("string"))
        + F.length(h.cast("string"))
    )
    frame_bytes = w * h
    idxs = F.sequence(F.lit(0), nf - 1, F.lit(every_n))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(idxs))
        .select(
            "media_id",
            "frame_idx",
            (header_len + F.col("frame_idx") * (frame_bytes + 6) + 6).alias(
                "byte_offset"
            ),
            frame_bytes.alias("frame_bytes"),
        )
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


def png_image_resizer(
    payload: bytes, meta: dict, target_w: int, target_h: int
) -> tuple[bytes, dict]:
    """REAL nearest-neighbour resize: decode the PNG, index-resample
    the pixel grid to (target_h, target_w), re-encode, and rewrite the
    w/h metadata."""
    px = png_decode(payload)
    src_h, src_w = px.shape[0], px.shape[1]
    ys = (np.arange(target_h, dtype=np.int64) * src_h) // target_h
    xs = (np.arange(target_w, dtype=np.int64) * src_w) // target_w
    out = px[ys][:, xs]
    new_meta = dict(meta) if meta else {}
    new_meta["w"], new_meta["h"] = str(target_w), str(target_h)
    return png_encode(out), new_meta


def wav_audio_resampler(
    payload: bytes, meta: dict, target_rate: int
) -> tuple[bytes, dict]:
    """REAL nearest-neighbour (zero-order-hold) resample: decode the
    WAV, index-resample the frame grid to
    `n' = floor(n * target_rate / rate)` frames, re-encode at the
    target rate. Integer index arithmetic end-to-end
    (`t = (u * n) // n'`), so an oracle can re-derive every output
    sample — the audio twin of :func:`png_image_resizer`."""
    samples, rate = wav_decode(payload)
    n = samples.shape[0]
    dst_n = (n * target_rate) // rate
    idx = (np.arange(dst_n, dtype=np.int64) * n) // dst_n
    return wav_encode(samples[idx], target_rate), meta


def resample_audio(
    media: DataFrame,
    target_rate: int,
    resampler: Callable[[bytes, dict, int], tuple[bytes, dict]] = wav_audio_resampler,
) -> DataFrame:
    """mapInPandas resample pass over audio rows (MEDIA-shaped output,
    so it composes with extract_features / sinks the way resize_images
    does for images). Non-audio rows pass through untouched.
    Partition-parallel, Arrow batched, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind == "audio" and r.payload is not None:
                    payload, meta = resampler(r.payload, r.meta, target_rate)
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


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, dict, int, int], tuple[bytes, dict]] = png_image_resizer,
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
