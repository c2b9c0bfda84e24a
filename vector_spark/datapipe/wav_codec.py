"""Minimal pure-stdlib WAV (RIFF/PCM) codec (struct + numpy).

Implements the public RIFF WAVE container with 16-bit integer PCM —
the lossless audio sibling of `datapipe.png_codec`: no audio library
required, so `datapipe.multimodal` decodes REAL samples for audio
rows the same way it decodes real pixels for image rows. Lossy
formats (mp3/aac/opus) remain caller-supplied — there is no
pure-stdlib decoder for them.

Encode writes the canonical 44-byte header (RIFF 12 + fmt 24 +
data 8), so payload length is exactly `44 + 2 * n_samples * channels`
— a property the SQL oracles exploit. Decode walks chunks by
declared size (fmt/data may appear in any order, unknown chunks are
skipped), accepting any spec-valid PCM file, not just our own.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) mono / (n, ch) multichannel -> WAV bytes
    (PCM, 16-bit, little-endian, canonical 44-byte header)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"unsupported sample shape {arr.shape}")
    n, ch = arr.shape
    data = arr.tobytes()  # C order: frames interleaved, per the spec
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n, ch), sample_rate). PCM 16-bit
    only; fmt/data chunks located by walking the chunk list."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    n_payload = len(payload)
    fmt = None
    data = None
    while pos + 8 <= n_payload:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif tag == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    if samples.size % ch:
        raise ValueError("WAV data size not a whole number of frames")
    return samples.reshape(-1, ch), rate
