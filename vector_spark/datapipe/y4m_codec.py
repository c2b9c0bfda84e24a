"""Minimal pure-stdlib Y4M (YUV4MPEG2) codec.

YUV4MPEG2 is the public uncompressed video container used by the
mjpegtools/ffmpeg toolchain: a plain-text stream header
(``YUV4MPEG2 W<w> H<h> F<n>:<d> ...``) followed by ``FRAME`` markers
and raw planar frames. Because the frames are raw bytes, the whole
format parses with `bytes.split`/slicing — the video sibling of
`datapipe.png_codec` (images) and `datapipe.wav_codec` (audio): with
it, every media kind in `datapipe.multimodal` decodes REAL payloads
with no media library. Lossy codecs (h264/vp9/av1 inside mp4/webm)
remain caller-supplied; no pure-stdlib decoder exists for them.

Scope: ``Cmono`` colourspace (luma-only plane, w*h bytes per frame) —
enough to make frame decode, frame sampling and pixel statistics
real. Encode writes the canonical header; decode accepts any
spec-valid parameter order and skips unknown header/frame parameters.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def y4m_encode(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """uint8 array (n_frames, h, w) of luma planes -> Y4M bytes
    (Cmono, progressive, square pixels)."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"unsupported frame shape {arr.shape}")
    n, h, w = arr.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    parts = [header]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(arr[f].tobytes())
    return b"".join(parts)


def y4m_decode(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M bytes -> (uint8 frames (n, h, w), (fps_num, fps_den)).
    Cmono only; FRAME lines may carry (ignored) parameters."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_MAGIC + b" ") and payload[:nl] != _MAGIC:
        raise ValueError("not a Y4M stream: bad magic")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M stream: bad magic")
    w = h = None
    fps = (25, 1)
    cspace = "C420jpeg"  # spec default when C is absent
    for tok in header[1:]:
        if not tok:
            continue
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == "C":
            cspace = tok
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cspace != "Cmono":
        raise ValueError(f"unsupported Y4M colourspace {cspace!r} (Cmono only)")
    frame_size = w * h
    frames = []
    pos = nl + 1
    n_payload = len(payload)
    while pos < n_payload:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("Y4M frame marker missing")
        start = fnl + 1
        raw = payload[start : start + frame_size]
        if len(raw) != frame_size:
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(raw, dtype=np.uint8).reshape(h, w))
        pos = start + frame_size
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps
