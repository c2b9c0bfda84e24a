"""File-tail source shape: incremental directory ingestion.

Parity: the reference's file source checkpoints by content
fingerprint + offset (lib/file-source/src/checkpointer.rs:33-43,122;
src/sources/file.rs:109-119 `read_from` / `ignore_older_secs`). The
batch Spark analogue discovers files, skips ones whose fingerprint is
already committed in the manifest, and reads ONLY the new set — the
Auto-Loader-style incremental listing SURVEY.md maps the file source
to. Commit is ack-then-checkpoint: the caller commits a file's key
AFTER its sink write succeeds (same contract as
plans.checkpoint.run_resumable), so a crash between read and sink
re-reads the file and the sink write must be idempotent.

A file is keyed by (basename, size, fingerprint-of-first-N-bytes):
an appended file changes size and a rewritten file changes
fingerprint, so either way it gets a NEW key and is re-read in
full — whole-file granularity rather than the reference's byte
offsets (offset resume inside one file has no batch-Spark analogue;
the streaming path gets it from Structured Streaming's file source
log for free).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession

from vector_spark.plans.checkpoint import CheckpointManager


def file_fingerprint(path: str, n_bytes: int = 256) -> str:
    """Fingerprint = sha256 of the first n bytes (the reference
    fingerprints the first line / first N bytes, checkpointer.rs)."""
    with open(path, "rb") as fh:
        head = fh.read(n_bytes)
    return hashlib.sha256(head).hexdigest()[:16]


def discover_new_files(
    path: str,
    ckpt: CheckpointManager,
    glob: str = "*",
    ignore_older_secs: float | None = None,
) -> list[tuple[str, str]]:
    """[(path, manifest_key)] for files not yet committed. Hidden
    files (leading . or _) are skipped — Spark's scanner would drop
    them silently anyway."""
    now = time.time()
    out = []
    for f in sorted(_glob.glob(os.path.join(path, glob))):
        base = os.path.basename(f)
        if base.startswith((".", "_")) or not os.path.isfile(f):
            continue
        if ignore_older_secs is not None and now - os.path.getmtime(f) > ignore_older_secs:
            continue
        # size in the key: an append past the fingerprinted prefix
        # still produces a new key (the prefix hash alone would not)
        key = f"{base}:{os.path.getsize(f)}:{file_fingerprint(f)}"
        if not ckpt.is_done(key):
            out.append((f, key))
    return out


def incremental_files(
    spark: SparkSession,
    path: str,
    ckpt: CheckpointManager,
    fmt: str = "text",
    glob: str = "*",
    ignore_older_secs: float | None = None,
) -> tuple[DataFrame | None, list[tuple[str, str]]]:
    """(DataFrame over ONLY the new files, [(path, key)] to commit
    after the sink write) — None frame when nothing is new. The
    listing is driver-side (same as Spark's own file index); the read
    is scan-parallel over the file list."""
    new = discover_new_files(path, ckpt, glob, ignore_older_secs)
    if not new:
        return None, []
    df = spark.read.format(fmt).load([f for f, _ in new])
    return df, new
