"""File-tail source shape: incremental directory ingestion.

Parity: the reference's file source checkpoints by content
fingerprint + byte offset (lib/file-source/src/checkpointer.rs:33-43,122;
src/sources/file.rs:109-119 `read_from` / `ignore_older_secs`). The
batch Spark analogue discovers files, compares each against the
manifest, and reads ONLY what is new:

  * unknown basename            -> full read
  * same fingerprint, same size -> skip (already ingested)
  * same fingerprint, LARGER    -> append: resume at the committed
    byte offset (text format; one task per appended file seeks to the
    offset and emits only the tail — no duplicate re-emission of the
    already-ingested prefix)
  * different fingerprint       -> rewritten: full re-read

The manifest is keyed by BASENAME with {size, fingerprint} stored as
values, so a changed file SUPERSEDES its old entry instead of leaving
stale keys committed forever. Commit is ack-then-checkpoint: the
caller commits AFTER its sink write succeeds (same contract as
plans.checkpoint.run_resumable), so a crash between read and sink
re-reads the delta and the sink write must be idempotent.

Offset resume assumes appends are line-aligned (the committed size
falls on a line boundary) — true for log appenders that write whole
lines; a partial trailing line at commit time would re-emit its
remainder fused to the next write. Non-text formats cannot seek, so
their appends fall back to a FULL re-read: callers ingesting
appendable non-text files get duplicate prior rows and should dedupe
downstream (or use the streaming file source).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import time
from typing import Iterator, NamedTuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from vector_spark.plans.checkpoint import CheckpointManager


class FileEntry(NamedTuple):
    path: str
    key: str  # manifest key = basename; superseded on re-commit
    size: int
    fingerprint: str
    offset: int  # bytes already ingested; 0 = read in full

    def lineage(self) -> dict:
        """Manifest value recording where ingestion got to — merge
        into the commit payload (commit_entries does this)."""
        return {"size": self.size, "fingerprint": self.fingerprint}


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
    allow_tail: bool = True,
) -> list[FileEntry]:
    """FileEntry per file with NEW content. Hidden files (leading . or
    _) are skipped — Spark's scanner would drop them silently anyway."""
    now = time.time()
    committed = ckpt.completed()
    out = []
    for f in sorted(_glob.glob(os.path.join(path, glob))):
        base = os.path.basename(f)
        if base.startswith((".", "_")) or not os.path.isfile(f):
            continue
        if ignore_older_secs is not None and now - os.path.getmtime(f) > ignore_older_secs:
            continue
        size = os.path.getsize(f)
        fp = file_fingerprint(f)
        prev = committed.get(base)
        if prev is None:
            out.append(FileEntry(f, base, size, fp, 0))
            continue
        same_fp = prev.get("fingerprint") == fp
        prev_size = prev.get("size")
        if same_fp and prev_size == size:
            continue  # unchanged
        if same_fp and isinstance(prev_size, int) and 0 < prev_size < size and allow_tail:
            # append: resume at the committed byte offset
            out.append(FileEntry(f, base, size, fp, prev_size))
        else:
            # rewritten (or tail resume disabled): full re-read
            out.append(FileEntry(f, base, size, fp, 0))
    return out


def _read_tails(spark: SparkSession, entries: list[FileEntry]) -> DataFrame:
    """value:string lines from each file starting at its byte offset —
    the reference's `read_from` checkpoint resume. One task per file
    (tails are deltas; parallelism is across files), executed where
    the file is reachable (shared storage, same assumption as the
    native scan)."""
    rows = [(e.path, e.offset) for e in entries]
    src = spark.createDataFrame(rows, "path string, offset long").repartition(
        len(rows)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, off in zip(pdf["path"], pdf["offset"]):
                with open(p, "rb") as fh:
                    fh.seek(int(off))
                    data = fh.read()
                lines = data.decode("utf-8", errors="replace").split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                yield pd.DataFrame({"value": pd.Series(lines, dtype=object)})

    return src.mapInPandas(gen, "value string")


def incremental_files(
    spark: SparkSession,
    path: str,
    ckpt: CheckpointManager,
    fmt: str = "text",
    glob: str = "*",
    ignore_older_secs: float | None = None,
) -> tuple[DataFrame | None, list[FileEntry]]:
    """(DataFrame over ONLY the new content, FileEntry list to commit
    after the sink write — see commit_entries) — None frame when
    nothing is new. The listing is driver-side (same as Spark's own
    file index); full files go through the native scan-parallel
    reader, appended text files through the offset tail reader."""
    new = discover_new_files(
        path, ckpt, glob, ignore_older_secs, allow_tail=(fmt == "text")
    )
    if not new:
        return None, []
    full = [e.path for e in new if e.offset == 0]
    tails = [e for e in new if e.offset > 0]
    parts = []
    if full:
        parts.append(spark.read.format(fmt).load(full))
    if tails:
        parts.append(_read_tails(spark, tails))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df, new


def commit_entries(
    ckpt: CheckpointManager, entries: list[FileEntry], lineage: dict | None = None
) -> None:
    """Ack-then-commit: call after the sink write succeeds. Each
    file's manifest entry records the ingested size + fingerprint so
    the next pass can resume appends / detect rewrites."""
    for e in entries:
        ckpt.commit(e.key, {**e.lineage(), **(lineage or {})})
