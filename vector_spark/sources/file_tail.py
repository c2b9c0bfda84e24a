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

Two race/aliasing hazards are handled explicitly:

  * reads are CAPPED at the discovery-time size — bytes appended
    between discovery and task execution are left for the next pass
    (the manifest commits the discovery size, so an uncapped read
    would emit those bytes now AND re-emit them next pass);
  * the fingerprint length is PINNED to the committed prefix: a file
    committed at 100 bytes is re-fingerprinted over its first 100
    bytes (not the full 256-byte window), so an append to a small
    file still matches its fingerprint and resumes at the offset
    instead of being misclassified as a rewrite. The manifest stores
    `fp_len` alongside size + fingerprint.

The manifest is keyed by BASENAME with {size, fingerprint, fp_len}
stored as values, so a changed file SUPERSEDES its old entry instead
of leaving stale keys committed forever. Commit is ack-then-checkpoint:
the caller commits AFTER its sink write succeeds (same contract as
plans.checkpoint.run_resumable), so a crash between read and sink
re-reads the delta and the sink write must be idempotent.

Offset resume assumes appends are line-aligned (the committed size
falls on a line boundary) — true for log appenders that write whole
lines; a partial trailing line at commit time would re-emit its
remainder fused to the next write. Plain text files all go through
the byte-capped reader (one task per file; parallelism is across
files); CRLF files lose the '\r' exactly as spark.read.text would.
COMPRESSED text files (.gz/.bz2/...) cannot byte-seek — a raw-offset
read of a gzip member is mojibake — so they are never tailed: they
route through the native text reader (which transparently
decompresses), and a grown compressed file is a full re-read. The
standard contract applies: compressed logs are rotation artifacts,
immutable once placed. Non-text formats likewise cannot seek OR cap,
so their appends fall back to a FULL re-read of the live file:
callers ingesting appendable non-text files get duplicate prior rows
and should dedupe downstream (or use the streaming file source).
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

FP_BYTES = 256

# suffixes Hadoop's codec factory decompresses transparently — these
# files are read whole via the native reader, never byte-tailed
COMPRESSED_EXTS = (".gz", ".bz2", ".deflate", ".snappy", ".lz4", ".zst", ".zstd")


def _is_compressed(path: str) -> bool:
    return path.lower().endswith(COMPRESSED_EXTS)


class FileEntry(NamedTuple):
    path: str
    key: str  # manifest key = basename; superseded on re-commit
    size: int
    fingerprint: str
    offset: int  # bytes already ingested; 0 = read in full
    fp_len: int  # bytes the fingerprint covers (min(size, FP_BYTES))

    def lineage(self) -> dict:
        """Manifest value recording where ingestion got to — merge
        into the commit payload (commit_entries does this)."""
        return {
            "size": self.size,
            "fingerprint": self.fingerprint,
            "fp_len": self.fp_len,
        }


def file_fingerprint(path: str, n_bytes: int = FP_BYTES) -> str:
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
        fp_len = min(size, FP_BYTES)
        fp = file_fingerprint(f, fp_len)
        prev = committed.get(base)
        if prev is None:
            out.append(FileEntry(f, base, size, fp, 0, fp_len))
            continue
        # compare over the COMMITTED prefix length: an append to a
        # file smaller than FP_BYTES must not change its fingerprint
        prev_len = prev.get("fp_len", FP_BYTES)
        prev_cmp = (
            fp if prev_len == fp_len else file_fingerprint(f, min(size, prev_len))
        )
        same_fp = prev.get("fingerprint") == prev_cmp
        prev_size = prev.get("size")
        if same_fp and prev_size == size:
            continue  # unchanged
        if (
            same_fp
            and isinstance(prev_size, int)
            and 0 < prev_size < size
            and allow_tail
            # a compressed stream has no seekable byte offsets: a
            # grown .gz (new members appended) must re-read in full
            and not _is_compressed(f)
        ):
            # append: resume at the committed byte offset
            out.append(FileEntry(f, base, size, fp, prev_size, fp_len))
        else:
            # rewritten (or tail resume disabled): full re-read
            out.append(FileEntry(f, base, size, fp, 0, fp_len))
    return out


def _read_capped(spark: SparkSession, entries: list[FileEntry]) -> DataFrame:
    """value:string lines from each file, bytes [offset, size) as of
    DISCOVERY — the reference's `read_from` checkpoint resume. The cap
    at the discovery size makes the read idempotent under concurrent
    appends: bytes landing after discovery are neither emitted now nor
    committed, so the next pass picks them up exactly once. One task
    per file (tails are deltas; parallelism is across files), executed
    where the file is reachable (shared storage, same assumption as
    the native scan)."""
    rows = [(e.path, e.offset, e.size) for e in entries]
    src = spark.createDataFrame(
        rows, "path string, offset long, size long"
    ).repartition(len(rows))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, off, size in zip(pdf["path"], pdf["offset"], pdf["size"]):
                with open(p, "rb") as fh:
                    fh.seek(int(off))
                    data = fh.read(int(size) - int(off))
                lines = data.decode("utf-8", errors="replace").split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                # CRLF parity with spark.read.text (Hadoop LineReader
                # treats \r\n as one terminator): drop the trailing \r
                lines = [
                    ln[:-1] if ln.endswith("\r") else ln for ln in lines
                ]
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
    file index). Text files (full or appended) go through the
    byte-capped reader so the emitted bytes always equal the committed
    size; non-text formats go through the native scan-parallel reader
    (uncapped — see module docstring)."""
    new = discover_new_files(
        path, ckpt, glob, ignore_older_secs, allow_tail=(fmt == "text")
    )
    if not new:
        return None, []
    if fmt == "text":
        plain = [e for e in new if not _is_compressed(e.path)]
        comp = [e for e in new if _is_compressed(e.path)]
        frames = []
        if plain:
            frames.append(_read_capped(spark, plain))
        if comp:
            # native reader: transparent decompression + CRLF handling;
            # uncapped by construction (no byte offsets in a codec
            # stream) — compressed files are expected to be immutable
            frames.append(
                spark.read.format("text").load([e.path for e in comp])
            )
        df = frames[0]
        for extra in frames[1:]:
            df = df.unionByName(extra)
        return df, new
    df = spark.read.format(fmt).load([e.path for e in new])
    return df, new


def commit_entries(
    ckpt: CheckpointManager, entries: list[FileEntry], lineage: dict | None = None
) -> None:
    """Ack-then-commit: call after the sink write succeeds. Each
    file's manifest entry records the ingested size + fingerprint so
    the next pass can resume appends / detect rewrites."""
    for e in entries:
        ckpt.commit(e.key, {**e.lineage(), **(lineage or {})})
