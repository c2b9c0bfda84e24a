"""Resumability: partitions completed before a crash are skipped on
restart; lineage records per-partition row counts (ack-then-checkpoint,
cf. lib/vector-common/src/finalization.rs / file checkpointer)."""

import os

import pytest
from pyspark.sql import functions as F

from vector_spark.plans.checkpoint import CheckpointManager, run_resumable


def test_resume_skips_completed(spark, tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "manifest"))
    out_dir = str(tmp_path / "out")
    calls = []

    def load(key):
        return spark.range(100).withColumn("part", F.lit(key))

    def process(df):
        return df.filter(F.col("id") % 2 == 0)

    def write(key, df):
        calls.append(key)
        path = os.path.join(out_dir, key)
        df.write.mode("overwrite").parquet(path)
        return df.count()

    parts = ["day=2024-01-01", "day=2024-01-02", "day=2024-01-03"]
    ran = run_resumable(parts, load, process, write, ckpt)
    assert set(ran) == set(parts)
    assert all(v["rows_in"] == 100 and v["rows_out"] == 50 for v in ran.values())

    # "restart": nothing re-runs
    calls.clear()
    ran2 = run_resumable(parts, load, process, write, ckpt)
    assert ran2 == {} and calls == []

    # one new partition appears -> only it runs
    ran3 = run_resumable(parts + ["day=2024-01-04"], load, process, write, ckpt)
    assert set(ran3) == {"day=2024-01-04"} and calls == ["day=2024-01-04"]

    # lineage persisted
    done = ckpt.completed()
    assert len(done) == 4
    assert done["day=2024-01-01"]["rows_out"] == 50


def test_failed_write_not_committed(spark, tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "m2"))

    def bad_write(key, df):
        raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        run_resumable(
            ["p1"],
            lambda k: spark.range(10),
            lambda df: df,
            bad_write,
            ckpt,
        )
    assert not ckpt.is_done("p1")  # crash before ack -> partition re-runs


def test_run_pipeline_resumable_skips_and_records_metrics(spark, tmp_path):
    """Flagship-on-checkpoint: crash after day 1, restart completes the
    rest, finished day untouched, lineage carries per-stage metrics,
    and the union of per-day outputs equals the single-shot pipeline."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_spark.plans.checkpoint import CheckpointManager, run_pipeline_resumable
    from vector_spark.plans.transcript_pipeline import run_pipeline_fused
    from vector_spark.sources.synth import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

    src = str(tmp_path / "in")
    pdf = gen_transcripts_pdf(np.arange(3000))  # conv offset 60s -> spans 2+ ts-days
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")

    ran = run_pipeline_resumable(spark, src, out)
    assert len(ran) >= 2
    first_day = sorted(ran)[0]
    assert ran[first_day]["stage_metrics"]["parse_enrich"]["rows"] > 0

    # simulate a restart: completed days must be skipped
    ran2 = run_pipeline_resumable(spark, src, out)
    assert ran2 == {}

    # remove one manifest entry -> exactly that day re-runs
    ckpt = CheckpointManager(out + "/_checkpoints")
    import os

    os.remove(ckpt._path(first_day))
    ran3 = run_pipeline_resumable(spark, src, out)
    assert list(ran3) == [first_day]

    # union of per-day outputs == single-shot fused pipeline
    got = (
        spark.read.parquet(out + "/day=*")
        .groupBy("sink")
        .agg(F.sum("events").alias("n"))
        .collect()
    )
    want = (
        run_pipeline_fused(spark, spark.read.parquet(src), stable_order=False)
        .groupBy("sink")
        .agg(F.sum("events").alias("n"))
        .collect()
    )
    assert {r.sink: r.n for r in got} == {r.sink: r.n for r in want}


def test_incremental_file_source(spark, tmp_path):
    """File-tail shape: only new files read per pass; a rewritten
    file (new fingerprint) is re-read; committed files are skipped."""
    from vector_spark.plans.checkpoint import CheckpointManager
    from vector_spark.sources.file_tail import incremental_files

    d = tmp_path / "in"
    d.mkdir()
    (d / "a.log").write_text("line-a1\nline-a2\n")
    (d / "b.log").write_text("line-b1\n")
    ckpt = CheckpointManager(str(tmp_path / "manifest"))

    from vector_spark.sources.file_tail import commit_entries

    df, entries = incremental_files(spark, str(d), ckpt)
    assert sorted(r.value for r in df.collect()) == [
        "line-a1", "line-a2", "line-b1"
    ]
    commit_entries(ckpt, entries, {"rows": 1})

    # nothing new -> no frame
    df2, entries2 = incremental_files(spark, str(d), ckpt)
    assert df2 is None and entries2 == []

    # a new file and a REWRITTEN file both show up; b.log unchanged
    (d / "c.log").write_text("line-c1\n")
    (d / "a.log").write_text("rewritten\n")
    df3, entries3 = incremental_files(spark, str(d), ckpt)
    assert sorted(r.value for r in df3.collect()) == ["line-c1", "rewritten"]
    assert sorted(e.key for e in entries3) == ["a.log", "c.log"]
    # the rewritten file SUPERSEDED its manifest entry (basename key)
    commit_entries(ckpt, entries3, {})
    assert len(ckpt.completed()) == 3


def test_incremental_file_source_appends(spark, tmp_path):
    """An append resumes at the committed byte offset (the reference's
    checkpointer `read_from` contract): ONLY the appended lines are
    emitted — the previously ingested prefix is NOT re-emitted as
    duplicates."""
    from vector_spark.plans.checkpoint import CheckpointManager
    from vector_spark.sources.file_tail import commit_entries, incremental_files

    d = tmp_path / "in"
    d.mkdir()
    (d / "big.log").write_text("x" * 300 + "\n")
    ckpt = CheckpointManager(str(tmp_path / "manifest"))
    _, entries = incremental_files(spark, str(d), ckpt)
    commit_entries(ckpt, entries)
    with open(d / "big.log", "a") as fh:
        fh.write("appended-line\nsecond-append\n")
    df, entries2 = incremental_files(spark, str(d), ckpt)
    assert df is not None and len(entries2) == 1
    assert entries2[0].offset == 301
    assert sorted(r.value for r in df.collect()) == [
        "appended-line", "second-append"
    ]
    # commit supersedes; a third pass sees nothing new
    commit_entries(ckpt, entries2)
    df3, entries3 = incremental_files(spark, str(d), ckpt)
    assert df3 is None and entries3 == []


def test_append_to_small_file_resumes_not_rereads(spark, tmp_path):
    """An append to a file SMALLER than the fingerprint window must be
    classified as an append (offset resume), not a rewrite: the
    fingerprint comparison is pinned to the committed prefix length
    (fp_len in the manifest), so the new bytes don't change it."""
    from vector_spark.plans.checkpoint import CheckpointManager
    from vector_spark.sources.file_tail import commit_entries, incremental_files

    d = tmp_path / "in"
    d.mkdir()
    (d / "small.log").write_text("tiny-1\n")  # 7 bytes << 256
    ckpt = CheckpointManager(str(tmp_path / "manifest"))
    df, entries = incremental_files(spark, str(d), ckpt)
    assert [r.value for r in df.collect()] == ["tiny-1"]
    commit_entries(ckpt, entries)

    with open(d / "small.log", "a") as fh:
        fh.write("tiny-2\n")
    df2, entries2 = incremental_files(spark, str(d), ckpt)
    assert len(entries2) == 1 and entries2[0].offset == 7  # append, not rewrite
    assert [r.value for r in df2.collect()] == ["tiny-2"]  # no duplicate tiny-1
    commit_entries(ckpt, entries2)

    # a REWRITE within the committed prefix is still detected
    (d / "small.log").write_text("other-1\nother-2\n")
    df3, entries3 = incremental_files(spark, str(d), ckpt)
    assert len(entries3) == 1 and entries3[0].offset == 0
    assert sorted(r.value for r in df3.collect()) == ["other-1", "other-2"]


def test_read_capped_at_discovery_size(spark, tmp_path):
    """Bytes appended AFTER discovery are neither emitted nor
    committed this pass — they arrive exactly once on the next pass
    (the concurrent-appender idempotence contract)."""
    from vector_spark.plans.checkpoint import CheckpointManager
    from vector_spark.sources.file_tail import (
        commit_entries,
        discover_new_files,
        _read_capped,
    )

    d = tmp_path / "in"
    d.mkdir()
    (d / "live.log").write_text("first\n")
    ckpt = CheckpointManager(str(tmp_path / "manifest"))
    entries = discover_new_files(str(d), ckpt)
    # appender races in between discovery and the read
    with open(d / "live.log", "a") as fh:
        fh.write("racy-late-line\n")
    got = [r.value for r in _read_capped(spark, entries).collect()]
    assert got == ["first"]  # capped at discovery size
    commit_entries(ckpt, entries)
    # next pass picks the raced bytes up exactly once, as an append
    entries2 = discover_new_files(str(d), ckpt)
    assert len(entries2) == 1 and entries2[0].offset == 6
    got2 = [r.value for r in _read_capped(spark, entries2).collect()]
    assert got2 == ["racy-late-line"]


def test_crlf_and_gzip_text_files(spark, tmp_path):
    """ADVICE r4: CRLF lines lose the '\\r' (spark.read.text parity)
    and compressed text files decompress via the native reader instead
    of being split raw; a grown .gz is a full re-read, never a tail."""
    import gzip

    from vector_spark.plans.checkpoint import CheckpointManager
    from vector_spark.sources.file_tail import commit_entries, incremental_files

    d = tmp_path / "in"
    d.mkdir()
    (d / "crlf.log").write_bytes(b"win-1\r\nwin-2\r\nwin-3\r\n")
    with gzip.open(d / "old.log.gz", "wb") as fh:
        fh.write(b"gz-1\ngz-2\n")
    ckpt = CheckpointManager(str(tmp_path / "manifest"))

    df, entries = incremental_files(spark, str(d), ckpt)
    assert sorted(r.value for r in df.collect()) == [
        "gz-1", "gz-2", "win-1", "win-2", "win-3"
    ]
    commit_entries(ckpt, entries, {})

    # append a CRLF line -> tailed, '\r' stripped; append a new gzip
    # member -> full re-read (compressed streams have no byte offsets)
    with open(d / "crlf.log", "ab") as fh:
        fh.write(b"win-4\r\n")
    with open(d / "old.log.gz", "ab") as fh:
        fh.write(gzip.compress(b"gz-3\n"))
    df2, entries2 = incremental_files(spark, str(d), ckpt)
    assert sorted(r.value for r in df2.collect()) == [
        "gz-1", "gz-2", "gz-3", "win-4"
    ]
    gz_entry = next(e for e in entries2 if e.key == "old.log.gz")
    assert gz_entry.offset == 0  # never tailed
    crlf_entry = next(e for e in entries2 if e.key == "crlf.log")
    assert crlf_entry.offset > 0  # tailed at the committed byte offset
