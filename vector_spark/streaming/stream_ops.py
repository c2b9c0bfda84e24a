"""Structured Streaming forms of the stateful operators.

The batch operators in vector_spark.operators replay Vector's
stateful semantics deterministically over bounded data; these are the
unbounded-stream equivalents, using Spark's own state store +
watermarks (Vector analogues noted per function):

  dedupe's LRU cache            -> dropDuplicatesWithinWatermark
  reduce's expire_after_ms      -> session_window(gap) + watermark
  aggregate's flush interval_ms -> tumbling window + watermark
  throttle's GCRA token bucket  -> applyInPandasWithState
  Sketch metric (AgentDDSketch) -> chained time-window aggregations

All functions accept a streaming DataFrame (spark.readStream...) and
return a transformed streaming DataFrame; run them with
.writeStream.trigger(availableNow=True) in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_dedupe(
    df: DataFrame, match: list[str], ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Drop duplicate events by field projection within the watermark
    horizon — the bounded-state counterpart of dedupe's 5000-entry LRU
    (src/transforms/dedupe.rs:86-90): both bound memory; the LRU
    bounds by entry count, this bounds by event time."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(match)


def stream_session_reduce(
    df: DataFrame,
    group_by: list[str],
    gap: str = "30 seconds",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """reduce's stale-group flush (expire_after_ms default 30s,
    src/transforms/reduce/mod.rs:96-98) == session_window with the
    same gap: a group flushes when no event arrives within `gap`."""
    aggs = aggs or {"events": F.count(F.lit(1))}
    named = [c.alias(n) for n, c in aggs.items()]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *group_by)
        .agg(*named)
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *group_by,
            *[F.col(n) for n in aggs],
        )
    )


def stream_aggregate(
    df: DataFrame,
    interval: str,
    keys: list[str],
    aggs: dict[str, Column],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """aggregate's flush interval (src/transforms/aggregate.rs:32-34)
    == tumbling event-time window; late data beyond the watermark is
    discarded (Vector simply merges whatever arrives in the cycle —
    the watermark makes the cutoff explicit and deterministic)."""
    named = [c.alias(n) for n, c in aggs.items()]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), interval), *keys)
        .agg(*named)
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            *[F.col(n) for n in aggs],
        )
    )


def stream_histogram_merge(
    df: DataFrame,
    interval: str,
    series_cols: list[str],
    buckets_col: str = "buckets",
    count_col: str = "count",
    sum_col: str = "sum",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming AggregatedHistogram merge (value.rs:229-253 under a
    flush window). Structured Streaming forbids stacked aggregations,
    so the batch operator's posexplode+two-level-agg shape is replaced
    by ONE aggregation (collect_list of bucket arrays + scalar sums)
    followed by a stateless zip-add reduction in the projection —
    higher-order functions run after the agg, which streaming allows.
    State per (window, series, layout) group is rows x buckets; fine
    for metric streams (bounded series cardinality), and the layout
    grouping key preserves the no-cross-layout-merge guard."""
    layout = F.transform(F.col(buckets_col), lambda b: b["upper"]).alias("__layout")
    agged = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), interval), *series_cols, layout)
        .agg(
            F.collect_list(F.col(buckets_col)).alias("__blists"),
            F.sum(F.col(count_col)).alias(count_col),
            F.sum(F.col(sum_col)).alias(sum_col),
        )
    )
    merged = F.aggregate(
        F.slice(F.col("__blists"), 2, 2_000_000_000),
        F.element_at(F.col("__blists"), 1),
        lambda acc, b: F.zip_with(
            acc,
            b,
            lambda x, y: F.struct(
                x["upper"].alias("upper"), (x["count"] + y["count"]).alias("count")
            ),
        ),
    )
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *series_cols,
        merged.alias(buckets_col),
        count_col,
        sum_col,
    )


def stream_distribution_merge(
    df: DataFrame,
    interval: str,
    series_cols: list[str],
    samples_col: str = "samples",
    statistic_col: str = "statistic",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming Distribution merge (value.rs:217-228): samples
    concatenate within (window, series, statistic) — a single
    streaming aggregation (collect_list) + stateless flatten."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), interval), *series_cols, F.col(statistic_col)
        )
        .agg(F.flatten(F.collect_list(F.col(samples_col))).alias(samples_col))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *series_cols,
            statistic_col,
            samples_col,
        )
    )


def stream_set_merge(
    df: DataFrame,
    interval: str,
    series_cols: list[str],
    values_col: str = "set_values",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming Set merge (value.rs:213-216): union of unique string
    values per (window, series)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), interval), *series_cols)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(F.col(values_col))))
            ).alias(values_col)
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *series_cols,
            values_col,
        )
    )


def stream_sketch_agg(
    df: DataFrame,
    interval: str,
    group_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming AgentDDSketch per (event-time window, group) — the
    Sketch metric value (value.rs:140-193) under aggregate's flush
    window, unbounded-stream form of `operators.ddsketch.sketch_agg`.

    The batch op is a TWO-level aggregation (per-bin partials, then
    per-group bin collect), which Structured Streaming forbids as
    stacked aggs — EXCEPT as chained time-window aggregations (Spark
    >= 3.4 multiple stateful operators, append mode): level 1 groups
    by (window(ts), group, bin-key) — state bounded by the sketch
    contract (<= ~4096 bins per group per window), exactly the bound
    that makes DDSketch a sketch — and level 2 re-aggregates ON THE
    WINDOW COLUMN, collecting the finalized bins after the watermark
    closes each window. Pure JVM (the same `sketch_key` / `_trim`
    expressions as batch), no Python state.

    Append-only: a window's sketch emits once the watermark passes its
    end (same contract as the reference's interval flush).
    """
    from vector_spark.operators.ddsketch import SKETCH_COLS, _trim, sketch_key

    vals = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(ts_col),
            *group_cols,
            F.col(value_col).cast("double").alias("__v"),
            sketch_key(F.col(value_col).cast("double")).alias("__k"),
        )
        .withWatermark(ts_col, watermark)
    )
    per_key = vals.groupBy(
        F.window(F.col(ts_col), interval), *group_cols, "__k"
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.sum("__v").alias("__sm"),
    )
    agged = per_key.groupBy(F.window(F.col("window"), interval), *group_cols).agg(
        F.array_sort(F.collect_list(F.struct("__k", "__n"))).alias("__bins"),
        F.sum("__n").alias("count"),
        F.min("__mn").alias("min"),
        F.max("__mx").alias("max"),
        F.sum("__sm").alias("sum"),
    )
    keys = F.transform(F.col("__bins"), lambda b: b["__k"])
    counts = F.transform(F.col("__bins"), lambda b: b["__n"])
    tk, tc = _trim(keys, counts)
    return (
        agged.withColumn("keys", tk)
        .withColumn("counts", tc)
        .withColumn("avg", F.col("sum") / F.col("count"))
        .select(
            F.col("window.start").alias("window_start"),
            *group_cols,
            *SKETCH_COLS,
        )
    )


def stream_throttle_state(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact per-key token bucket via applyInPandasWithState — the
    stateful-stream rendering of throttle's GCRA
    (src/transforms/throttle.rs:115-192). State per key: current
    window start + count; events over `threshold` within a window are
    dropped."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T
    import pandas as pd

    out_schema = df.schema
    state_schema = T.StructType(
        [
            T.StructField("win", T.LongType()),
            T.StructField("count", T.LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            win, count = state.get
        else:
            win, count = -1, 0
        rows = []
        # Admission depends on processing ORDER, so order must be a
        # property of the data, not of Arrow chunking: concat the whole
        # micro-batch group, then one stable sort (quicksort reorders
        # ts-ties across runs). to_dict('records') instead of
        # itertuples — tuple-attr access breaks for column names that
        # are not valid Python identifiers.
        chunks = [pdf for pdf in pdf_iter]
        batch = (
            pd.concat(chunks).sort_values(ts_col, kind="stable")
            if chunks
            else pd.DataFrame()
        )
        for d in batch.to_dict("records"):
            ts = d[ts_col]
            w = int(ts.timestamp()) // window_secs
            if w != win:
                win, count = w, 0
            if count < threshold:
                count += 1
                rows.append(d)
        state.update((win, count))
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    limit: int = 500,
    ts_col: str = "ts",
    action: str = "drop_tag",  # or "drop_event"
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful-stream tag_cardinality_limit — the native rendering of
    src/transforms/tag_cardinality_limit.rs: ONE accept-set state per
    tag key holding the first `limit` distinct values ever seen;
    later values either lose the tag (drop_tag) or the event
    (drop_event).

    State/scale notes mirroring the reference: the state is a single
    shared structure per TAG KEY (not per value), so the stream
    groups on a constant key and the operator runs on one task per
    tag key — exactly the reference's single-threaded transform.
    State size is bounded by `limit` values by construction (that is
    the operator's purpose); batch-scale data should use the batch
    operator (operators/cardinality.py), whose accept set is a
    TakeOrderedAndProject + broadcast and fully parallel."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T
    import pandas as pd

    out_schema = df.schema
    state_schema = T.StructType(
        [T.StructField("accepted", T.ArrayType(T.StringType()))]
    )
    cols = [f.name for f in out_schema.fields]

    def fn(key, pdf_iter, state: GroupState):
        accepted = list(state.get[0]) if state.exists else []
        seen = set(accepted)
        rows = []
        # 'first seen' must follow ts order across the WHOLE
        # micro-batch — Arrow delivers the group as several chunks, so
        # sorting per chunk would make the accept set depend on chunk
        # boundaries; concat first, sort once
        chunks = [pdf for pdf in pdf_iter]
        # kind='stable' (mergesort): the default quicksort reorders
        # ts-ties across runs, making the 'first seen' accept set
        # nondeterministic; a tag-value tiebreaker pins tie order to
        # content, not arrival chunking
        batch = (
            pd.concat(chunks).sort_values(
                [ts_col, tag_col], kind="stable", na_position="last"
            )
            if chunks
            else pd.DataFrame()
        )
        if len(batch):
            # to_dict('records') instead of itertuples: tuple-attr
            # access breaks for column names that are not valid
            # Python identifiers
            for d in batch.to_dict("records"):
                d.pop("__tag_group", None)
                v = d.get(tag_col)
                if v is None or v in seen:
                    rows.append(d)
                    continue
                if len(accepted) < limit:
                    accepted.append(v)
                    seen.add(v)
                    rows.append(d)
                elif action == "drop_tag":
                    d[tag_col] = None
                    rows.append(d)
                # drop_event: row vanishes
        state.update((accepted,))
        if rows:
            yield pd.DataFrame(rows, columns=[c for c in cols if c != "__tag_group"])

    grouped = df.withWatermark(ts_col, watermark).withColumn(
        "__tag_group", F.lit(tag_col)
    )
    return grouped.groupBy("__tag_group").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_line_agg(
    df: DataFrame,
    key_col: str,
    order_col: str,
    line_col: str,
    start_pattern: str,
    condition_pattern: str,
    mode: str = "continue_through",
    timeout_secs: float | None = None,
    sep: str = "\n",
    out_col: str = "message",
) -> DataFrame:
    """Streaming multiline aggregation — the unbounded form of
    operators.line_agg.line_agg_modes, replaying the reference's
    per-source automaton verbatim (src/line_agg.rs:295-355
    handle_line: vacant/occupied branches, Continue / EndInclude /
    EndExclude decisions per mode, with EndExclude's halting line
    STASHED and re-processed through the vacant branch exactly like
    poll_next's stash loop, line_agg.rs:171-185).

    `timeout_secs` is the REAL arrival-time timeout the batch form
    documents as its divergence: the reference flushes a buffer when
    no next line arrives within the timeout (DelayQueue,
    line_agg.rs:126-130); here the group's processing-time timer is
    re-armed after every micro-batch that leaves a buffer open, and
    the expiry callback (state.hasTimedOut) emits the buffered event —
    wall-clock semantics, not event-time gaps. None = flush only at
    stream end (the reference's draining path has no timeout either).

    State per key: (joined buffer, line count) — lines cannot contain
    `sep` (the reference splits on it upstream), so the joined string
    round-trips. Rows are processed in `order_col` order within each
    micro-batch (stable sort; cross-batch order is arrival order, the
    same contract as the reference's input stream)."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd
    import re as _re

    from vector_spark.operators.line_agg import MODES

    if mode not in MODES:
        raise ValueError(f"line_agg mode must be one of {MODES}: {mode!r}")

    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField(out_col, T.StringType()),
            T.StructField("line_count", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("buf", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    out_cols = [key_col, out_col, "line_count"]

    def fn(key, pdf_iter, state: GroupState):
        start_rx = _re.compile(start_pattern)
        cond_rx = _re.compile(condition_pattern)
        k = key[0]
        rows = []

        def emit(buf, n):
            rows.append({key_col: k, out_col: buf, "line_count": n})

        if state.hasTimedOut:
            # DelayQueue expiry (line_agg.rs:216-225): flush the buffer
            if state.exists:
                buf, n = state.get
                emit(buf, n)
                state.remove()
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
            return

        buf, n = state.get if state.exists else (None, 0)
        chunks = [pdf for pdf in pdf_iter]
        batch = (
            pd.concat(chunks).sort_values(order_col, kind="stable")
            if chunks
            else pd.DataFrame(columns=[line_col])
        )
        for line in batch[line_col]:
            line = "" if line is None else str(line)
            reprocess = True
            while reprocess:
                reprocess = False
                if buf is not None:  # occupied branch
                    c = cond_rx.search(line) is not None
                    if mode == "continue_through":
                        dec = "cont" if c else "end_ex"
                    elif mode == "continue_past":
                        dec = "cont" if c else "end_in"
                    elif mode == "halt_before":
                        dec = "end_ex" if c else "cont"
                    else:  # halt_with
                        dec = "end_in" if c else "cont"
                    if dec == "cont":
                        buf, n = buf + sep + line, n + 1
                    elif dec == "end_in":
                        emit(buf + sep + line, n + 1)
                        buf, n = None, 0
                    else:  # end_ex: flush, then STASH the line through
                        # the vacant branch (poll_next's stash loop)
                        emit(buf, n)
                        buf, n = None, 0
                        reprocess = True
                else:  # vacant branch
                    if start_rx.search(line) is not None:
                        buf, n = line, 1
                    else:
                        emit(line, 1)  # pass-through singleton

        if buf is not None:
            state.update((buf, n))
            if timeout_secs is not None:
                # re-arm: the reference resets the timeout whenever a
                # line lands in the buffer (timeouts.reset, :324)
                state.setTimeoutDuration(int(timeout_secs * 1000))
        elif state.exists:
            state.remove()
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_secs is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
