"""line_agg — multiline aggregation (the file source's `multiline`).

Parity: src/line_agg.rs:20-60 — consecutive lines group into one event
based on a start/condition pattern and a mode. Batch mapping: a
boundary marker + running-sum segment id over
Window.partitionBy(stream).orderBy(line order), then one groupBy per
segment concatenating lines in order.

Two entry points:

  * `line_agg` — caller supplies the boundary predicate directly (the
    legacy `for_legacy` marker shape, line_agg.rs:74-88).
  * `line_agg_modes` — the full Mode enum (ContinueThrough /
    ContinuePast / HaltBefore / HaltWith, line_agg.rs:24-48) plus the
    timeout flush, derived declaratively. The reference runs a
    per-source automaton `after(i) = after(i-1) ? f(cond(i)) :
    start(i)` (handle_line, line_agg.rs:295-355); each step is one of
    absorb-1 / absorb-0 / identity / toggle depending only on the
    (start, condition) matches of line i, so the buffered-state bit is
    recoverable with running window aggregates: state = base at the
    last absorbing step XOR the parity of toggle steps since. One
    shuffle on the stream key, one sort, pure JVM expressions — no
    sequential driver loop, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def line_agg(
    df: DataFrame,
    stream_cols: list[str],
    order_by: list[Column],
    line_col: str,
    is_boundary: Column,
    sep: str = "\n",
    out_col: str = "message",
) -> DataFrame:
    """Segments start at rows where is_boundary holds; every row joins
    the most recent segment. Rows before the first boundary form
    segment 0. Output: stream_cols + segment + out_col (+ line_count,
    first-order columns for downstream ordering)."""
    w = Window.partitionBy(*stream_cols).orderBy(*order_by)
    seg = F.sum(F.coalesce(is_boundary, F.lit(False)).cast("int")).over(w)
    ord_struct = F.struct(*[o.alias(f"o{i}") for i, o in enumerate(order_by)])
    work = df.withColumn("__seg", seg).withColumn("__ord", ord_struct)
    return (
        work.groupBy(*stream_cols, F.col("__seg").alias("segment"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__ord").alias("o"), F.col(line_col).alias("v")))
                    ),
                    lambda s: s["v"],
                ),
                sep,
            ).alias(out_col),
            F.count(F.lit(1)).alias("line_count"),
            F.min("__ord").alias("__first"),
        )
        .drop("__first")
    )


# step-type tables: after(i) = after(i-1) ? _OCCUPIED[mode](cond) : start
# (the occupied branch of handle_line never consults start_pattern;
# EndExclude re-processes the halting line through the vacant branch,
# which is what folds `start` back in below)
MODES = ("continue_through", "continue_past", "halt_before", "halt_with")


def line_agg_modes(
    df: DataFrame,
    stream_cols: list[str],
    order_by: list[Column],
    line_col: str,
    start_pattern: str,
    condition_pattern: str,
    mode: str = "continue_through",
    timeout: float | None = None,
    ts_col: str | None = None,
    sep: str = "\n",
    out_col: str = "message",
) -> DataFrame:
    """Full line_agg.rs Mode enum over a batch table.

    Per line i let s = start_pattern matches, c = condition_pattern
    matches, and `after` = "a buffer is open after processing i"
    (line_agg.rs handle_line). The mode's occupied-entry decision
    table reduces each line to a step type acting on `after`:

      continue_through: s -> 1 | c -> keep | else -> 0
      continue_past:    s&c -> 1 | !s&!c -> 0 | c -> keep | s -> flip
      halt_before:      s -> 1 | !c -> keep | else -> 0
      halt_with:        c&!s -> 0 | s&!c -> 1 | !s&!c -> keep | both -> flip

    `keep`/`flip` chains resolve with running windows: after(i) =
    base(last absorbing step) XOR parity(flips since). A line JOINS
    the previous segment iff after(i-1) and the occupied branch would
    have appended it (c for continue_through, !c for halt_before,
    always for continue_past / halt_with); otherwise it starts its own
    segment (singleton pass-through lines included, matching Emit::One
    on the vacant branch).

    `timeout` (seconds, with `ts_col`): the reference flushes a buffer
    when no next line arrives within the timeout (DelayQueue,
    line_agg.rs:126-130). Batch replay maps that to EVENT-time gaps:
    a line arriving more than `timeout` after its predecessor sees a
    flushed (empty) buffer — the step is forced absorbing with
    base = s, and the line never joins backwards. Wall-clock arrival
    gaps have no batch analogue (documented divergence;
    `streaming.stream_ops.stream_line_agg` is the unbounded form with
    REAL arrival-time timeouts via applyInPandasWithState's
    processing-time timer).
    """
    if mode not in MODES:
        raise ValueError(f"line_agg mode must be one of {MODES}: {mode!r}")
    if (timeout is None) != (ts_col is None):
        raise ValueError("timeout and ts_col must be given together")

    # windows order by the carried __ord struct (struct ordering =
    # lexicographic over the order_by columns), so the original order
    # columns need not survive the projection
    w = Window.partitionBy(*stream_cols).orderBy("__ord")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # NULL lines match neither pattern (a null byte-line cannot occur
    # in the reference; here it just passes through as a singleton)
    s = F.coalesce(F.col(line_col).rlike(start_pattern), F.lit(False))
    c = F.coalesce(F.col(line_col).rlike(condition_pattern), F.lit(False))

    work = df.select(
        *stream_cols,
        F.col(line_col).alias("__line"),
        F.struct(*[o.alias(f"o{i}") for i, o in enumerate(order_by)]).alias(
            "__ord"
        ),
        s.alias("__s"),
        c.alias("__c"),
        *(
            [F.col(ts_col).cast("double").alias("__ts")]
            if timeout is not None
            else []
        ),
    )

    s, c = F.col("__s"), F.col("__c")
    # step classification -> (absorbing?, base, toggle?)
    if mode == "continue_through":
        absorbing, base, toggle, joins = s | ~c, s, F.lit(False), c
    elif mode == "halt_before":
        absorbing, base, toggle, joins = s | c, s, F.lit(False), ~c
    elif mode == "continue_past":
        absorbing = (s & c) | (~s & ~c)
        base, toggle, joins = s & c, ~c & s, F.lit(True)
    else:  # halt_with
        absorbing = s != c
        base, toggle, joins = s & ~c, s & c, F.lit(True)

    if timeout is not None:
        gap = (F.col("__ts") - F.lag("__ts").over(w)) > float(timeout)
        gapbreak = F.coalesce(gap, F.lit(False))
        absorbing = absorbing | gapbreak
        base = F.when(gapbreak, s).otherwise(base)
        toggle = toggle & ~gapbreak
        joins = joins & ~gapbreak

    work = work.select(
        *stream_cols,
        "__line",
        "__ord",
        absorbing.alias("__abs"),
        base.cast("int").alias("__base"),
        toggle.cast("int").alias("__tog"),
        joins.alias("__joins"),
    )
    work = work.select(
        "*",
        F.sum("__tog").over(run).alias("__tog_cum"),
    )
    # base and toggle-count AT the last absorbing row; before any
    # absorbing row the initial state (no buffer) is base 0, toggles 0
    work = work.select(
        "*",
        F.coalesce(
            F.last(F.when(F.col("__abs"), F.col("__base")), ignorenulls=True).over(
                run
            ),
            F.lit(0),
        ).alias("__base_last"),
        F.coalesce(
            F.last(
                F.when(F.col("__abs"), F.col("__tog_cum")), ignorenulls=True
            ).over(run),
            F.lit(0),
        ).alias("__tog_at_abs"),
    )
    after = (
        F.col("__base_last")
        + (F.col("__tog_cum") - F.col("__tog_at_abs"))
    ) % 2 == 1
    work = work.select("*", after.alias("__after"))
    join_prev = (
        F.coalesce(F.lag("__after").over(w), F.lit(False)) & F.col("__joins")
    )
    work = work.select(
        "*", (~join_prev).cast("int").alias("__newseg")
    )
    work = work.select(
        "*", F.sum("__newseg").over(run).alias("__seg")
    )
    return (
        work.groupBy(*stream_cols, F.col("__seg").alias("segment"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__ord").alias("o"),
                                F.col("__line").alias("v"),
                            )
                        )
                    ),
                    lambda x: x["v"],
                ),
                sep,
            ).alias(out_col),
            F.count(F.lit(1)).alias("line_count"),
        )
    )
