"""line_agg — multiline aggregation (the file source's `multiline`).

Parity: src/line_agg.rs:20-60 — consecutive lines group into one event
based on a start/condition pattern and a mode. Batch mapping: a
boundary marker + running-sum segment id over
Window.partitionBy(stream).orderBy(line order), then one groupBy per
segment concatenating lines in order.

Modes (line_agg.rs Mode):
  start_pattern mode 'continue_through' (the common "stacktrace"
  shape): a NON-matching line continues the previous segment; a
  matching line starts a new one. 'halt_before': a matching line
  STARTS a new segment (same boundary math, inverted pattern sense is
  the caller's choice of marker).
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
