"""aggregate — windowed metric roll-up.

Parity: src/transforms/aggregate.rs:69-105 — per flush interval
(default 10s, :32-34), metrics sharing a MetricSeries collapse:
Incremental kind -> values ADD (sum); Absolute kind -> last write
wins. The flush clock becomes a tumbling event-time window.

Spark design: groupBy(window(ts, interval), *series_cols) with
sum(...) for incremental and max_by(value, ts_tiebreak) for absolute —
one shuffle, partial aggregation map-side (Catalyst HashAggregate
partial/final), which is exactly the scale-out shape we want: the
combine happens before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    interval: str,
    keys: list[str],
    aggs: dict[str, Column],
    window_field: str = "window",
) -> DataFrame:
    """Generic tumbling-window groupBy; aggs: name -> agg Column."""
    named = [c.alias(name) for name, c in aggs.items()]
    return (
        df.groupBy(F.window(F.col(ts_col), interval).alias(window_field), *keys)
        .agg(*named)
        .withColumn("window_start", F.col(f"{window_field}.start"))
        .withColumn("window_end", F.col(f"{window_field}.end"))
        .drop(window_field)
    )


def aggregate_metrics(
    df: DataFrame,
    interval: str = "10 seconds",
    series_cols: list[str] | None = None,
    kind_col: str = "kind",
    value_col: str = "value",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Metric-event roll-up: rows with kind='incremental' sum within
    the window; kind='absolute' take the last value (by order_col,
    default ts). Output one row per (window, series, kind)."""
    series_cols = series_cols or ["name", "namespace"]
    ord_c = F.col(order_col) if order_col else F.col(ts_col)
    v = F.col(value_col)
    return (
        df.groupBy(
            F.window(F.col(ts_col), interval).alias("w"),
            *series_cols,
            F.col(kind_col),
        )
        .agg(
            F.when(F.first(kind_col) == "incremental", F.sum(v))
            .otherwise(F.max_by(v, ord_c))
            .alias("value"),
            F.count(F.lit(1)).alias("merged"),
        )
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
