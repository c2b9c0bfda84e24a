"""throttle — rate limit events per key per time window.

Parity: src/transforms/throttle.rs:26-47 — at most `threshold` events
per `window_secs` per key; excess dropped; `exclude` condition
bypasses. The reference uses a GCRA token bucket (governor crate);
the batch analogue keeps the FIRST `threshold` events per
(key, tumbling window) under event-time order — same guarantee
("no more than N per key per window"), deterministic on replay.
Exact continuous GCRA is inherently stateful-streaming; see
vector_spark.streaming for the applyInPandasWithState variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    key: Column | None = None,
    ts_col: str = "ts",
    order_by: list[Column] | None = None,
    exclude: Column | None = None,
) -> DataFrame:
    # skew note: the rn <= threshold filter compiles to
    # WindowGroupLimit in PARTIAL mode (verified in the executed
    # plan), so each partition pre-caps a hot key at `threshold` rows
    # before the exchange — a viral key ships threshold x partitions
    # rows, never its full volume, to the final window task.
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / window_secs)
    parts = [bucket]
    if key is not None:
        parts.append(key)
    order = order_by or [F.col(ts_col)]
    w = Window.partitionBy(*parts).orderBy(*order)
    keep = F.row_number().over(w) <= threshold
    if exclude is not None:
        keep = keep | F.coalesce(exclude, F.lit(False))
    return (
        df.withColumn("__keep", keep)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
