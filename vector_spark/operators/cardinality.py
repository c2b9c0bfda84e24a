"""tag_cardinality_limit — cap distinct values per tag key.

Parity: src/transforms/tag_cardinality_limit.rs:20-90 — per tag key,
only the first `limit` (default 500) distinct values ever seen are
accepted; an event whose tag value is outside the accepted set either
has the tag DROPPED (drop_tag) or is dropped entirely (drop_event).
The reference's "first seen" is arrival order; the batch analogue uses
a caller-supplied deterministic order column.

Scale design: the accepted set is at most `limit` rows (500), computed
with one aggregation (min(order) per distinct value) + a driver-free
top-N, then BROADCAST back — no global window over the fact table, so
the operator is one shuffle on the tag value + one broadcast join
regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    limit: int = 500,
    order_by: Column | None = None,
    action: str = "drop_tag",  # or "drop_event"
) -> DataFrame:
    if order_by is None:
        raise ValueError("order_by required (defines 'first seen')")
    firsts = (
        df.select(F.col(tag_col).alias("__v"), order_by.alias("__o"))
        .where(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.min("__o").alias("__first"))
    )
    # rank the (small, post-agg) distinct-value table; single-partition
    # window is fine because its cardinality is the number of DISTINCT
    # values, already reduced by the groupBy above.
    ranked = firsts.withColumn(
        "__rank", F.row_number().over(Window.orderBy(F.col("__first"), F.col("__v")))
    )
    accepted = ranked.filter(F.col("__rank") <= limit).select("__v")
    joined = df.join(
        F.broadcast(accepted.withColumn("__ok", F.lit(True))),
        on=df[tag_col] == F.col("__v"),
        how="left",
    )
    if action == "drop_event":
        return joined.filter(F.col("__ok") | F.col(tag_col).isNull()).drop("__v", "__ok")
    # drop_tag: null out over-limit values
    return joined.withColumn(
        tag_col, F.when(F.col("__ok") | F.col(tag_col).isNull(), F.col(tag_col))
    ).drop("__v", "__ok")
