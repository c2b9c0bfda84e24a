"""tag_cardinality_limit — cap distinct values per tag key.

Parity: src/transforms/tag_cardinality_limit.rs:20-90 — per tag key,
only the first `limit` (default 500) distinct values ever seen are
accepted; an event whose tag value is outside the accepted set either
has the tag DROPPED (drop_tag) or is dropped entirely (drop_event).
The reference's "first seen" is arrival order; the batch analogue uses
a caller-supplied deterministic order column.

The reference offers two accept-set representations (mode.rs: `exact`
HashSet vs `probabilistic` Bloom filter).  `mode="exact"` here is
bit-faithful; `mode="probabilistic"` mirrors the Bloom trade — it
first checks the tag's distinct cardinality with approx_count_distinct
(one cheap pass, no exact distinct shuffle) and skips the accept-set
machinery entirely when the sketch says the tag is under the limit,
exactly the case Bloom mode exists to make cheap.  Over-limit tags
fall through to the exact path (a Bloom filter's false positives make
its accept set a superset anyway, so "sketch says small => accept
all" is within the reference's own error envelope).

Scale design: the accepted set is at most `limit` rows (500), computed
with one aggregation (min(order) per distinct value) + a driver-free
top-N, then BROADCAST back.  The top-N is `orderBy(...).limit(n)`,
which Catalyst compiles to TakeOrderedAndProject — per-partition
top-N then a merge of <=limit rows — NOT a global window, so a
UUID-valued tag whose distinct table is huge (the operator's whole
reason to exist) never serializes through one task.  One shuffle on
the tag value + one broadcast join regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    limit: int = 500,
    order_by: Column | None = None,
    action: str = "drop_tag",  # or "drop_event"
    mode: str = "exact",  # or "probabilistic"
) -> DataFrame:
    if order_by is None:
        raise ValueError("order_by required (defines 'first seen')")
    if mode == "probabilistic":
        # Bloom-mode analogue: one approximate-distinct pass; if the
        # sketch (2% default rsd; scaled up by 1.1 to stay on the
        # accept side of sketch error) says the tag fits, every value
        # is accepted — no distinct shuffle, no broadcast join.
        approx = (
            df.select(F.approx_count_distinct(tag_col).alias("c")).collect()[0]["c"]
        )
        if approx * 1.1 <= limit:
            return df
    firsts = (
        df.select(F.col(tag_col).alias("__v"), order_by.alias("__o"))
        .where(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.min("__o").alias("__first"))
    )
    # driver-free top-N: TakeOrderedAndProject (per-partition top-N,
    # merge of <=limit rows) — deliberately NOT a window
    accepted = firsts.orderBy(F.col("__first"), F.col("__v")).limit(limit).select("__v")
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
