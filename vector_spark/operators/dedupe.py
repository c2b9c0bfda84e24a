"""dedupe — drop events whose field projection was already seen.

Parity: src/transforms/dedupe.rs. The reference matches on
`fields.match` (default [timestamp, host, message], dedupe.rs:106-112)
or the complement of `fields.ignore`, comparing TYPE-TAGGED serialized
values (:160-202) through a 5000-entry LRU (:86-90).

Batch Spark semantics: keep the FIRST occurrence per match-key under a
deterministic order — row_number()==1 over
Window.partitionBy(match).orderBy(order). Type-tagging is subsumed by
the fixed table schema (a column's type can't vary per row).
Divergence (documented, cf. SURVEY.md §2.1): the LRU's
re-admit-after-eviction behavior is capacity-dependent and
order-dependent; exact-batch dedupe is strictly stronger (never
re-admits). The streaming path (vector_spark.streaming) offers
dropDuplicatesWithinWatermark for bounded-state semantics at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    order_by: list[Column] | None = None,
) -> DataFrame:
    if (match is None) == (ignore is None):
        raise ValueError("exactly one of match / ignore must be given")
    cols = match if match is not None else [c for c in df.columns if c not in set(ignore)]
    if order_by is None:
        order_by = [F.col(c) for c in df.columns]
    w = Window.partitionBy(*cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
