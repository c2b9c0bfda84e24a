"""sample — 1-in-N sampling, consistent per key.

Parity: src/transforms/sample.rs:90-135. Keyed mode keeps an event
when hash(key) % rate == 0 (seahash in the reference, :116-124 — we
use Spark's codegen'd xxhash64 by default; the hash function is
pluggable and the PORTABLE arithmetic hash from functions.hashes is
used where engine-to-engine oracle parity is required). Counter mode
(no key) keeps every Nth event under a caller-supplied total
ordering. An `exclude` condition bypasses sampling (:99-104), and the
kept events get a `sample_rate` field (:130-133).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample(
    df: DataFrame,
    rate: int,
    key: Column | None = None,
    hash_fn=None,
    order_by: list[Column] | None = None,
    exclude: Column | None = None,
    rate_field: str = "sample_rate",
) -> DataFrame:
    if key is not None:
        h = hash_fn(key) if hash_fn is not None else F.xxhash64(key)
        keep = F.pmod(h, F.lit(rate)) == 0
        if exclude is not None:
            keep = keep | F.coalesce(exclude, F.lit(False))
        return df.filter(keep).withColumn(rate_field, F.lit(rate))
    if not order_by:
        raise ValueError("counter-mode sampling needs a stable order_by")
    # window functions can't live in a WHERE clause: materialize the
    # counter as a column, filter, drop
    w = Window.orderBy(*order_by)
    keep = F.pmod(F.col("__rn") - 1, F.lit(rate)) == 0
    if exclude is not None:
        keep = keep | F.coalesce(exclude, F.lit(False))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(keep)
        .drop("__rn")
        .withColumn(rate_field, F.lit(rate))
    )
