"""sample — 1-in-N sampling, consistent per key.

Parity: src/transforms/sample.rs:90-135. Keyed mode keeps an event
when hash(key) % rate == 0 (seahash in the reference, :116-124 — we
use Spark's codegen'd xxhash64 by default; the hash function is
pluggable and the PORTABLE arithmetic hash from functions.hashes is
used where engine-to-engine oracle parity is required). Counter mode
(no key) keeps every Nth event under a caller-supplied total
ordering. An `exclude` condition bypasses sampling entirely
(:99-104): excluded events pass through unsampled, do NOT advance the
counter, and do not receive a `sample_rate` field (:130-133).

Scale note (counter mode): "every Nth event globally" needs a global
row number. A naive `Window.orderBy(...)` with no partitionBy
serializes the whole table through one task; instead we use a
two-phase zipWithIndex-style plan that stays fully parallel:

  1. range-repartition + sort on the total order (one range shuffle;
     inter-partition order now matches the global order),
  2. per-partition local running count of counter-eligible rows
     (window partitioned by spark_partition_id — parallel),
  3. per-partition eligible-row counts -> prefix-sum offsets (a
     single-partition window over O(num_partitions) rows — trivially
     small), broadcast-joined back on partition id,
  4. global_rn = offset + local_rn; keep rows with
     (global_rn - 1) % rate == 0.

The physical plan has NO single-partition exchange over event data;
the only serialized stage touches one row per partition. The
partitioned frame feeds both the offsets subtree and the main join
side; both recomputations see identical partition ids because
repartitionByRange samples range bounds with a fixed seed and the
source scan order is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _EX, _LRN, _OFF, _CNT = "__pid", "__ex", "__lrn", "__off", "__cnt"


def sample(
    df: DataFrame,
    rate: int,
    key: Column | None = None,
    hash_fn=None,
    order_by: list[Column] | None = None,
    exclude: Column | None = None,
    rate_field: str = "sample_rate",
) -> DataFrame:
    excl = (
        F.coalesce(exclude, F.lit(False)) if exclude is not None else F.lit(False)
    )
    if key is not None:
        h = hash_fn(key) if hash_fn is not None else F.xxhash64(key)
        keep = (F.pmod(h, F.lit(rate)) == 0) | excl
        return df.filter(keep).withColumn(
            rate_field, F.when(~excl, F.lit(rate))
        )
    if not order_by:
        raise ValueError("counter-mode sampling needs a stable order_by")
    part = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(_EX, excl)
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = part.withColumn(
        _LRN, F.sum(F.when(F.col(_EX), 0).otherwise(1)).over(w_local)
    )
    counts = part.groupBy(_PID).agg(F.max(_LRN).alias(_CNT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    joined = part.join(F.broadcast(offsets), _PID, "left")
    grn = F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LRN)
    keep = (~F.col(_EX)) & (F.pmod(grn - 1, F.lit(rate)) == 0)
    return (
        joined.filter(keep | F.col(_EX))
        .withColumn(rate_field, F.when(~F.col(_EX), F.lit(rate)))
        .drop(_PID, _EX, _LRN, _OFF)
    )
