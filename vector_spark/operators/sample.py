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
zipWithIndex-style plan with ONE full-data shuffle:

  1. counter-exempt (`exclude`) rows split off and pass through
     untouched (they never advance the counter — sample.rs:99-104),
  2. the eligible rows range-repartition + sort on the total order
     (one range shuffle; inter-partition order now matches the global
     order),
  3. `monotonically_increasing_id()` over the sorted partitions IS
     the (partition_id, local_index) pair — pid in the upper bits,
     per-partition 0-based row index in the lower 33 — so both the
     partition id and the local row number come from a pure
     projection, no window, no further exchange,
  4. per-partition counts -> prefix-sum offsets (a single-partition
     window over O(num_partitions) rows — trivially small),
     broadcast-joined back on pid,
  5. global_rn = offset + local_rn; keep rows with
     (global_rn - 1) % rate == 0.

The physical plan's ONLY SinglePartition exchange is over the
per-partition counts (one row per input partition); the event data
crosses exactly one range exchange, shared by the counts subtree and
the main side via AQE exchange reuse (same shuffle stage, read
twice). The ids are stable across the two reads: they are a pure
function of partition id and the sorted row order of the materialized
shuffle output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _LRN, _MID, _OFF, _CNT = "__pid", "__lrn", "__mid", "__off", "__cnt"
_LOW33 = (1 << 33) - 1


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
    eligible = df.filter(~excl) if exclude is not None else df
    part = (
        eligible.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col(_MID), 33))
        .withColumn(_LRN, F.col(_MID).bitwiseAND(F.lit(_LOW33)) + 1)
        .drop(_MID)
    )
    counts = part.groupBy(_PID).agg(F.max(_LRN).alias(_CNT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF)
    )
    joined = part.join(F.broadcast(offsets), _PID, "left")
    grn = F.coalesce(F.col(_OFF), F.lit(0)) + F.col(_LRN)
    sampled = (
        joined.filter(F.pmod(grn - 1, F.lit(rate)) == 0)
        .drop(_PID, _LRN, _OFF)
        .withColumn(rate_field, F.lit(rate).cast("int"))
    )
    if exclude is None:
        return sampled
    passthrough = df.filter(excl).withColumn(
        rate_field, F.lit(None).cast("int")
    )
    return sampled.unionByName(passthrough)
