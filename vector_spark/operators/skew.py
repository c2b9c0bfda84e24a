"""Skew handling for hot keys (the 20x hot-conversation problem at
10^12-turn scale).

Three mechanisms, used where each actually applies:

1. `salted_agg` — two-phase aggregation: groupBy(keys + salt) partial,
   then groupBy(keys) final. For algebraic aggregates Spark's map-side
   partial aggregation already bounds skew, but holistic/collection
   aggregates (collect_list, exact distinct via sets) and very hot
   reduce keys still concentrate on one reducer; the salt splits a hot
   key across `salt_n` reducers and the final pass is over
   |keys|*salt_n pre-shrunk rows.
2. `salted_repartition` — spread rows of a hot key across salt_n
   partitions for narrow-heavy stages (e.g. an expensive Arrow UDF
   after an exchange that clustered a hot key).
3. AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled, set in
   session.py) — the join-side answer; nothing to hand-roll.

NOT salted: per-conversation windows (row_number over (conv_id,
turn_idx), sessionization). Their semantics are sequential per key;
splitting a key breaks correctness. Their skew bound is the largest
single conversation, which the Iceberg layout bounds by bucketing
conv_id and which AQE cannot help with — documented divergence from
"salt everything" folklore.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_repartition(
    df: DataFrame,
    keys: list[str],
    salt_n: int = 16,
    salt_from: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (keys..., salt) so one hot key spans up to salt_n
    partitions. salt_from: any column expression with per-row variance
    (default: a stable hash of the full row via xxhash64 of all cols —
    deterministic, no rand()). The partition count is pinned explicitly
    (default: defaultParallelism): an unpinned repartition-by-expression
    goes through AQE, which would coalesce small exchanges back into
    few partitions and silently undo the spread."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    salt = (
        F.pmod(salt_from, F.lit(salt_n))
        if salt_from is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    )
    out = df.withColumn(_SALT, salt)
    return out.repartition(
        num_partitions, *([F.col(k) for k in keys] + [F.col(_SALT)])
    ).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    final: dict[str, Callable[[str], Column]],
    salt_n: int = 16,
    salt_from: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial: output_name -> aggregate Column for phase 1
             (groupBy keys+salt).
    final:   output_name -> fn(phase1_col_name) -> aggregate Column for
             phase 2 (groupBy keys), e.g. {"events": lambda c: F.sum(c)}.
             Must re-combine the partial: sum->sum, count->sum,
             min->min, max->max, collect_list->flatten(collect_list).
    """
    salt = (
        F.pmod(salt_from, F.lit(salt_n))
        if salt_from is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    )
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*[c.alias(n) for n, c in partial.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[fn(n).alias(n) for n, fn in final.items()]
    )
