"""reduce — group-merge / sessionization.

Parity: src/transforms/reduce/mod.rs — group events by a discriminant
(`group_by`, mod.rs:53-67), merge fields per strategy
(merge_strategy.rs:14-52), flush on `ends_when` (inclusive) /
`starts_when` (exclusive) conditions (mod.rs:365-399). Default merge
behavior (mod.rs:74-79): first value kept for strings/timestamps, a
`<ts>_end` field added from the last timestamp, numbers summed.

Spark design: a batch replay of the condition-driven session machine —
sub-session ids are a running count of boundary markers over
Window.partitionBy(group).orderBy(order) (shift for inclusive ends),
then one groupBy((group, session)).agg(...) with the strategy table.
This is a single shuffle on the group key; the window and the groupBy
share the same partitioning so Catalyst reuses the exchange.

Merge strategies supported (merge_strategy.rs:14-52 — the full enum):
  discard/first, retain (last NON-null, the reference's coalesce
  nuance), last (plain), sum, max, min, array, concat, concat_newline,
  concat_raw, flat_unique, longest_array/shortest_array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ORD = "__ord"
_SESS = "__session"


def _strategy_agg(strategy: str, col: str, ord_col: str) -> Column:
    c, o = F.col(col), F.col(ord_col)
    if strategy in ("first", "discard"):
        return F.min_by(c, o)
    if strategy == "last":
        return F.max_by(c, o)
    if strategy == "retain":
        # merge_strategy.rs Retain: "works as a way to coalesce by not
        # retaining null" — the LAST NON-NULL value, not the last value
        return F.max_by(c, F.when(c.isNotNull(), o))
    if strategy == "sum":
        return F.sum(c)
    if strategy == "max":
        return F.max(c)
    if strategy == "min":
        return F.min(c)
    if strategy == "array":
        # order-stable collect: sort (ord, value) structs then project
        return F.transform(
            F.array_sort(F.collect_list(F.struct(o.alias("o"), c.alias("v")))),
            lambda s: s["v"],
        )
    if strategy in ("concat", "concat_newline", "concat_raw"):
        sep = {"concat": " ", "concat_newline": "\n", "concat_raw": ""}[strategy]
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(o.alias("o"), c.alias("v")))),
                lambda s: s["v"],
            ),
            sep,
        )
    if strategy == "flat_unique":
        return F.array_distinct(F.flatten(F.collect_list(c)))
    if strategy == "longest_array":
        return F.max_by(c, F.size(c))
    if strategy == "shortest_array":
        return F.min_by(c, F.size(c))
    raise ValueError(f"unknown merge strategy {strategy!r}")


def reduce_groups(
    df: DataFrame,
    group_by: list[str],
    merge: dict[str, tuple[str, str]],
    order_by: Column | None = None,
    count_field: str | None = "events",
) -> DataFrame:
    """Plain (non-session) reduce: one output row per group.

    merge: output_name -> (strategy, input_col).
    order_by: a single orderable Column making first/last/array
    deterministic (default: monotonically increasing not allowed —
    caller must supply, typically the event timestamp or (ts, idx)).
    """
    if order_by is None:
        raise ValueError("order_by required for deterministic first/last")
    work = df.withColumn(_ORD, order_by)
    aggs = [_strategy_agg(s, c, _ORD).alias(name) for name, (s, c) in merge.items()]
    if count_field:
        aggs.append(F.count(F.lit(1)).alias(count_field))
    return work.groupBy(*group_by).agg(*aggs)


def reduce_sessions(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    merge: dict[str, tuple[str, str]],
    ends_when: Column | None = None,
    starts_when: Column | None = None,
    count_field: str | None = "events",
    session_field: str | None = None,
) -> DataFrame:
    """Condition-driven sessionized reduce (batch replay of
    mod.rs:365-399): `ends_when` flushes INCLUDING the matching event;
    `starts_when` flushes BEFORE it (event opens the next session).
    One output row per (group, session)."""
    if ends_when is None and starts_when is None:
        raise ValueError("need ends_when or starts_when (else use reduce_groups)")
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    if ends_when is not None:
        # session increments AFTER an end-marker row
        marker = F.coalesce(ends_when, F.lit(False)).cast("int")
        lagged = F.coalesce(F.lag(marker, 1).over(w), F.lit(0))
        sess = F.sum(lagged).over(w)
    else:
        marker = F.coalesce(starts_when, F.lit(False)).cast("int")
        sess = F.sum(marker).over(w)

    # single orderable struct for first/last determinism
    ord_struct = F.struct(*[o.alias(f"o{i}") for i, o in enumerate(order_by)])
    work = df.withColumn(_SESS, sess).withColumn(_ORD, ord_struct)
    aggs = [_strategy_agg(s, c, _ORD).alias(name) for name, (s, c) in merge.items()]
    if count_field:
        aggs.append(F.count(F.lit(1)).alias(count_field))
    out = work.groupBy(*group_by, _SESS).agg(*aggs)
    if session_field:
        out = out.withColumnRenamed(_SESS, session_field)
    else:
        out = out.drop(_SESS)
    return out
