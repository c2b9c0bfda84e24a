"""dedupe — drop events whose field projection was already seen.

Parity: src/transforms/dedupe.rs. The reference matches on
`fields.match` (default [timestamp, host, message], dedupe.rs:106-112)
or the complement of `fields.ignore`, comparing TYPE-TAGGED serialized
values (:160-202) through a 5000-entry LRU (:86-90).

Batch Spark semantics: keep the FIRST occurrence per match-key under a
deterministic order — groupBy(match).agg(min_by(row, order tuple)):
a map-side-combinable aggregate, so a HOT duplicate key (the very
thing dedupe exists for) combines within each partition instead of
funneling every copy into one window task. Order keys are ascending
(min semantics); pass pre-negated columns for descending. Type-tagging
is subsumed by the fixed table schema (a column's type can't vary per
row).
Divergence (documented, cf. SURVEY.md §2.1): the LRU's
re-admit-after-eviction behavior is capacity-dependent and
order-dependent; exact-batch dedupe is strictly stronger (never
re-admits). The streaming path (vector_spark.streaming) offers
dropDuplicatesWithinWatermark for bounded-state semantics at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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

    # backtick-quoted references resolve EXACT names — a column
    # literally named "a.b" must not parse as struct access
    def ref(c: str) -> Column:
        return F.col("`" + c.replace("`", "``") + "`")

    if order_by is None:
        order_by = [ref(c) for c in df.columns]
    first = F.min_by(
        F.struct(*[ref(c).alias(c) for c in df.columns]), F.struct(*order_by)
    ).alias("__first")
    return (
        df.groupBy(*[ref(c) for c in cols])
        .agg(first)
        .select(*[F.col("__first").getField(c).alias(c) for c in df.columns])
    )


def dedupe_lru_replay(
    df: DataFrame,
    match: list[str],
    order_by: list[Column],
    cache_size: int = 5000,
) -> DataFrame:
    """Bit-faithful replay of the reference's LRU semantics
    (dedupe.rs:86-90,214-222): events stream IN ORDER through one
    5000-entry LRU keyed by the match projection; an event is dropped
    iff its key is currently cached, and a key EVICTED by 5000 newer
    distinct keys is re-admitted on next sight (unlike exact dedupe,
    which never re-admits).

    The LRU is a single sequential state machine over the GLOBAL event
    order, so this replay deliberately runs on one partition — it
    exists for parity testing and small bounded replays, not the 100TB
    path (use `dedupe` / streaming stream_dedupe there; the divergence
    is the documented cache-eviction re-admit only)."""
    from collections import OrderedDict

    import pandas as pd

    out_schema = df.schema
    ord_struct = F.struct(*[o.alias(f"o{i}") for i, o in enumerate(order_by)])
    work = df.withColumn("__ord", ord_struct).repartition(1).sortWithinPartitions("__ord")
    names = [f.name for f in out_schema.fields]

    # sentinel for null key components: the reference's
    # build_cache_entry treats a missing/null field as a stable cache
    # key component (dedupe.rs:160-202); pandas renders nulls in
    # float-typed columns as NaN, and NaN != NaN would make every
    # null-keyed row a cache miss. Normalize before keying. Column
    # access goes through pdf[c].to_numpy() (positional itertuples +
    # getattr breaks on non-identifier column names).
    _NULL = object()

    def _norm(v):
        try:
            if v is None or pd.isna(v):
                return _NULL
        except (TypeError, ValueError):
            pass  # non-scalar cell (array/list): pass through as-is
        return v

    def replay(batches):
        lru: OrderedDict = OrderedDict()
        for pdf in batches:
            keep = []
            cols = [pdf[c].to_numpy() for c in match]
            for i in range(len(pdf)):
                key = tuple(_norm(col[i]) for col in cols)
                if key in lru:
                    lru.move_to_end(key)
                    keep.append(False)
                else:
                    lru[key] = True
                    if len(lru) > cache_size:
                        lru.popitem(last=False)
                    keep.append(True)
            out = pdf[pd.Series(keep, index=pdf.index)]
            yield out[names]

    return work.mapInPandas(replay, out_schema)
