"""enrich — lookup-table joins (Vector's enrichment tables).

Parity: lib/enrichment/src/lib.rs:39-76 — find rows in a small
dimension table by AND-ed conditions: Equals{field,value} (hash
indexed, src/enrichment_tables/file.rs:247-256) or
BetweenDates{field,from,to}; optionally case-insensitive; VRL's
get_enrichment_table_record errors unless EXACTLY ONE row matches
(lib.rs:43-51).

Spark design: the hash index IS a broadcast hash join — the dimension
is broadcast once per job, the probe stays in whole-stage codegen.
Case-insensitive matching joins on lower(key) both sides.
BetweenDates becomes a broadcast range join.

The exactly-one invariant is enforced structurally: the dimension is
checked (cheap — it is small by definition) for key uniqueness at
enrich time; a non-unique dimension raises instead of silently
exploding the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    case_insensitive: bool = False,
    check_unique: bool = True,
) -> DataFrame:
    """Broadcast equality-lookup join. `on`: key column names present
    in both frames. Non-matching fact rows keep NULL enrichment
    columns (how='left') or drop (how='inner')."""
    if check_unique:
        dup = dim.groupBy(*on).count().filter(F.col("count") > 1).limit(1).count()
        if dup:
            raise ValueError(f"enrichment table not unique on {on}")
    if case_insensitive:
        fact = df
        d = dim
        conds = []
        for k in on:
            fact = fact.withColumn(f"__k_{k}", F.lower(F.col(k)))
            d = d.withColumn(f"__k_{k}", F.lower(F.col(k))).drop(k)
            conds.append(f"__k_{k}")
        out = fact.join(F.broadcast(d), on=conds, how=how)
        return out.drop(*[f"__k_{k}" for k in on])
    return df.join(F.broadcast(dim), on=on, how=how)


def enrich_between(
    df: DataFrame,
    dim: DataFrame,
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    extra_eq: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """BetweenDates condition (lib/enrichment/src/lib.rs:24-29):
    fact.ts in [dim.from, dim.to], plus optional equality keys —
    a broadcast range join (fine for small dims; Catalyst turns it
    into BroadcastNestedLoopJoin with the range predicate)."""
    cond = (F.col(ts_col) >= dim[from_col]) & (F.col(ts_col) <= dim[to_col])
    for k in extra_eq or []:
        cond = cond & (df[k] == dim[k])
    return df.join(F.broadcast(dim), on=cond, how=how)
