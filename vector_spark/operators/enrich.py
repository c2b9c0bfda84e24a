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


def load_enrichment_csv(
    spark,
    path: str,
    schema: dict[str, str] | None = None,
    delimiter: str = ",",
    include_headers: bool = True,
) -> DataFrame:
    """CSV-file enrichment table loader
    (src/enrichment_tables/file.rs:24-67): header/delimiter options
    plus the per-column `schema` coercion map — 'integer', 'float',
    'boolean', 'date' (ISO), 'date|<java format>', 'timestamp',
    anything else stays string (the Conversion::parse surface,
    file.rs:122-180). Headerless files get positional col_0..col_N
    names like the reference's generated fields. The loaded frame is
    a normal small dimension: pass it to enrich_lookup /
    enrich_between (which broadcast it)."""
    reader = (
        spark.read.option("header", "true" if include_headers else "false")
        .option("delimiter", delimiter)
    )
    dim = reader.csv(path)
    if not include_headers:
        dim = dim.toDF(*[f"col_{i}" for i in range(len(dim.columns))])
    for col, kind in (schema or {}).items():
        if col not in dim.columns:
            raise ValueError(f"schema column {col!r} not in CSV ({dim.columns})")
        if kind == "integer":
            dim = dim.withColumn(col, F.col(col).try_cast("bigint"))
        elif kind == "float":
            dim = dim.withColumn(col, F.col(col).try_cast("double"))
        elif kind == "boolean":
            from vector_spark.functions.vrl_compat import to_bool

            dim = dim.withColumn(col, to_bool(F.col(col)))
        elif kind == "date":
            dim = dim.withColumn(col, F.to_date(F.col(col), "yyyy-MM-dd"))
        elif kind.startswith("date|"):
            dim = dim.withColumn(col, F.to_date(F.col(col), kind.split("|", 1)[1].strip()))
        elif kind == "timestamp":
            dim = dim.withColumn(col, F.to_timestamp(F.col(col)))
        elif kind == "string":
            pass
        else:
            raise ValueError(f"unknown enrichment schema type {kind!r} for {col!r}")
    return dim
