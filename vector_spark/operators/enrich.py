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


def enrich_cidr(
    df: DataFrame,
    dim: DataFrame,
    ip_col: str,
    cidr_col: str = "cidr",
    how: str = "left",
    assume_disjoint: bool = True,
) -> DataFrame:
    """CIDR-range enrichment — the geoip/network-table pattern
    (src/enrichment_tables/geoip.rs semantics without the MaxMind db:
    the lookup key is containment of the fact's IP in the dimension's
    network). The dimension's 'a.b.c.d/len' strings become numeric
    [net_lo, net_hi] bounds once, then a broadcast RANGE join probes
    aton(ip) BETWEEN lo AND hi — no shuffle of the fact table, and
    the probe stays in codegen.

    With `assume_disjoint=True` (the default; geoip-style block
    tables ARE disjoint) each fact row matches at most one network
    and the plan is the pure broadcast join. Set it False for
    routing-table-style dims with nested prefixes: most-specific
    (longest prefix) wins via a row_number over a synthetic fact-row
    id — one extra shuffle keyed on a long, only when you ask for
    overlap resolution."""
    from pyspark.sql import Window

    from vector_spark.functions.vrl_compat import _cidr_mask, ip_aton

    base = F.substring_index(F.col(cidr_col), "/", 1)
    bits = F.substring_index(F.col(cidr_col), "/", -1).try_cast("int")
    mask = _cidr_mask(bits)
    d = dim.withColumn("__lo", ip_aton(base).bitwiseAND(mask)).withColumn(
        "__hi", F.col("__lo") + (F.lit(4294967295) - mask)
    ).withColumn("__bits", bits)
    probe = ip_aton(F.col(ip_col))
    if assume_disjoint:
        return df.join(
            F.broadcast(d), (probe >= d["__lo"]) & (probe <= d["__hi"]), how
        ).drop("__lo", "__hi", "__bits")
    fact = df.withColumn("__fid", F.monotonically_increasing_id())
    joined = fact.join(
        F.broadcast(d), (probe >= d["__lo"]) & (probe <= d["__hi"]), how
    )
    w = Window.partitionBy("__fid").orderBy(F.col("__bits").desc_nulls_last())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__lo", "__hi", "__bits", "__rn", "__fid")
    )
