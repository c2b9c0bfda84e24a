"""Event-kind envelope + type-test conditions (IsLog / IsMetric /
IsTrace) and TraceEvent analogue.

Parity: the reference's event model is a 3-variant enum
(lib/vector-core/src/event/mod.rs: Log / Metric / Trace;
TraceEvent in lib/vector-core/src/event/trace.rs is a LogEvent
newtype — same fields map, separate variant), and the type-test
conditions (src/conditions/mod.rs:22-47: `is_log`, `is_metric`,
`is_trace`) gate transforms by variant.

Spark design: a typed-schema world carries the variant as a `kind`
column on a union DataFrame; the conditions are plain equality
predicates, so they stay parquet-pushdown-eligible and cost nothing
at 100 TB (partition or row-group pruning if the writer partitions by
kind — which `tag_kind` callers should, exactly like the reference's
per-variant buffers)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KIND_LOG = "log"
KIND_METRIC = "metric"
KIND_TRACE = "trace"
_KINDS = (KIND_LOG, KIND_METRIC, KIND_TRACE)

KIND_COL = "event_kind"


def tag_kind(df: DataFrame, kind: str) -> DataFrame:
    """Stamp a DataFrame with its event variant (the Spark analogue of
    wrapping in the Event enum)."""
    if kind not in _KINDS:
        raise ValueError(f"unknown event kind {kind!r} (one of {_KINDS})")
    return df.withColumn(KIND_COL, F.lit(kind))


def is_log(col: Column | None = None) -> Column:
    """src/conditions/mod.rs IsLog."""
    return (col if col is not None else F.col(KIND_COL)) == KIND_LOG


def is_metric(col: Column | None = None) -> Column:
    """src/conditions/mod.rs IsMetric."""
    return (col if col is not None else F.col(KIND_COL)) == KIND_METRIC


def is_trace(col: Column | None = None) -> Column:
    """src/conditions/mod.rs IsTrace."""
    return (col if col is not None else F.col(KIND_COL)) == KIND_TRACE


def trace_from_log(df: DataFrame) -> DataFrame:
    """TraceEvent::from(LogEvent) (lib/vector-core/src/event/trace.rs
    is a newtype over the log fields map): same columns, trace kind."""
    return tag_kind(df.drop(KIND_COL) if KIND_COL in df.columns else df, KIND_TRACE)
