"""log_to_metric / metric_to_log — shape converters.

Parity: src/transforms/log_to_metric.rs:28-108 (derive
counter/gauge/set metric events from log fields, templated
name/namespace/tags, `increment_by_value`) and
src/transforms/metric_to_log.rs:26-80 (serialize a metric event to a
structured log).

Metric event schema used across this engine (a flat Spark rendering of
lib/vector-core/src/event/metric: MetricSeries + MetricData):
  name:string, namespace:string, tags:map<string,string>,
  kind:string ('incremental'|'absolute'),
  mtype:string ('counter'|'gauge'|'set'|'histogram'|'summary'),
  value:double, ts:timestamp
  samples:array<struct<value:double,rate:bigint>>  (histogram/summary
    specs: a single-sample Distribution per event,
    log_to_metric.rs:287-327; merge in operators.metric_value)
  set_values:array<string>  (set specs: singleton value set,
    log_to_metric.rs:329-340)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class MetricSpec:
    """One derived metric (one entry of log_to_metric's `metrics` list).

    mtype 'histogram'/'summary' emit a single-sample Distribution with
    that statistic kind (log_to_metric.rs:287-327); 'set' emits a
    singleton value set (:329-340)."""

    mtype: str  # counter | gauge | set | histogram | summary
    name: str | Column
    namespace: str | Column = "vector"
    tags: dict[str, Column] = field(default_factory=dict)
    value: Column | None = None  # None => count 1.0 (counter)
    kind: str = "incremental"
    only_when: Column | None = None


def log_to_metric(df: DataFrame, specs: list[MetricSpec], ts_col: str = "ts") -> DataFrame:
    """Each spec projects the log frame into the metric schema; multiple
    specs union (the reference emits one metric per config entry per
    event)."""
    outs = []
    for s in specs:
        name_c = F.lit(s.name) if isinstance(s.name, str) else s.name
        ns_c = F.lit(s.namespace) if isinstance(s.namespace, str) else s.namespace
        tag_items = []
        for k, v in s.tags.items():
            tag_items.extend([F.lit(k), v.cast("string")])
        tags_c = F.map_from_arrays(
            F.array(*tag_items[0::2]), F.array(*tag_items[1::2])
        ) if tag_items else F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
        val_c = (s.value if s.value is not None else F.lit(1.0)).cast("double")
        proj = df
        if s.only_when is not None:
            # bare 3-valued predicate: NULL drops the row like false,
            # and stays pushdown-eligible (cf. operators/filter.py)
            proj = proj.filter(s.only_when)
        null_samples = F.lit(None).cast(
            "array<struct<value:double,rate:bigint>>"
        )
        null_set = F.lit(None).cast("array<string>")
        if s.mtype in ("histogram", "summary"):
            samples_c = F.array(
                F.struct(val_c.alias("value"), F.lit(1).cast("bigint").alias("rate"))
            )
            set_c = null_set
        elif s.mtype == "set":
            samples_c = null_samples
            set_c = F.array(val_c.cast("string"))
        else:
            samples_c, set_c = null_samples, null_set
        outs.append(
            proj.select(
                name_c.alias("name"),
                ns_c.alias("namespace"),
                tags_c.alias("tags"),
                F.lit(s.kind).alias("kind"),
                F.lit(s.mtype).alias("mtype"),
                val_c.alias("value"),
                samples_c.alias("samples"),
                set_c.alias("set_values"),
                F.col(ts_col).alias("ts"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def metric_to_log(df: DataFrame) -> DataFrame:
    """Metric frame -> structured log line (JSON in `message`), keeping
    ts as the log timestamp."""
    payload = F.to_json(
        F.struct(
            F.col("name"),
            F.col("namespace"),
            F.col("tags"),
            F.col("kind"),
            F.col("mtype"),
            F.col("value"),
        )
    )
    return df.select(payload.alias("message"), F.col("ts"))
