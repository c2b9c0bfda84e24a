"""Declarative pipeline spec -> DataFrame DAG compiler.

The reference's unit of deployment is a TOML/YAML config naming
sources -> transforms (each with `inputs`) -> sinks, with named output
ports and fan-in/fan-out wiring (src/config/, compile at
src/config/compiler.rs:25-60, graph checks src/config/graph.rs:188-263).
This module is the Spark analogue: a Python dict spec compiles to a
dict of DataFrames, one per component output port.

- component ref: "name" (default port) or "name.port" (named port,
  e.g. a route's routes or remap's "dropped")
- multiple inputs union by name (Vector: multiple inputs into one
  component concatenate streams)
- cycles and unknown inputs are rejected at compile time (the
  graph-typecheck analogue — schema mismatches surface as Spark
  analysis errors at composition)

Also provides the `vector test` analogue (src/config/unit_test/):
build the DAG with synthetic frames injected at any component and
extract any port for assertions.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.operators.aggregate import tumbling_agg
from vector_spark.operators.cardinality import tag_cardinality_limit
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.enrich import enrich_lookup
from vector_spark.operators.filter import filter_events
from vector_spark.operators.line_agg import line_agg
from vector_spark.operators.reduce import reduce_groups, reduce_sessions
from vector_spark.operators.remap import remap
from vector_spark.operators.route import route
from vector_spark.operators.sample import sample
from vector_spark.operators.throttle import throttle


def _cond(c, df: DataFrame | None = None) -> Column:
    """Conditions may be Columns, SQL strings, 'dd:'-prefixed Datadog
    search query strings, 'vrl:'-prefixed VRL boolean expressions, or
    the reference's TOML condition-table shape
    ``{type = "vrl"|"datadog_search", source = "..."}``
    (src/conditions/mod.rs:22-47 — the full condition enum; the
    is_log/is_metric/is_trace type tests are operators/event_kind.py
    predicates). The DataFrame, when in scope, gives the dd and vrl
    compilers schema-aware field resolution."""
    if isinstance(c, Mapping):
        kind, source = c.get("type"), c.get("source", "")
        if kind == "vrl":
            from vector_spark.conditions import vrl_cond

            return vrl_cond(source, df)
        if kind == "datadog_search":
            from vector_spark.conditions import dd_query

            return dd_query(source, df)
        raise ValueError(f"unknown condition type {kind!r}")
    if isinstance(c, str):
        if c.startswith("dd:"):
            from vector_spark.conditions import dd_query

            return dd_query(c[3:].strip(), df)
        if c.startswith("vrl:"):
            from vector_spark.conditions import vrl_cond

            return vrl_cond(c[4:].strip(), df)
        return F.expr(c)
    return c


def _exprs(d: Mapping) -> dict[str, Column]:
    return {k: (F.expr(v) if isinstance(v, str) else v) for k, v in d.items()}


class Pipeline:
    """Compile once, run by reading ports."""

    def __init__(self, spec: Mapping, spark: SparkSession | None = None):
        self.spec = spec
        self.spark = spark

    @classmethod
    def from_toml(
        cls, source: str, spark: SparkSession | None = None
    ) -> "Pipeline":
        """Load a spec from TOML — the reference's config surface
        (vector.toml: [sources.X] / [transforms.Y] type/inputs
        sections, e.g. regression/cases/*/vector/vector.toml). The
        TOML table shape IS this compiler's spec shape; condition
        strings may be SQL or 'dd:' search queries. `source` is a
        path, or the TOML text itself when it contains a newline."""
        import tomllib

        if "\n" in source:
            spec = tomllib.loads(source)
        else:
            with open(source, "rb") as f:
                spec = tomllib.load(f)
        return cls(spec, spark)

    def compile(
        self, inputs: Mapping[str, DataFrame] | None = None
    ) -> dict[str, DataFrame]:
        """Returns {port_ref: DataFrame}. `inputs` injects frames at
        source names (and, for testing, may override any component —
        the insert_at mechanism of the reference's unit tests)."""
        inputs = dict(inputs or {})
        ports: dict[str, DataFrame] = {}

        for name, src in self.spec.get("sources", {}).items():
            if name in inputs:
                ports[name] = inputs[name]
            elif src.get("type") == "parquet":
                ports[name] = self.spark.read.parquet(src["path"])
            elif src.get("type") == "table":
                ports[name] = self.spark.table(src["table"])
            else:
                raise ValueError(f"source {name}: unknown type or missing injection")

        transforms = self.spec.get("transforms", {})
        remaining = dict(transforms)
        # fixpoint resolve-and-apply: a transform runs once all its
        # input PORTS exist (named ports like "router.errors" only
        # appear after their producer applies); no progress -> cycle
        # or unknown input (graph.rs:213 analogue)
        while remaining:
            progressed = False
            for name, t in list(remaining.items()):
                if name in inputs:  # insert_at override
                    ports[name] = inputs[name]
                    del remaining[name]
                    progressed = True
                    continue
                deps = t.get("inputs", [])
                if all(d in ports for d in deps):
                    df = ports[deps[0]]
                    for extra in deps[1:]:
                        df = df.unionByName(ports[extra])
                    self._apply(name, t, df, ports)
                    del remaining[name]
                    progressed = True
            if not progressed:
                raise ValueError(
                    f"cycle or unknown input among transforms: {sorted(remaining)}"
                )
        return ports

    def _apply(self, name: str, t: Mapping, df: DataFrame, ports: dict) -> None:
        kind = t["type"]
        if kind == "filter":
            ports[name] = filter_events(df, _cond(t["condition"], df))
        elif kind == "remap":
            if "source" in t:
                # vector.yaml's native authoring surface: remap with VRL
                # SOURCE text (transforms/remap.rs `source` option),
                # compiled to Columns by functions/vrl_codegen.py
                from vector_spark.operators.remap import remap_source

                ok, dropped = remap_source(
                    df,
                    t["source"],
                    drop_on_abort=t.get("drop_on_abort", True),
                    reroute_dropped=t.get("reroute_dropped", True),
                    component_id=name,
                    json_schemas=t.get("json_schemas"),
                )
            else:
                ok, dropped = remap(
                    df,
                    _exprs(t.get("exprs", {})),
                    error_when=_cond(t["error_when"]) if "error_when" in t else None,
                    error_message=t.get("error_message"),
                    drop_on_error=t.get("drop_on_error", True),
                    reroute_dropped=t.get("reroute_dropped", True),
                    component_id=name,
                )
            ports[name] = ok
            ports[f"{name}.dropped"] = dropped
        elif kind == "route":
            conds = {k: _cond(v, df) for k, v in t["conditions"].items()}
            for port, rdf in route(df, conds, cache=t.get("cache", True)).items():
                ports[f"{name}.{port}"] = rdf
        elif kind == "sample":
            ports[name] = sample(
                df,
                rate=t["rate"],
                key=_cond(t["key"]) if "key" in t else None,
                order_by=[_cond(c) for c in t.get("order_by", [])] or None,
                exclude=_cond(t["exclude"]) if "exclude" in t else None,
            )
        elif kind == "dedupe":
            ports[name] = dedupe(
                df,
                match=t.get("match"),
                ignore=t.get("ignore"),
                order_by=[_cond(c) for c in t.get("order_by", [])] or None,
            )
        elif kind == "reduce":
            merge = {k: tuple(v) for k, v in t["merge"].items()}
            if "ends_when" in t or "starts_when" in t:
                ports[name] = reduce_sessions(
                    df,
                    group_by=t["group_by"],
                    order_by=[_cond(c) for c in t["order_by"]],
                    merge=merge,
                    ends_when=_cond(t["ends_when"]) if "ends_when" in t else None,
                    starts_when=_cond(t["starts_when"]) if "starts_when" in t else None,
                    session_field=t.get("session_field"),
                )
            else:
                ports[name] = reduce_groups(
                    df,
                    group_by=t["group_by"],
                    merge=merge,
                    order_by=_cond(t["order_by"]),
                )
        elif kind == "aggregate":
            ports[name] = tumbling_agg(
                df,
                ts_col=t.get("ts_col", "ts"),
                interval=t["interval"],
                keys=t.get("keys", []),
                aggs=_exprs(t["aggs"]),
            )
        elif kind == "throttle":
            ports[name] = throttle(
                df,
                threshold=t["threshold"],
                window_secs=t["window_secs"],
                key=_cond(t["key"]) if "key" in t else None,
                ts_col=t.get("ts_col", "ts"),
                order_by=[_cond(c) for c in t.get("order_by", [])] or None,
                exclude=_cond(t["exclude"]) if "exclude" in t else None,
            )
        elif kind == "enrich":
            ports[name] = enrich_lookup(
                df,
                dim=t["dim"],
                on=t["on"],
                how=t.get("how", "left"),
                case_insensitive=t.get("case_insensitive", False),
            )
        elif kind == "line_agg":
            ports[name] = line_agg(
                df,
                stream_cols=t["stream_cols"],
                order_by=[_cond(c) for c in t["order_by"]],
                line_col=t["line_col"],
                is_boundary=_cond(t["is_boundary"]),
                sep=t.get("sep", "\n"),
                out_col=t.get("out_col", "message"),
            )
        elif kind == "log_to_metric":
            from vector_spark.operators.log_to_metric import MetricSpec, log_to_metric

            specs = [
                MetricSpec(
                    mtype=m["mtype"],
                    name=m["name"],
                    namespace=m.get("namespace", "vector"),
                    tags={k: _cond(v) for k, v in m.get("tags", {}).items()},
                    value=_cond(m["value"]) if "value" in m else None,
                    kind=m.get("kind", "incremental"),
                    only_when=_cond(m["only_when"]) if "only_when" in m else None,
                )
                for m in t["metrics"]
            ]
            ports[name] = log_to_metric(df, specs, ts_col=t.get("ts_col", "ts"))
        elif kind == "metric_to_log":
            from vector_spark.operators.log_to_metric import metric_to_log

            ports[name] = metric_to_log(df)
        elif kind == "parse_groks":
            # the reference remap's parse_groks(value, patterns,
            # aliases) call shape (vector.toml:44-74 of the flagship
            # config) as a declarative transform: Datadog semantics
            # (patterns are regex with %{} insertions) by default
            from vector_spark.functions.grok import parse_groks_pandas

            ports[name] = df.withColumn(
                t.get("out_col", "parsed"),
                parse_groks_pandas(
                    F.col(t["source_col"]),
                    list(t["patterns"]),
                    aliases=dict(t.get("aliases", {})) or None,
                    literal_text=t.get("literal_text", False),
                ),
            )
        elif kind == "pipelines":
            # macro transform (src/transforms/pipelines/mod.rs:1-106):
            # a type router splits events by kind; per kind, named
            # sub-pipelines CHAIN — a sub-pipeline with a filter
            # transforms only matching events while the rest bypass
            # to the next stage (filter._dropped wiring in the
            # reference's expansion); kinds with no pipeline list pass
            # through untouched (type_router._dropped). Sub-transforms
            # register their own ports as {name}_{etype}_{i}_t{j}.
            kind_col = t.get("kind_col", "kind")
            outs = []
            routed_kinds = []
            for etype, kname in (
                ("logs", "log"),
                ("metrics", "metric"),
                ("traces", "trace"),
            ):
                pipes = t.get(etype, [])
                if not pipes:
                    continue
                routed_kinds.append(kname)
                cur = df.filter(F.col(kind_col) == kname)
                for i, p in enumerate(pipes):
                    if "filter" in p:
                        c = F.coalesce(_cond(p["filter"], cur), F.lit(False))
                        matched, bypass = cur.filter(c), cur.filter(~c)
                    else:
                        matched, bypass = cur, None
                    sub = matched
                    for j, sub_t in enumerate(p.get("transforms", [])):
                        subname = f"{name}_{etype}_{i}_t{j}"
                        self._apply(subname, sub_t, sub, ports)
                        sub = ports[subname]
                    cur = (
                        sub
                        if bypass is None
                        else sub.unionByName(bypass, allowMissingColumns=True)
                    )
                outs.append(cur)
            if routed_kinds:
                # coalesce: a NULL kind is "unrouted" and passes
                # through — isin(NULL) is NULL and a bare ~NULL filter
                # would silently drop the event
                outs.append(
                    df.filter(
                        ~F.coalesce(
                            F.col(kind_col).isin(routed_kinds), F.lit(False)
                        )
                    )
                )
            if not outs:  # no pipeline lists at all: pure pass-through
                ports[name] = df
                return
            out = outs[0]
            for o in outs[1:]:
                out = out.unionByName(o, allowMissingColumns=True)
            ports[name] = out
        elif kind == "cardinality_limit":
            ports[name] = tag_cardinality_limit(
                df,
                tag_col=t["tag_col"],
                limit=t.get("limit", 500),
                order_by=_cond(t["order_by"]),
                action=t.get("action", "drop_tag"),
            )
        else:
            raise ValueError(f"transform {name}: unknown type {kind!r}")


def run_unit_test(
    spec: Mapping,
    inputs: Mapping[str, DataFrame],
    extract: list[str],
    spark: SparkSession | None = None,
) -> dict[str, DataFrame]:
    """The `vector test` analogue: inject frames at named components,
    return the extracted ports for assertions."""
    ports = Pipeline(spec, spark).compile(inputs=inputs)
    missing = [p for p in extract if p not in ports]
    if missing:
        raise ValueError(f"extract_from unknown ports: {missing}")
    return {p: ports[p] for p in extract}
