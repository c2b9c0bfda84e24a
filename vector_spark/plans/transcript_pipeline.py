"""The flagship end-to-end pipeline: parse -> enrich -> route -> aggregate
over the transcript table.

This mirrors the reference's flagship regression topology
(regression/cases/http_pipelines_blackhole/vector/vector.toml:19-80:
http source -> remap parse_json -> pipelines[grok parse + remap
enrich, datadog_search routing] -> blackhole), re-cast over
multi-turn conversation transcripts:

  transcripts(conv_id, turn_idx, role, text, tool, ts)
    -> [stable order]  turn_seq = row_number over (conv_id / turn_idx)
    -> [parse/remap]   template-classified text -> parsed map + typed
                       promotions; malformed rows -> dropped port with
                       remap's annotation shape (remap.rs:426-441)
    -> [enrich]        role normalization (CASE map), tool metadata
                       broadcast lookup join (enrichment table),
    -> [route]         non-exclusive conditions errors / tool_calls /
                       slow + _unmatched  (route.rs:32-51)
    -> [aggregate]     per-sink tumbling 10-minute counts by
                       (role_norm, tool_category)  (aggregate.rs:69-105)

Scale notes (designed for ~10^12 turns / 1000 executors):
- the parse+enrich projection is a single narrow stage (no shuffle);
  the only Python crossing is ONE Arrow-batched grok UDF.
- the broadcast join never shuffles the fact table.
- route fan-out evaluates all conditions in one pass over a cached
  parent (see operators/route.py) so the expensive parse runs once.
- stable ordering and per-sink aggregates shuffle by conv_id and by
  (window, role, category) respectively; with Iceberg partitioning
  days(ts), bucket(conv_id) the conv_id exchange is skew-salted by AQE
  (hot conversations exist by construction in the fixtures).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_spark.functions.grok import grok_extract_pandas
from vector_spark.functions.parse import parse_key_value
from vector_spark.operators.enrich import enrich_lookup
from vector_spark.operators.route import route
from vector_spark.sources.synth import tool_lookup_df

REQUEST_GROK = "%{WORD:method} %{NOTSPACE:path} status=%{INT:status} dur_ms=%{INT:dur_ms}"
JSON_SCHEMA = "level string, msg string, attempt string"
AGG_INTERVAL = "10 minutes"

def _empty_map():
    return F.expr("map()").cast("map<string,string>")


@dataclass
class PipelineOutputs:
    parsed: DataFrame  # ok port after parse+enrich
    dropped: DataFrame  # remap dropped port (original event + annotation)
    routes: dict[str, DataFrame]  # route name -> frame (incl _unmatched)
    aggregates: dict[str, DataFrame]  # route name -> windowed counts
    cached: DataFrame | None = None  # the single persisted parent

    def unpersist(self) -> None:
        if self.cached is not None:
            self.cached.unpersist()


def with_stable_order(df: DataFrame) -> DataFrame:
    """turn_seq: dense per-conversation sequence by turn_idx — the
    stable ordering the north rule requires for per-turn equality."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_seq", F.row_number().over(w))


def _template_flags(text):
    return (
        text.startswith("{"),
        text.rlike(r"^(GET|POST|PUT|DELETE) /"),
        text.startswith("action="),
    )


def parse_work(df: DataFrame, use_pandas_grok: bool = True) -> DataFrame:
    """Template-classified parse of `text` into TYPED columns plus a
    parse_ok flag — ALL rows kept. Every heavy expression is GATED per
    template (from_json only touches json rows, the Arrow grok UDF
    only sees request rows) and produces flat typed columns; this is
    the hot path that gets persisted, so no per-row map/object
    construction happens here (measured 4-5x cheaper than building
    map<string,string> eagerly — the event-map rendering is the lazy
    `with_parsed_map` projection instead, pruned by Catalyst when no
    consumer reads it)."""
    text = F.col("text")
    is_json, is_req, is_kv = _template_flags(text)

    if use_pandas_grok:
        s = grok_extract_pandas(F.when(is_req, text), REQUEST_GROK)
    else:
        from vector_spark.functions.grok import grok_extract_native

        s = grok_extract_native(F.when(is_req, text), REQUEST_GROK)

    js = F.when(is_json, F.from_json(text, JSON_SCHEMA))

    return (
        df.withColumn(
            "template",
            F.when(is_json, "json").when(is_req, "request").when(is_kv, "kv").otherwise("free"),
        )
        .withColumn("__g", s)
        .withColumn("__js", js)
        .withColumn("method", F.col("__g.method"))
        .withColumn("path", F.col("__g.path"))
        .withColumn("status", F.col("__g.status").try_cast("int"))
        .withColumn("dur_ms", F.col("__g.dur_ms").try_cast("int"))
        .withColumn(
            "tokens",
            F.when(is_kv, F.regexp_extract(text, r"tokens=([0-9]+)", 1)).try_cast("int"),
        )
        .withColumn(
            "level", F.col("__js.level")
        )
        .withColumn(
            "err_code",
            F.when(
                ~is_json & ~is_req & ~is_kv,
                F.nullif(F.regexp_extract(text, r"err_code=(E\d{3})", 1), F.lit("")),
            ),
        )
        .withColumn(
            "parse_ok",
            (~is_json | F.col("__js.level").isNotNull())
            & (~is_req | F.col("__g.method").isNotNull()),
        )
        .drop("__g", "__js")
    )


def with_parsed_map(df: DataFrame) -> DataFrame:
    """Lazy event-map rendering (the Vector LogEvent value tree): a
    `parsed` map<string,string> column derived from the typed parse
    columns + template. Only consumers that read `parsed` pay for map
    construction."""
    text = F.col("text")
    is_json, is_req, is_kv = _template_flags(text)
    req_map = F.when(
        F.col("method").isNotNull(),
        F.create_map(
            F.lit("method"), F.col("method"),
            F.lit("path"), F.col("path"),
            F.lit("status"), F.col("status").cast("string"),
            F.lit("dur_ms"), F.col("dur_ms").cast("string"),
        ),
    )
    js = F.from_json(text, JSON_SCHEMA)
    js_map = F.when(
        js["level"].isNotNull(),
        F.create_map(
            F.lit("level"), js["level"],
            F.lit("msg"), js["msg"],
            F.lit("attempt"), js["attempt"],
        ),
    )
    free_map = F.when(
        F.col("err_code").isNotNull(), F.create_map(F.lit("err_code"), F.col("err_code"))
    ).otherwise(_empty_map())
    parsed = (
        F.when(is_json, js_map)
        .when(is_req, req_map)
        .when(is_kv, parse_key_value(text))
        .otherwise(free_map)
    )
    return df.withColumn("parsed", F.when(F.col("parse_ok"), parsed))


def parse_stage(
    df: DataFrame, component_id: str = "parse", use_pandas_grok: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Split view over parse_work: (ok, dropped-with-annotation) —
    remap's two ports (remap.rs:426-482)."""
    input_cols = df.columns
    work = parse_work(df, use_pandas_grok=use_pandas_grok)
    failed = ~F.col("parse_ok")
    ok = with_parsed_map(work.filter(~failed))
    dropped = work.filter(failed).select(
        *input_cols,
        F.struct(
            F.lit("error").alias("reason"),
            F.concat(F.lit("parse failed for template "), F.col("template")).alias("message"),
            F.lit(component_id).alias("component_id"),
            F.lit("remap").alias("component_type"),
            F.lit("transform").alias("component_kind"),
        ).alias("metadata_dropped"),
    )
    return ok, dropped


def enrich_stage(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Role normalization (CASE map — VRL downcase+mapping) + broadcast
    tool-metadata lookup (enrichment table, Equals on `tool`)."""
    role_l = F.lower(F.col("role"))
    role_norm = F.when(
        role_l.isin("user", "assistant", "tool", "system"), role_l
    ).otherwise(F.lit("other"))
    enriched = df.withColumn("role_norm", role_norm)
    dim = tool_lookup_df(spark)
    return enrich_lookup(enriched, dim, on=["tool"], how="left", check_unique=False)


def route_stage(df: DataFrame, cache: bool = True) -> dict[str, DataFrame]:
    """FIXTURES.md F4 conditions — deliberately overlapping to exercise
    copy-to-all-matching-routes."""
    conditions = {
        "errors": F.col("err_code").isNotNull() | (F.col("status") >= 500),
        "tool_calls": F.col("role_norm") == "tool",
        "slow": F.col("dur_ms") > 1000,
    }
    return route(df, conditions, cache=cache)


def sink_aggregate(df: DataFrame) -> DataFrame:
    """Per-sink windowed counts (integer-valued on purpose — no float
    equality traps, FIXTURES.md F5)."""
    return (
        df.groupBy(
            F.window(F.col("ts"), AGG_INTERVAL).alias("w"),
            F.col("role_norm"),
            F.col("tool_category"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.coalesce(F.col("dur_ms"), F.lit(0))).alias("dur_ms_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("role_norm"),
            F.col("tool_category"),
            F.col("events"),
            F.col("dur_ms_sum"),
        )
    )


ROUTE_NAMES = ("errors", "tool_calls", "slow")


def route_conditions() -> dict[str, Column]:
    return {
        "errors": F.col("err_code").isNotNull() | (F.col("status") >= 500),
        "tool_calls": F.col("role_norm") == "tool",
        "slow": F.col("dur_ms") > 1000,
    }


def run_pipeline_fused(
    spark: SparkSession,
    transcripts: DataFrame,
    stable_order: bool = True,
    use_pandas_grok: bool = True,
    metrics=None,
) -> DataFrame:
    """Single-action end-to-end pipeline: the entire
    parse -> enrich -> route -> per-sink aggregate DAG as ONE job with
    no cache. Route fan-out (copy-to-every-matching-sink,
    route.rs:32-51) is an explode over the per-row array of matching
    sink names — Spark's one-pass multi-output idiom — and the
    per-sink aggregates are a single groupBy with `sink` as a key.

    Plan shape at scale: scan -> exchange(conv_id) -> window -> narrow
    parse/enrich/fan-out -> partial agg -> exchange(agg keys) -> final
    agg. Two shuffles total, parse runs exactly once, state is O(agg
    groups) not O(events). Pass a StageMetrics to also collect rows
    in/ok/dropped per stage from the same single action (observe() —
    the component_sent_events_total analogue).

    The aggregate deliberately consumes turn_seq (max_turn_seq per
    group): without a consumer Catalyst prunes the unused row_number
    window AND its conv_id exchange, and the benchmarked job would be
    one shuffle lighter than the plan this function claims to measure
    (verified via .explain("formatted")).

    Stage order: parse BEFORE the stable-order window. Parse is
    per-row (order-free), so the result is identical either way, but
    parsing first lets the plan drop the raw `text` column before the
    conv_id exchange — the window shuffle then moves compact typed
    columns instead of the full message bytes (~2x fewer shuffle
    bytes on the flagship mix)."""
    work = enrich_stage(
        parse_work(transcripts, use_pandas_grok=use_pandas_grok), spark
    )
    # raw text is dead after parse in the fused (aggregate-only) plan
    work = work.drop("text")
    if stable_order:
        work = with_stable_order(work)
    if metrics is not None:
        work = metrics.observe(
            work,
            "parse_enrich",
            ok=F.sum(F.col("parse_ok").cast("long")),
            dropped=F.sum((~F.col("parse_ok")).cast("long")),
        )
    ok = work.filter(F.col("parse_ok"))
    conds = {n: F.coalesce(c, F.lit(False)) for n, c in route_conditions().items()}
    none_match = ~F.greatest(*conds.values())
    sinks = F.array_compact(
        F.array(
            *[F.when(c, F.lit(n)) for n, c in conds.items()],
            F.when(none_match, F.lit("_unmatched")),
        )
    )
    fanned = ok.withColumn("sink", F.explode(sinks))
    if metrics is not None:
        fanned = metrics.observe(fanned, "routed")
    return (
        fanned.groupBy(
            F.col("sink"),
            F.window(F.col("ts"), AGG_INTERVAL).alias("w"),
            F.col("role_norm"),
            F.col("tool_category"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.coalesce(F.col("dur_ms"), F.lit(0))).alias("dur_ms_sum"),
            *(
                [F.max("turn_seq").alias("max_turn_seq")]
                if stable_order
                else []
            ),
        )
        .select(
            "sink",
            F.col("w.start").alias("window_start"),
            "role_norm",
            "tool_category",
            "events",
            "dur_ms_sum",
            *(["max_turn_seq"] if stable_order else []),
        )
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    stable_order: bool = True,
    cache_routes: bool = True,
    use_pandas_grok: bool = True,
) -> PipelineOutputs:
    """Single-materialization plan: stable-order -> parse -> enrich ->
    route flags are all narrow projections over ONE exchange (the
    conv_id window shuffle); the flagged frame persists once and every
    output port (ok, dropped, 4 routes, 4 aggregates) is a cheap
    filter/groupBy over the cache. This is the Fanout-over-one-buffer
    shape — the parse (the expensive Arrow UDF) runs exactly once per
    pipeline run regardless of sink count."""
    df = with_stable_order(transcripts) if stable_order else transcripts
    input_cols = df.columns
    work = parse_work(df, use_pandas_grok=use_pandas_grok)
    work = enrich_stage(work, spark)
    conditions = {
        "errors": F.col("err_code").isNotNull() | (F.col("status") >= 500),
        "tool_calls": F.col("role_norm") == "tool",
        "slow": F.col("dur_ms") > 1000,
    }
    flag_cols = {
        f"__route_{name}": F.coalesce(c, F.lit(False)) for name, c in conditions.items()
    }
    flagged = work.withColumns(flag_cols)
    if cache_routes:
        flagged = flagged.persist()
    # the event-map rendering is lazy: route consumers that never read
    # `parsed` don't pay for map construction (Catalyst prunes it)
    ok = with_parsed_map(flagged.filter(F.col("parse_ok")))
    dropped = flagged.filter(~F.col("parse_ok")).select(
        *input_cols,
        F.struct(
            F.lit("error").alias("reason"),
            F.concat(F.lit("parse failed for template "), F.col("template")).alias("message"),
            F.lit("parse").alias("component_id"),
            F.lit("remap").alias("component_type"),
            F.lit("transform").alias("component_kind"),
        ).alias("metadata_dropped"),
    )
    out_cols = [c for c in flagged.columns if not c.startswith("__route_")] + ["parsed"]
    routes = {
        name: ok.filter(F.col(f"__route_{name}")).select(*out_cols) for name in conditions
    }
    none_match = ~F.greatest(*[F.col(f) for f in flag_cols])
    routes["_unmatched"] = ok.filter(none_match).select(*out_cols)
    aggregates = {name: sink_aggregate(rdf) for name, rdf in routes.items()}
    return PipelineOutputs(
        parsed=ok.select(*out_cols),
        dropped=dropped,
        routes=routes,
        aggregates=aggregates,
        cached=flagged if cache_routes else None,
    )
