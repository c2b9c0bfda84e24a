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

from pyspark.sql import DataFrame, SparkSession, Window
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


def with_stable_order(df: DataFrame) -> DataFrame:
    """turn_seq: dense per-conversation sequence by turn_idx — the
    stable ordering the north rule requires for per-turn equality."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_seq", F.row_number().over(w))


def parse_stage(
    df: DataFrame, component_id: str = "parse", use_pandas_grok: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Template-classified parse of `text` into parsed:map<string,string>
    plus typed promotions. Returns (ok, dropped)."""
    text = F.col("text")
    is_json = text.startswith("{")
    is_req = text.rlike(r"^(GET|POST|PUT|DELETE) /")
    is_kv = text.startswith("action=")

    if use_pandas_grok:
        req_map = grok_extract_pandas(F.when(is_req, text), REQUEST_GROK)
    else:
        from vector_spark.functions.grok import grok_extract_native

        s = grok_extract_native(text, REQUEST_GROK)
        req_map = F.when(
            s["method"].isNotNull(),
            F.create_map(
                F.lit("method"), s["method"],
                F.lit("path"), s["path"],
                F.lit("status"), s["status"],
                F.lit("dur_ms"), s["dur_ms"],
            ),
        )

    kv_map = parse_key_value(text)
    js = F.from_json(text, JSON_SCHEMA)
    js_map = F.when(
        js.isNotNull() & js["level"].isNotNull(),
        F.create_map(
            F.lit("level"), js["level"],
            F.lit("msg"), js["msg"],
            F.lit("attempt"), js["attempt"],
        ),
    )
    err_code = F.regexp_extract(text, r"err_code=(E\d{3})", 1)
    free_map = F.when(err_code != "", F.create_map(F.lit("err_code"), err_code)).otherwise(
        _empty_map()
    )

    parsed = (
        F.when(is_json, js_map)
        .when(is_req, req_map)
        .when(is_kv, kv_map)
        .otherwise(free_map)
    )

    input_cols = df.columns
    work = df.withColumn("parsed", parsed).withColumn(
        "template",
        F.when(is_json, "json").when(is_req, "request").when(is_kv, "kv").otherwise("free"),
    )
    failed = F.col("parsed").isNull()
    ok = (
        work.filter(~failed)
        .withColumn("status", F.try_element_at(F.col("parsed"), F.lit("status")).cast("int"))
        .withColumn("dur_ms", F.try_element_at(F.col("parsed"), F.lit("dur_ms")).cast("int"))
        .withColumn("tokens", F.try_element_at(F.col("parsed"), F.lit("tokens")).cast("int"))
        .withColumn("err_code", F.try_element_at(F.col("parsed"), F.lit("err_code")))
    )
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


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    stable_order: bool = True,
    cache_routes: bool = True,
    use_pandas_grok: bool = True,
) -> PipelineOutputs:
    df = with_stable_order(transcripts) if stable_order else transcripts
    ok, dropped = parse_stage(df, use_pandas_grok=use_pandas_grok)
    enriched = enrich_stage(ok, spark)
    routes = route_stage(enriched, cache=cache_routes)
    aggregates = {name: sink_aggregate(rdf) for name, rdf in routes.items()}
    return PipelineOutputs(parsed=enriched, dropped=dropped, routes=routes, aggregates=aggregates)
