"""Spec-compiler + unit-test-harness tests (the `vector test`
analogue: inject at a component, extract ports, assert conditions —
cf. tests/behavior/transforms/route.toml in the reference)."""

import pytest
from pyspark.sql import functions as F

from vector_spark.plans.pipeline import Pipeline, run_unit_test


@pytest.fixture()
def events_df(spark):
    rows = [
        (1, "a", "error", 200.0),
        (2, "a", "click", 10.0),
        (3, "b", "error", 50.0),
        (4, "b", "signup", 80.0),
        (5, "a", "click", 300.0),
    ]
    return spark.createDataFrame(rows, "event_id long, user string, event_type string, value double")


SPEC = {
    "sources": {"in": {"type": "injected"}},
    "transforms": {
        "flag": {
            "type": "remap",
            "inputs": ["in"],
            "exprs": {"is_big": "value > 100"},
        },
        "router": {
            "type": "route",
            "inputs": ["flag"],
            "conditions": {"errors": "event_type = 'error'", "big": "is_big"},
        },
        "errors_only": {"type": "filter", "inputs": ["router.errors"], "condition": "value > 100"},
    },
}


def test_compile_and_ports(spark, events_df):
    ports = Pipeline(SPEC, spark).compile(inputs={"in": events_df})
    assert set(ports) >= {"in", "flag", "flag.dropped", "router.errors", "router.big", "router._unmatched", "errors_only"}
    assert ports["router.errors"].count() == 2
    assert ports["router.big"].count() == 2
    # copy-to-all-matches: event 1 is in both errors and big
    both = set(r.event_id for r in ports["router.errors"].select("event_id").collect()) & set(
        r.event_id for r in ports["router.big"].select("event_id").collect()
    )
    assert both == {1}
    assert ports["router._unmatched"].count() == 2  # events 2, 4
    assert ports["errors_only"].count() == 1


def test_unit_test_harness_injection(spark, events_df):
    # inject a synthetic frame directly at the router (insert_at)
    synthetic = events_df.withColumn("is_big", F.lit(True))
    out = run_unit_test(
        SPEC,
        inputs={"in": events_df, "flag": synthetic},
        extract=["router.big"],
        spark=spark,
    )
    assert out["router.big"].count() == 5  # all big now


def test_cycle_rejected(spark, events_df):
    bad = {
        "sources": {"in": {"type": "injected"}},
        "transforms": {
            "a": {"type": "filter", "inputs": ["b"], "condition": "true"},
            "b": {"type": "filter", "inputs": ["a"], "condition": "true"},
        },
    }
    with pytest.raises(ValueError, match="cycle or unknown"):
        Pipeline(bad, spark).compile(inputs={"in": events_df})


def test_multi_input_union(spark, events_df):
    spec = {
        "sources": {"x": {"type": "injected"}, "y": {"type": "injected"}},
        "transforms": {
            "all": {"type": "filter", "inputs": ["x", "y"], "condition": "true"},
        },
    }
    ports = Pipeline(spec, spark).compile(inputs={"x": events_df, "y": events_df})
    assert ports["all"].count() == 10


def test_spec_log_to_metric_roundtrip(spark):
    """Spec DAG: events -> log_to_metric -> metric_to_log; the macro
    system covers the metric shape converters too."""
    from vector_spark.plans.pipeline import Pipeline

    ev = spark.createDataFrame(
        [(1, "click", 2.0, "2024-01-01 00:00:00")],
        "event_id int, event_type string, value double, ts_s string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts_s"))
    spec = {
        "sources": {"events": {"type": "inject"}},
        "transforms": {
            "metrics": {
                "type": "log_to_metric",
                "inputs": ["events"],
                "metrics": [
                    {
                        "mtype": "counter",
                        "name": "events_total",
                        "tags": {"event_type": "event_type"},
                    }
                ],
            },
            "logs": {"type": "metric_to_log", "inputs": ["metrics"]},
        },
    }
    ports = Pipeline(spec, spark).compile(inputs={"events": ev})
    row = ports["logs"].collect()[0]
    assert '"name":"events_total"' in row.message
    assert '"event_type":"click"' in row.message


def test_dd_condition_in_spec(spark, events_df):
    """'dd:' conditions compile through the Datadog search DSL."""
    from vector_spark.plans.pipeline import Pipeline

    spec = {
        "sources": {"ev": {"type": "injected"}},
        "transforms": {
            "errs": {
                "type": "filter",
                "inputs": ["ev"],
                "condition": "dd:event_type:error AND value:>=0",
            },
        },
    }
    ports = Pipeline(spec, spark).compile({"ev": events_df})
    got = ports["errs"].count()
    want = events_df.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 0)
    ).count()
    assert got == want > 0


def test_vrl_condition_in_spec(spark, events_df):
    """VRL boolean-expression conditions (src/conditions/vrl.rs):
    both the 'vrl:' string prefix and the reference's TOML
    condition-table shape {type="vrl", source=...}; runtime errors
    evaluate to false instead of failing the pipeline."""
    from vector_spark.plans.pipeline import Pipeline

    spec = {
        "sources": {"ev": {"type": "injected"}},
        "transforms": {
            "errs": {
                "type": "filter",
                "inputs": ["ev"],
                "condition": 'vrl: .event_type == "error" && .value >= 0',
            },
            "tbl": {
                "type": "filter",
                "inputs": ["ev"],
                "condition": {
                    "type": "vrl",
                    "source": '.event_type == "error" && .value >= 0',
                },
            },
        },
    }
    ports = Pipeline(spec, spark).compile({"ev": events_df})
    want = events_df.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 0)
    ).count()
    assert ports["errs"].count() == want > 0
    assert ports["tbl"].count() == want


def test_vrl_condition_semantics(spark, events_df):
    """vrl_cond contract: read-only enforcement (set_read_only),
    error->false, non-boolean result -> false."""
    import pytest

    from vector_spark.conditions import vrl_cond
    from vector_spark.functions.vrl_codegen import VrlCompileError

    n = events_df.count()
    # runtime error -> false (reference: VrlConditionExecutionError)
    assert events_df.filter(
        vrl_cond('(to_int(.event_type) ?? -1) > 0', events_df)
    ).count() == 0
    # missing path -> null -> false, never a crash
    assert events_df.filter(
        vrl_cond('.no_such_field == "x"', events_df)
    ).count() == 0
    # statically non-boolean result -> constant false
    assert events_df.filter(vrl_cond('.value + 1', events_df)).count() == 0
    # negated form still true somewhere (sanity the compiler is live)
    assert 0 < events_df.filter(
        vrl_cond('.event_type != "error"', events_df)
    ).count() < n
    # mutation is a compile error
    with pytest.raises(VrlCompileError):
        vrl_cond('.x = 1\ntrue', events_df)
    with pytest.raises(VrlCompileError):
        vrl_cond('del(.event_type) != null', events_df)
    with pytest.raises(VrlCompileError):
        vrl_cond('%m = 1\ntrue', events_df)
    with pytest.raises(VrlCompileError):
        vrl_cond('abort', events_df)


def test_from_toml(spark, events_df):
    """TOML configs (the reference's vector.toml surface) compile to
    the same DAG as dict specs."""
    toml_text = '''
[sources.ev]
type = "injected"

[transforms.flag]
type = "remap"
inputs = ["ev"]
exprs.is_big = "value > 100"

[transforms.router]
type = "route"
inputs = ["flag"]
conditions.errors = "dd:event_type:error"
conditions.big = "is_big"

[transforms.big_errors]
type = "filter"
inputs = ["router.errors"]
condition = "value > 100"
'''
    ports = Pipeline.from_toml(toml_text, spark).compile({"ev": events_df})
    assert ports["router.errors"].count() == 2
    assert ports["big_errors"].count() == 1
    assert ports["router._unmatched"].count() > 0


def test_toml_parse_groks_flagship_shape(spark):
    """The reference flagship config's nginx chain
    (regression/cases/http_pipelines_blackhole/vector/vector.toml:
    filter by datadog-search 'source:nginx' -> remap parse_groks with
    a user-defined alias map) expressed on THIS compiler's TOML
    surface end-to-end."""
    from vector_spark.plans.pipeline import Pipeline

    toml_text = r'''
[sources.logs]
type = "injected"

[transforms.nginx]
type = "filter"
inputs = ["logs"]
condition = "dd:source:nginx"

[transforms.parsed]
type = "parse_groks"
inputs = ["nginx"]
source_col = "message"
out_col = "custom"
patterns = ['(?s)%{access.common}']

[transforms.parsed.aliases]
"access.common" = '%{_client_ip} %{_ident} %{_auth} \[%{_date_access}\] "(?>%{_method} |)%{_url}(?> %{_version}|)" %{_status_code} (?>%{_bytes_written}|-)'
_auth = '%{notSpace:http.auth:nullIf("-")}'
_bytes_written = '%{integer:network.bytes_written}'
_client_ip = '%{ipOrHost:network.client.ip}'
_version = 'HTTP\/%{regex("\d+\.\d+"):http.version}'
_url = '%{notSpace:http.url}'
_ident = '%{notSpace:http.ident:nullIf("-")}'
_status_code = '%{integer:http.status_code}'
_method = '%{word:http.method}'
_date_access = '%{date("dd/MMM/yyyy:HH:mm:ss Z"):date_access}'
'''
    df = spark.createDataFrame(
        [
            ("nginx", '10.2.3.4 - frank [10/Oct/2023:13:55:36 -0700] "GET /i.html HTTP/1.1" 200 2326'),
            ("apache", "should be filtered out"),
        ],
        "source string, message string",
    )
    ports = Pipeline.from_toml(toml_text, spark).compile(inputs={"logs": df})
    rows = ports["parsed"].select("custom.*").collect()
    assert len(rows) == 1
    assert rows[0]["network.client.ip"] == "10.2.3.4"
    assert rows[0]["http.status_code"] == "200"
    assert rows[0]["http.url"] == "/i.html"


def test_toml_syslog_log2metric_regression_shape(spark):
    """regression/cases/syslog_regex_logs2metric_ddmetrics/vector/
    vector.toml replayed on this compiler's TOML surface: syslog frame
    -> remap parse_regex of .host into hostname/tld -> log_to_metric
    gauge of procid tagged by hostname/facility/severity."""
    import datetime

    from vector_spark.plans.pipeline import Pipeline

    toml_text = r'''
[sources.syslog]
type = "injected"

[transforms.remap]
type = "remap"
inputs = ["syslog"]
exprs.hostname = "regexp_extract(host, '^([a-z]+)\\.([a-z]+)', 1)"
exprs.tld = "regexp_extract(host, '^([a-z]+)\\.([a-z]+)', 2)"

[transforms.log2metric]
type = "log_to_metric"
inputs = ["remap"]

[[transforms.log2metric.metrics]]
mtype = "gauge"
name = "procid"
value = "procid"
kind = "absolute"
tags.hostname = "hostname"
tags.facility = "facility"
tags.severity = "severity"
'''
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            ("alpha.com", 101.0, "auth", "info", t0),
            ("beta.org", 202.0, "daemon", "err", t0),
        ],
        "host string, procid double, facility string, severity string, ts timestamp",
    )
    ports = Pipeline.from_toml(toml_text, spark).compile({"syslog": df})
    rows = {r.tags["hostname"]: r for r in ports["log2metric"].collect()}
    assert set(rows) == {"alpha", "beta"}
    a = rows["alpha"]
    assert a.name == "procid" and a.value == 101.0
    assert a.tags["facility"] == "auth" and a.tags["severity"] == "info"
    assert rows["beta"].tags["severity"] == "err"


def test_toml_splunk_route_s3_regression_shape(spark, tmp_path):
    """regression/cases/splunk_hec_route_s3/vector/vector.toml
    replayed: route on attrs.c2cContainerType == 'service' vs sidecar,
    each port landing in its own key-template partitioned sink
    (key_prefix service/{{attrs.c2cService}}/... -> partitionBy
    columns)."""
    from vector_spark.plans.pipeline import Pipeline
    from vector_spark.sinks import write_partitioned

    toml_text = r'''
[sources.splunk]
type = "injected"

[transforms.container_type]
type = "route"
inputs = ["splunk"]
conditions.service = "attrs.c2cContainerType = 'service'"
conditions.sidecar = "attrs.c2cContainerType != 'service'"
'''
    df = spark.createDataFrame(
        [
            (("service", "api"), "m1"),
            (("sidecar", "api"), "m2"),
            (("sidecar", "worker"), "m3"),
        ],
        "attrs struct<c2cContainerType:string,c2cService:string>, message string",
    )
    ports = Pipeline.from_toml(toml_text, spark).compile({"splunk": df})
    assert ports["container_type.service"].count() == 1
    assert ports["container_type.sidecar"].count() == 2
    assert ports["container_type._unmatched"].count() == 0

    # the reference's key_prefix .../service/{{attrs.c2cService}}/...
    # renders as a partition column per template field
    from pyspark.sql import functions as F

    sidecar = ports["container_type.sidecar"].withColumn(
        "service", F.col("attrs.c2cService")
    )
    out = str(tmp_path / "s3_sidecar")
    write_partitioned(sidecar, out, partition_cols=["service"])
    dirs = sorted(
        p.name for p in (tmp_path / "s3_sidecar").iterdir() if p.is_dir()
    )
    assert dirs == ["service=api", "service=worker"]


def test_pipelines_macro_transform(spark):
    """The reference's `pipelines` macro transform
    (src/transforms/pipelines/mod.rs module doc): type router by
    kind, chained sub-pipelines per kind, filter-gated sub-pipelines
    bypass non-matching events to the next stage, unrouted kinds pass
    through untouched."""
    from vector_spark.plans.pipeline import Pipeline

    spec = {
        "sources": {"ev": {"type": "injected"}},
        "transforms": {
            "my_pipes": {
                "type": "pipelines",
                "inputs": ["ev"],
                "logs": [
                    # p0: unconditional — tag every log
                    {
                        "name": "foo",
                        "transforms": [
                            {
                                "type": "remap",
                                "exprs": {"stage": "'p0'"},
                                "drop_on_error": False,
                            }
                        ],
                    },
                    # p1: only value > 10 goes through; rest bypass
                    {
                        "name": "bar",
                        "filter": "value > 10",
                        "transforms": [
                            {
                                "type": "remap",
                                "exprs": {"stage": "'p1'"},
                                "drop_on_error": False,
                            }
                        ],
                    },
                ],
                "metrics": [
                    {
                        "name": "hello",
                        "transforms": [
                            {
                                "type": "remap",
                                "exprs": {"stage": "'m0'"},
                                "drop_on_error": False,
                            }
                        ],
                    }
                ],
            }
        },
    }
    df = spark.createDataFrame(
        [
            ("log", 5, "a"),
            ("log", 50, "b"),
            ("metric", 1, "c"),
            ("trace", 2, "d"),  # no traces pipeline -> untouched
        ],
        "kind string, value long, name string",
    )
    ports = Pipeline(spec, spark).compile({"ev": df})
    rows = {r.name: r for r in ports["my_pipes"].collect()}
    assert len(rows) == 4
    assert rows["a"].stage == "p0"  # bypassed p1's filter
    assert rows["b"].stage == "p1"  # went through both
    assert rows["c"].stage == "m0"
    assert rows["d"].stage is None  # unrouted kind, null-filled column


def test_pipelines_macro_null_kind_and_empty(spark):
    """NULL-kind events are 'unrouted' and pass through; a pipelines
    transform with no pipeline lists is a pure pass-through."""
    from vector_spark.plans.pipeline import Pipeline

    base = {
        "sources": {"ev": {"type": "injected"}},
        "transforms": {
            "p": {
                "type": "pipelines",
                "inputs": ["ev"],
                "logs": [
                    {"transforms": [{"type": "filter", "condition": "value > 0"}]}
                ],
            }
        },
    }
    df = spark.createDataFrame(
        [("log", 1, "a"), (None, -5, "b"), ("metric", 2, "c")],
        "kind string, value long, name string",
    )
    out = {r.name for r in Pipeline(base, spark).compile({"ev": df})["p"].collect()}
    assert out == {"a", "b", "c"}  # null kind survived

    empty = {
        "sources": {"ev": {"type": "injected"}},
        "transforms": {"p": {"type": "pipelines", "inputs": ["ev"]}},
    }
    assert Pipeline(empty, spark).compile({"ev": df})["p"].count() == 3


def test_toml_remap_with_vrl_source(spark, events_df):
    """A vector.toml remap with a real VRL `source` block (the
    reference's native authoring surface) compiles through the spec
    DAG: program text -> vrl_codegen Columns -> (ok, dropped) ports."""
    toml_text = '''
[sources.ev]
type = "injected"

[transforms.norm]
type = "remap"
inputs = ["ev"]
source = """
.event_type = upcase(string!(.event_type))
.is_big = .value > 100
if .event_type == "SIGNUP" { abort }
.tag = .event_type + "-" + to_string(.event_id)
"""

[transforms.big]
type = "filter"
inputs = ["norm"]
condition = "is_big"
'''
    ports = Pipeline.from_toml(toml_text, spark).compile({"ev": events_df})
    norm = {r.event_id: r for r in ports["norm"].collect()}
    assert set(norm) == {1, 2, 3, 5}  # signup (event 4) aborted
    assert norm[1].event_type == "ERROR" and norm[1].tag == "ERROR-1"
    assert ports["norm.dropped"].count() == 1
    assert ports["norm.dropped"].collect()[0].metadata_dropped.reason == "abort"
    assert sorted(r.event_id for r in ports["big"].collect()) == [1, 5]
