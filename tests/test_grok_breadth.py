"""Grok breadth: recursive pattern expansion, standard primitives,
COMBINEDAPACHELOG composite, Datadog filters, parse_groks
first-match semantics."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from vector_spark.functions.grok import (
    GROK_PATTERNS,
    apply_grok_filter,
    grok_extract_native,
    grok_extract_typed,
    grok_filters,
    grok_to_regex,
    parse_groks_pandas,
)

COMBINED_LINE = (
    '93.180.71.3 - frank [10/Oct/2000:13:55:36 -0700] '
    '"GET /apache_pb.gif?x=1 HTTP/1.0" 200 2326 '
    '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I)"'
)


def test_primitives_compile_and_match():
    samples = {
        "HOSTNAME": "api.example-1.org",
        "IPORHOST": "10.1.2.3",
        "UUID": "f81d4fae-7dec-11d0-a765-00a0c91e6bf6",
        "MAC": "00:1b:44:11:3a:b7",
        "QS": '"with \\"escapes\\" inside"',
        "URIPATH": "/a/b-c/d_e",
        "URI": "https://user@api.example.org:8080/p?q=1",
        "EMAILADDRESS": "john.doe@example.org",
        "DATESTAMP": "10/31/2023 13:55:36",
        "TIME": "13:55:36.123",
        "UNIXPATH": "/var/log/app.log",
    }
    for name, sample in samples.items():
        rx, _ = grok_to_regex(f"%{{{name}}}")
        assert re.fullmatch(rx, sample), f"{name} failed on {sample!r}"
    # every library entry must expand without errors in both flavors
    for name in GROK_PATTERNS:
        for flavor in ("python", "java"):
            grok_to_regex(f"%{{{name}:x}}", flavor=flavor)


def test_combined_apache_composite(spark):
    df = spark.createDataFrame([(COMBINED_LINE,), ("garbage",)], "line string")
    out = df.select(
        "line", grok_extract_native(F.col("line"), "%{COMBINEDAPACHELOG}").alias("g")
    ).collect()
    good = [r.g for r in out if r.line != "garbage"][0]
    assert good.clientip == "93.180.71.3"
    assert good.ident == "-" and good.auth == "frank"
    assert good.verb == "GET" and good.request == "/apache_pb.gif?x=1"
    assert good.response == "200" and good.bytes == "2326"
    assert good.referrer == '"http://www.example.com/start.html"'
    assert good.agent == '"Mozilla/4.08 [en] (Win98; I)"'
    bad = [r.g for r in out if r.line == "garbage"][0]
    assert bad.clientip is None and bad.response is None


def test_datadog_filters(spark):
    pat = (
        '%{IPORHOST:client} %{NOTSPACE:status:integer} '
        '%{NOTSPACE:bytes:nullIf("-")} %{NUMBER:dur:scale(1000)} '
        '%{WORD:lvl:uppercase}'
    )
    assert grok_filters(pat) == {
        "status": "integer",
        "bytes": 'nullIf("-")',
        "dur": "scale(1000)",
        "lvl": "uppercase",
    }
    df = spark.createDataFrame([("1.2.3.4 204 - 1.5 info",)], "line string")
    g = df.select(grok_extract_typed(F.col("line"), pat).alias("g")).first().g
    assert g.status == 204 and isinstance(g.status, int)
    assert g.bytes is None
    assert g.dur == 1500.0
    assert g.lvl == "INFO"


def test_filter_semantics(spark):
    df = spark.createDataFrame([("x",)], "v string")
    row = df.select(
        apply_grok_filter(F.lit("42"), "integer").alias("i"),
        apply_grok_filter(F.lit("nope"), "integer").alias("i_bad"),
        apply_grok_filter(F.lit("2.5"), "number").alias("n"),
        apply_grok_filter(F.lit("true"), "boolean").alias("b"),
        apply_grok_filter(F.lit("-"), 'nullIf("-")').alias("nf"),
    ).first()
    assert (row.i, row.i_bad, row.n, row.b, row.nf) == (42, None, 2.5, True, None)


def test_parse_groks_first_match(spark):
    pats = [
        "%{WORD:verb} %{URIPATH:path}",
        "%{TIMESTAMP_ISO8601:ts} %{GREEDYDATA:msg}",
        "%{GREEDYDATA:fallback}",
    ]
    rows = [
        ("GET /index.html",),
        ("2024-01-01T00:00:00Z started up",),
        ("???",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "line string")
    out = {
        r.line: r.g
        for r in df.select("line", parse_groks_pandas(F.col("line"), pats).alias("g")).collect()
    }
    g = out["GET /index.html"]
    assert g.verb == "GET" and g.path == "/index.html" and g.fallback is None
    g = out["2024-01-01T00:00:00Z started up"]
    assert g.ts == "2024-01-01T00:00:00Z" and g.msg == "started up" and g.verb is None
    g = out["???"]
    assert g.fallback == "???" and g.verb is None
    g = out[None]
    assert all(v is None for v in g.asDict().values())


def test_json_array_ext_filters(spark):
    """r4 VERDICT gap: grok_filter.rs:14-33 Json / Array / IntegerExt /
    NumberExt as FILTERS. json -> VARIANT (NULL on malformed), array
    honors the reference's bracket/delimiter/value-filter arg forms
    (filters/array.rs), integerExt truncates toward zero."""
    df = spark.range(1)
    row = df.select(
        F.to_json(
            apply_grok_filter(F.lit('{"a": 1, "b": {"c": "x"}}'), "json")
        ).alias("j"),
        apply_grok_filter(F.lit("not json"), "json").alias("j_bad"),
        apply_grok_filter(F.lit("[1,2,3]"), "array()").alias("a_def"),
        # array.rs test parses_default: elements are NOT trimmed
        apply_grok_filter(F.lit("[ 1 ,2]"), "array()").alias("a_sp"),
        apply_grok_filter(F.lit("{1,2}"), 'array("{}", ",")').alias("a_br"),
        apply_grok_filter(F.lit("[1;2]"), 'array(";")').alias("a_sep"),
        apply_grok_filter(F.lit("[1,2]"), "array(integer)").alias("a_int"),
        apply_grok_filter(F.lit("[1.5;2]"), 'array(";", number)').alias("a_nf"),
        apply_grok_filter(
            F.lit("<1e2|7>"), 'array("<>", "|", integerExt)'
        ).alias("a_full"),
        apply_grok_filter(F.lit("1,2"), 'array("", ",")').alias("a_nobr"),
        apply_grok_filter(F.lit("no brackets"), "array()").alias("a_bad"),
        apply_grok_filter(F.lit("[]"), "array()").alias("a_empty"),
        apply_grok_filter(F.lit("1e3"), "integerExt").alias("ie"),
        apply_grok_filter(F.lit("-2.7"), "integerExt").alias("ie_trunc"),
        apply_grok_filter(F.lit("1.52e2"), "numberExt").alias("ne"),
    ).first()
    import json as _json

    assert _json.loads(row["j"]) == {"a": 1, "b": {"c": "x"}}
    assert row["j_bad"] is None
    assert row["a_def"] == ["1", "2", "3"]
    assert row["a_sp"] == [" 1 ", "2"]
    assert row["a_br"] == ["1", "2"]
    assert row["a_sep"] == ["1", "2"]
    assert row["a_int"] == [1, 2]
    assert row["a_nf"] == [1.5, 2.0]
    assert row["a_full"] == [100, 7]
    assert row["a_nobr"] == ["1", "2"]
    assert row["a_bad"] is None
    assert row["a_empty"] == []
    assert row["ie"] == 1000
    assert row["ie_trunc"] == -2  # `as i64` truncates toward zero
    assert row["ne"] == 152.0


def test_json_filter_in_pattern(spark):
    """%{data:payload:json} end-to-end through grok_extract_typed —
    the common Datadog config shape the r4 VERDICT flagged."""
    df = spark.createDataFrame(
        [
            ('ERROR {"code": 500, "retriable": false}',),
            ("WARN not-json-payload",),
        ],
        "line string",
    )
    st = grok_extract_typed(
        F.col("line"), "%{word:level} %{data:payload:json}"
    )
    rows = df.select(st.alias("g")).select(
        F.col("g.level").alias("level"),
        F.try_variant_get(F.col("g.payload"), "$.code", "bigint").alias("code"),
    ).collect()
    got = {r["level"]: r["code"] for r in rows}
    assert got == {"ERROR": 500, "WARN": None}
