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
