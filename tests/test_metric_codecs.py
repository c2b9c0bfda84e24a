"""statsd / prometheus text decoders, cases ported from the
reference's own parser tests (src/sources/statsd/parser.rs:228-420)
plus the public prometheus exposition grammar."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_spark.sources.codecs import decode_prometheus_line, decode_statsd

# (line, expected dict or None-for-malformed) — statsd parser tests
STATSD_CASES = [
    (
        "foo:1|c",
        dict(name="foo", mtype="counter", kind="incremental", value=1.0, tags=None),
    ),
    (
        "foo:1|c|#tag1,tag2:value",
        dict(
            name="foo",
            mtype="counter",
            kind="incremental",
            value=1.0,
            tags={"tag1": "true", "tag2": "value"},
        ),
    ),
    (  # sampled counter: 2 * (1/0.1) = 20
        "bar:2|c|@0.1",
        dict(name="bar", mtype="counter", kind="incremental", value=20.0, tags=None),
    ),
    (  # zero sampling sanitizes to 1
        "bar:2|c|@0",
        dict(name="bar", mtype="counter", kind="incremental", value=2.0, tags=None),
    ),
    (  # ms timers convert to base seconds
        "glork:320|ms|@0.1",
        dict(
            name="glork",
            mtype="distribution_histogram",
            kind="incremental",
            value=0.320,
            tags=None,
        ),
    ),
    (
        "glork:320|h|@0.1|#region:us-west1,production,e:",
        dict(
            name="glork",
            mtype="distribution_histogram",
            kind="incremental",
            value=320.0,
            tags={"region": "us-west1", "production": "true", "e": ""},
        ),
    ),
    (
        "glork:320|d|@0.1|#region:us-west1,production,e:",
        dict(
            name="glork",
            mtype="distribution_summary",
            kind="incremental",
            value=320.0,
            tags={"region": "us-west1", "production": "true", "e": ""},
        ),
    ),
    (
        "gaugor:333|g",
        dict(name="gaugor", mtype="gauge", kind="absolute", value=333.0, tags=None),
    ),
    (
        "gaugor:-4|g",
        dict(name="gaugor", mtype="gauge", kind="incremental", value=-4.0, tags=None),
    ),
    (
        "gaugor:+10|g",
        dict(name="gaugor", mtype="gauge", kind="incremental", value=10.0, tags=None),
    ),
    (
        "uniques:765|s",
        dict(name="uniques", mtype="set", kind="incremental", value=765.0, tags=None),
    ),
    (  # sanitize_key: whitespace -> _, non-alphanum dropped
        "a weird metric!:1|c",
        dict(
            name="a_weird_metric", mtype="counter", kind="incremental", value=1.0, tags=None
        ),
    ),
    ("no pipes here", None),
    ("novalue|c", None),
]


def test_statsd_decode(spark):
    rows = [(line,) for line, _ in STATSD_CASES]
    df = spark.createDataFrame(rows, "line string")
    got = {
        r.line: r.m
        for r in df.select("line", decode_statsd(F.col("line")).alias("m")).collect()
    }
    for line, want in STATSD_CASES:
        m = got[line]
        if want is None:
            assert m.name is None, line
            continue
        assert m.name == want["name"], line
        assert m.mtype == want["mtype"], line
        assert m.kind == want["kind"], line
        assert math.isclose(m.value, want["value"], rel_tol=1e-9), line
        assert m.tags == want["tags"], line


PROM_CASES = [
    (
        'http_requests_total{method="post",code="200"} 1027 1395066363000',
        dict(
            name="http_requests_total",
            labels={"method": "post", "code": "200"},
            value=1027.0,
            ts_ms=1395066363000,
        ),
    ),
    (
        "metric_without_labels 12.47",
        dict(name="metric_without_labels", labels={}, value=12.47, ts_ms=None),
    ),
    (
        'escaped{v="line1\\nwith \\"quotes\\""} 1',
        dict(name="escaped", labels={"v": 'line1\\nwith "quotes"'}, value=1.0, ts_ms=None),
    ),
    ("# HELP comment line", None),
    ("no_value_metric", None),
]


def test_prometheus_decode(spark):
    rows = [(line,) for line, _ in PROM_CASES]
    df = spark.createDataFrame(rows, "line string")
    got = {
        r.line: r.m
        for r in df.select(
            "line", decode_prometheus_line(F.col("line")).alias("m")
        ).collect()
    }
    for line, want in PROM_CASES:
        m = got[line]
        if want is None:
            assert m.name is None, line
            continue
        assert m.name == want["name"], line
        assert m.labels == want["labels"], line
        assert math.isclose(m.value, want["value"], rel_tol=1e-9), line
        assert m.ts_ms == want["ts_ms"], line


def test_prometheus_special_values(spark):
    df = spark.createDataFrame([("m NaN",), ("m +Inf",), ("m -Inf",)], "line string")
    vals = [
        r.m.value
        for r in df.select(decode_prometheus_line(F.col("line")).alias("m"))
        .orderBy(F.col("m.value"))
        .collect()
    ]
    assert any(v is not None and math.isnan(v) for v in vals)
    assert any(v == float("inf") for v in vals)
    assert any(v == float("-inf") for v in vals)
