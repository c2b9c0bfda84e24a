"""Datadog grok user-defined aliases (parse_grok_rules.rs alias
support), exercised with the reference flagship config's own alias
map (regression/cases/http_pipelines_blackhole/vector/vector.toml:
44-74): dotted alias + field names, aliases referencing aliases,
lowercase Datadog matchers, parameterized regex()/date() matchers,
filters declared inside alias definitions, and Datadog regex-literal
pattern semantics ((?s), atomic groups, \\[ passing through)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from vector_spark.functions.grok import (
    compile_grok,
    grok_extract_typed,
    parse_groks_pandas,
)

# The flagship config's alias map, TOML-unescaped.
ALIASES = {
    "access.common": (
        r'%{_client_ip} %{_ident} %{_auth} \[%{_date_access}\] '
        r'"(?>%{_method} |)%{_url}(?> %{_version}|)" %{_status_code} '
        r'(?>%{_bytes_written}|-)'
    ),
    "access.combined": (
        r'%{access.common} (%{number:duration:scale(1000000000)} )?'
        r'"%{_referer}" "%{_user_agent}"( "%{_x_forwarded_for}")?.*'
    ),
    "_auth": r'%{notSpace:http.auth:nullIf("-")}',
    "_bytes_written": r"%{integer:network.bytes_written}",
    "_client_ip": r"%{ipOrHost:network.client.ip}",
    "_version": r'HTTP\/%{regex("\d+\.\d+"):http.version}',
    "_url": r"%{notSpace:http.url}",
    "_ident": r'%{notSpace:http.ident:nullIf("-")}',
    "_user_agent": r'%{regex("[^\"]*"):http.useragent}',
    "_referer": r"%{notSpace:http.referer}",
    "_status_code": r"%{integer:http.status_code}",
    "_method": r"%{word:http.method}",
    "_date_access": r'%{date("dd/MMM/yyyy:HH:mm:ss Z"):date_access}',
    "_x_forwarded_for": r'%{regex("[^\"]*"):http._x_forwarded_for:nullIf("-")}',
}

ACCESS_LINE = (
    '10.2.3.4 - frank [10/Oct/2023:13:55:36 -0700] '
    '"GET /index.html HTTP/1.1" 200 2326'
)
COMBINED_LINE = (
    ACCESS_LINE + ' "http://ref.example.com/" "Mozilla/5.0 (X11)" "203.0.113.9"'
)


def test_alias_compile_fields_and_filters():
    rx, fields, filters = compile_grok(
        "(?s)%{access.common}", aliases=ALIASES, literal_text=False
    )
    assert fields == [
        "network.client.ip", "http.ident", "http.auth", "date_access",
        "http.method", "http.url", "http.version", "http.status_code",
        "network.bytes_written",
    ]
    # filters surfaced from INSIDE alias definitions
    assert filters["http.auth"] == 'nullIf("-")'
    assert filters["http.status_code"] == "integer"
    m = re.fullmatch(rx, ACCESS_LINE)
    assert m
    # dotted fields map to sanitized group names
    assert m.group("network_client_ip") == "10.2.3.4"
    assert m.group("http_status_code") == "200"
    assert m.group("date_access") == "10/Oct/2023:13:55:36 -0700"


def test_alias_of_alias_combined():
    rx, fields, _ = compile_grok(
        "(?s)%{access.combined}", aliases=ALIASES, literal_text=False
    )
    m = re.fullmatch(rx, COMBINED_LINE)
    assert m
    assert m.group("http_useragent") == "Mozilla/5.0 (X11)"
    assert m.group("http__x_forwarded_for") == "203.0.113.9"


def test_typed_extraction_with_aliases(spark):
    df = spark.createDataFrame(
        [(ACCESS_LINE,), ('1.2.3.4 - - [10/Oct/2023:13:55:36 -0700] "GET /x HTTP/1.0" 404 -',)],
        "line string",
    )
    out = df.select(
        grok_extract_typed(
            F.col("line"), "(?s)%{access.common}", engine="pandas",
            aliases=ALIASES, literal_text=False,
        ).alias("g")
    ).select("g.*")
    rows = out.collect()
    assert rows[0]["http.status_code"] == 200  # integer filter applied
    assert rows[0]["http.auth"] == "frank"
    assert rows[1]["http.auth"] is None  # nullIf("-") inside alias
    assert rows[1]["network.bytes_written"] is None  # (?>...|-) alternative


def test_parse_groks_with_aliases_first_match(spark):
    """The flagship's 3-pattern nginx chain: access lines hit the
    combined/common patterns, error lines hit the error pattern."""
    error_line = "2023/10/10 13:55:36 [error] open() failed, no such file"
    patterns = [
        "(?s)%{access.combined}",
        "(?s)%{access.common}",
        r'(?s)%{date("yyyy/MM/dd HH:mm:ss"):date_access} \[%{word:level}\] %{data:error.message}(, %{data::keyvalue(": ",",")})?',
    ]
    df = spark.createDataFrame(
        [(COMBINED_LINE,), (ACCESS_LINE,), (error_line,)], "line string"
    )
    out = df.select(
        parse_groks_pandas(
            F.col("line"), patterns, aliases=ALIASES, literal_text=False
        ).alias("g")
    ).select("g.*")
    rows = out.collect()
    assert rows[0]["http.useragent"] == "Mozilla/5.0 (X11)"
    assert rows[1]["network.client.ip"] == "10.2.3.4"
    assert rows[1]["http.useragent"] is None
    assert rows[2]["level"] == "error"
    assert rows[2]["error.message"].startswith("open() failed")


def test_keyvalue_filter(spark):
    """keyvalue filter args follow the reference signature
    (lib/datadog/grok/src/filters/keyvalue.rs filter_from_function):
    (kv_delimiter, value allow-list extra chars, quotes, field_delim) —
    arg 2 extends the `[\\w.\\-_@]` value class, it is NOT a pair
    separator. With allow-extra ',' the comma-delimited split still
    applies (default field delims ' ' ',' ';' tried in order), and a
    value outside the allow-list ('/x') parses as '' -> pair dropped
    (keyvalue.rs match_re_or_empty)."""
    df = spark.createDataFrame([("open() failed, code: 2,client: a_b",)], "line string")
    out = df.select(
        grok_extract_typed(
            F.col("line"),
            r'%{data:error.message}, %{data:kv:keyvalue(": ",",")}',
            engine="pandas",
            literal_text=False,
        ).alias("g")
    ).select("g.*").collect()[0]
    assert out["error.message"] == "open() failed"
    assert out["kv"] == {"code": "2", "client": "a_b"}


# (filter kwargs, input, expected map) — the reference's own fixture
# table, parse_grok.rs:643-760 `parses_keyvalue`
KV_CASES = [
    (dict(), "key=valueStr", {"key": "valueStr"}),
    (dict(), "key=<valueStr>", {"key": "valueStr"}),
    (dict(), '"key"="valueStr"', {"key": "valueStr"}),
    (dict(), "'key'='valueStr'", {"key": "valueStr"}),
    (dict(), "<key>=<valueStr>", {"key": "valueStr"}),
    (dict(kv_sep=":"), "key:valueStr", {"key": "valueStr"}),
    (dict(kv_sep=":", allow_extra="/"), 'key:"/valueStr"', {"key": "/valueStr"}),
    (dict(kv_sep=":", allow_extra="/"), "/key:/valueStr", {"/key": "/valueStr"}),
    (
        dict(kv_sep=":=", allow_extra="", quotes=[("{", "}")]),
        "key:={valueStr}",
        {"key": "valueStr"},
    ),
    (
        dict(kv_sep="=", field_delims=["|"]),
        "key1=value1|key2=value2",
        {"key1": "value1", "key2": "value2"},
    ),
    (
        dict(kv_sep="=", field_delims=["|"]),
        'key1="value1"|key2="value2"',
        {"key1": "value1", "key2": "value2"},
    ),
    (
        dict(kv_sep=":=", quotes=[("<", ">")], allow_given=True),
        'key1:=valueStr key2:=</valueStr2> key3:="valueStr3"',
        {"key1": "valueStr", "key2": "/valueStr2"},
    ),
    (dict(), "key1=value1,key2=value2", {"key1": "value1", "key2": "value2"}),
    (dict(), "key1=value1;key2=value2", {"key1": "value1", "key2": "value2"}),
    (dict(), "key:=valueStr", {}),
    (dict(), "key1= key2=null key3=value3", {"key3": "value3"}),
]


def test_keyvalue_reference_fixtures(spark):
    """datadog_keyvalue replays the reference's parses_keyvalue table
    (parse_grok.rs:643-760) bit-for-bit, in ONE projection."""
    from vector_spark.functions.grok import datadog_keyvalue

    df = spark.createDataFrame([(c[1],) for c in KV_CASES], "line string")
    cols = [
        datadog_keyvalue(F.col("line"), **c[0]).alias(f"m{i}")
        for i, c in enumerate(KV_CASES)
    ]
    rows = df.select(*cols).collect()
    for i, (_, inp, exp) in enumerate(KV_CASES):
        got = dict(rows[i][f"m{i}"] or {})
        assert got == exp, f"case {i}: {inp!r} -> {got} expected {exp}"


def test_keyvalue_root_destination_surfaced(spark):
    """%{data::keyvalue(...)} (empty destination): the reference merges
    the kv map into the event root (parse_grok.rs:65-68); here it
    surfaces as the reserved `_kvroot` map field instead of being
    silently dropped — the flagship error pattern uses this form."""
    df = spark.createDataFrame(
        [("2023/10/10 13:55:36 [error] open() failed, code: 2,client: a_b",)],
        "line string",
    )
    pat = (
        r'(?s)%{date("yyyy/MM/dd HH:mm:ss"):date_access} \[%{word:level}\] '
        r'%{data:error.message}(, %{data::keyvalue(": ",",")})?'
    )
    out = (
        df.select(
            grok_extract_typed(
                F.col("line"), pat, engine="pandas", literal_text=False
            ).alias("g")
        )
        .select("g.*")
        .collect()[0]
    )
    assert out["level"] == "error"
    assert out["error.message"] == "open() failed"
    assert out["_kvroot"] == {"code": "2", "client": "a_b"}


def test_date_matcher_formats():
    rx, _, _ = compile_grok(
        '%{date("yyyy/MM/dd HH:mm:ss"):d}', literal_text=False
    )
    assert re.fullmatch(rx, "2023/10/10 13:55:36")
    assert not re.fullmatch(rx, "2023-10-10 13:55:36")


def test_date_matcher_implies_timestamp(spark):
    """Parity with parse_grok_rules: %{date(fmt):x} resolves to a
    Date FILTER (matchers/date.rs apply_date_filter), so the typed
    struct carries a TIMESTAMP, interpreted in the optional tz arg;
    unparseable text -> NULL."""
    import datetime

    df = spark.createDataFrame(
        [
            ("2023/10/10 13:55:36 ok",),
            ("10/Oct/2023:13:55:36 -0700 offs",),
            ("not-a-date x",),
        ],
        "line string",
    )
    plain = grok_extract_typed(
        F.col("line"), r'(?s)%{date("yyyy/MM/dd HH:mm:ss"):d} %{word:w}',
        literal_text=False,
    )
    offs = grok_extract_typed(
        F.col("line"),
        r'(?s)%{date("dd/MMM/yyyy:HH:mm:ss Z"):d} %{word:w}',
        literal_text=False,
    )
    tz = grok_extract_typed(
        F.col("line"),
        r'(?s)%{date("yyyy/MM/dd HH:mm:ss", "Europe/Paris"):d} %{word:w}',
        literal_text=False,
    )
    rows = df.select(
        plain["d"].alias("p"), offs["d"].alias("o"), tz["d"].alias("t")
    ).collect()
    # session tz is UTC: naive parse lands as UTC wall-clock
    assert rows[0]["p"] == datetime.datetime(2023, 10, 10, 13, 55, 36)
    # explicit -0700 offset normalizes to UTC
    assert rows[1]["o"] == datetime.datetime(2023, 10, 10, 20, 55, 36)
    # tz arg: the naive datetime is IN Paris time (UTC+2 on that date)
    assert rows[0]["t"] == datetime.datetime(2023, 10, 10, 11, 55, 36)
    assert rows[2]["p"] is None and rows[2]["o"] is None and rows[2]["t"] is None
