"""Golden tests for the log-format parse presets
(parse_apache_log / parse_common_log / parse_syslog / parse_logfmt),
mirroring the per-function golden tests of the reference stdlib
(test_function! macros in lib/vrl/stdlib/src/parse_apache_log.rs,
parse_syslog.rs, parse_logfmt.rs)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vector_spark.functions.presets import (
    parse_apache_log,
    parse_common_log,
    parse_logfmt,
    parse_syslog,
)


def _one(spark, line, expr):
    df = spark.createDataFrame([(line,)], "line string")
    return df.select(expr(F.col("line")).alias("p")).select("p.*").collect()[0]


def test_apache_common_log(spark):
    row = _one(
        spark,
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326',
        parse_apache_log,
    )
    assert row.host == "127.0.0.1"
    assert row.identity is None  # '-' normalized
    assert row.user == "frank"
    assert row.timestamp == datetime.datetime(2000, 10, 10, 20, 55, 36)  # UTC
    assert row.message == "GET /apache_pb.gif HTTP/1.0"
    assert row.method == "GET"
    assert row.path == "/apache_pb.gif"
    assert row.protocol == "HTTP/1.0"
    assert row.status == 200
    assert row.size == 2326


def test_apache_no_match_is_null_struct(spark):
    row = _one(spark, "not an apache line", parse_apache_log)
    assert all(v is None for v in row.asDict().values())


def test_common_log_alias(spark):
    assert parse_common_log is parse_apache_log


def test_apache_combined_log(spark):
    row = _one(
        spark,
        '127.0.0.1 bob frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://www.seniorinfomediaries.com/vertical/channels" '
        '"Mozilla/5.0 (X11; Linux i686)"',
        lambda c: parse_apache_log(c, format="combined"),
    )
    assert row.status == 200 and row.size == 2326
    assert row.referrer == (
        "http://www.seniorinfomediaries.com/vertical/channels"
    )
    assert row.agent == "Mozilla/5.0 (X11; Linux i686)"


def test_apache_error_log(spark):
    # parse_apache_log.rs error_line_valid
    row = _one(
        spark,
        "[01/Mar/2021:12:00:19 +0000] [ab:alert] [pid 4803:tid 3814] "
        "[client 147.159.108.175:24259] I'll bypass the haptic COM "
        "bandwidth, that should matrix the CSS driver!",
        lambda c: parse_apache_log(c, format="error"),
    )
    assert row.timestamp == datetime.datetime(2021, 3, 1, 12, 0, 19)
    assert row.module == "ab" and row.severity == "alert"
    assert row.pid == 4803 and row.thread == "3814"
    assert row.client == "147.159.108.175" and row.port == 24259
    assert row.message.startswith("I'll bypass the haptic")


def test_apache_custom_timestamp_format(spark):
    # parse_apache_log.rs log_line_valid_with_timestamp_format
    row = _one(
        spark,
        '127.0.0.1 - - [Wed Mar 01 12:00:19 2021] "GET /x HTTP/1.0" 200 2',
        lambda c: parse_apache_log(c, timestamp_format="%a %b %d %T %Y"),
    )
    assert row.timestamp == datetime.datetime(2021, 3, 1, 12, 0, 19)


def test_syslog_3164(spark):
    row = _one(
        spark,
        "<34>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick",
        parse_syslog,
    )
    assert row.facility == "auth"  # code 4
    assert row.severity == "crit"  # code 2
    assert row.tstxt == "Oct 11 22:14:15"
    assert row.timestamp is None  # RFC3164 stamps carry no year/zone
    assert row.hostname == "mymachine"
    assert row.appname == "su"
    assert row.message == "'su root' failed for lonvick"


def test_syslog_space_padded_day(spark):
    row = _one(spark, "<13>Jan  5 01:02:03 h1 app: m", parse_syslog)
    assert row.hostname == "h1" and row.tstxt == "Jan  5 01:02:03"


def test_syslog_rfc5424(spark):
    row = _one(
        spark,
        '<165>1 2020-03-13T20:45:38.119Z dynamicwireless.name non 2426 '
        'ID931 [exampleSDID@32473 iut="3"] Try to override the rule',
        parse_syslog,
    )
    # parse_syslog.rs:40-53 doc example (SD elements are matched but
    # not expanded — dynamic root keys don't fit a static schema)
    assert row.severity == "notice" and row.facility == "local4"
    assert row.hostname == "dynamicwireless.name"
    assert row.appname == "non" and row.procid == 2426
    assert row.msgid == "ID931" and row.version == 1
    assert row.message == "Try to override the rule"
    assert row.timestamp == datetime.datetime(2020, 3, 13, 20, 45, 38, 119000)


def test_syslog_rfc5424_nil_fields(spark):
    row = _one(spark, "<0>1 2020-03-13T20:45:38.119Z a a 0 a [] baz",
               parse_syslog)
    assert row.severity == "emerg" and row.facility == "kern"
    assert row.message == "baz" and row.procid == 0
    row = _one(spark, "<13>1 - - - - - -", parse_syslog)
    assert row.hostname is None and row.appname is None
    assert row.msgid is None and row.timestamp is None
    assert row.message is None or row.message == ""


def test_logfmt(spark):
    row = (
        spark.createDataFrame([("at=info method=GET path=/ status=200 bare",)], "l string")
        .select(parse_logfmt(F.col("l")).alias("m"))
        .collect()[0]
    )
    assert row.m == {"at": "info", "method": "GET", "path": "/", "status": "200"}


def test_grok_pandas_null_and_failed_match_are_null_not_empty(spark):
    """Regression: pyarrow extract_regex marks failures invalid on the
    STRUCT while child arrays hold '' placeholders; unmasked, gated
    (null) inputs and failed matches emitted empty strings instead of
    NULLs — poisoning isNotNull semantics and forcing downstream
    try_cast through its per-row error path (4x slowdown)."""
    from pyspark.sql import functions as F

    from vector_spark.functions.grok import grok_extract_pandas

    df = spark.createDataFrame(
        [("GET /x status=200 dur_ms=5",), (None,), ("not a request",)],
        "line string",
    )
    g = grok_extract_pandas(
        F.col("line"), "%{WORD:method} %{NOTSPACE:path} status=%{INT:status} dur_ms=%{INT:dur_ms}"
    )
    rows = df.select(g.alias("g")).select("g.method", "g.status").collect()
    assert rows[0].method == "GET" and rows[0].status == "200"
    for r in rows[1:]:
        assert r.method is None, f"expected NULL, got {r.method!r}"
        assert r.status is None, f"expected NULL, got {r.status!r}"


def test_nginx_combined_log(spark):
    from vector_spark.functions.presets import parse_nginx_log

    row = _one(
        spark,
        '203.0.113.9 - - [10/Oct/2000:13:55:36 -0700] '
        '"GET /index.html HTTP/1.1" 404 153 '
        '"http://example.com/start" "Mozilla/5.0 (X11; Linux)"',
        parse_nginx_log,
    )
    assert row.client == "203.0.113.9"
    assert row.user is None
    assert row.request == "GET /index.html HTTP/1.1"
    assert row.status == 404 and row.size == 153
    assert row.referer == "http://example.com/start"
    assert row.agent == "Mozilla/5.0 (X11; Linux)"
    assert row.compression is None  # optional third quoted field absent


def test_nginx_combined_log_with_compression(spark):
    from vector_spark.functions.presets import parse_nginx_log

    row = _one(
        spark,
        '203.0.113.9 - alice [10/Oct/2000:13:55:36 -0700] '
        '"GET /index.html HTTP/1.1" 200 153 '
        '"-" "curl/8.0" "2.75"',
        parse_nginx_log,
    )
    assert row.user == "alice"
    assert row.referer is None  # '-' normalized
    assert row.agent == "curl/8.0"
    assert row.compression == "2.75"


def test_nginx_error_log(spark):
    from vector_spark.functions.presets import parse_nginx_log

    # parse_nginx_log.rs error_line_valid
    row = _one(
        spark,
        '2021/04/01 13:02:31 [error] 31#31: *1 open() '
        '"/usr/share/nginx/html/not-found" failed '
        '(2: No such file or directory), client: 172.17.0.1, '
        'server: localhost, request: "POST /not-found HTTP/1.1", '
        'host: "localhost:8081"',
        lambda c: parse_nginx_log(c, format="error"),
    )
    assert row.timestamp == datetime.datetime(2021, 4, 1, 13, 2, 31)
    assert row.severity == "error"
    assert row.pid == 31 and row.tid == 31 and row.cid == 1
    assert row.message == (
        'open() "/usr/share/nginx/html/not-found" failed '
        '(2: No such file or directory)'
    )
    assert row.client == "172.17.0.1" and row.server == "localhost"
    assert row.request == "POST /not-found HTTP/1.1"
    assert row.host == "localhost:8081" and row.upstream is None


def test_nginx_error_log_excess(spark):
    from vector_spark.functions.presets import parse_nginx_log

    row = _one(
        spark,
        '2021/04/01 13:02:31 [error] 31#31: *1 limiting requests, '
        'excess: 1.85 by zone "one", client: 172.17.0.1',
        lambda c: parse_nginx_log(c, format="error"),
    )
    assert row.message == "limiting requests"
    assert row.excess == 1.85 and row.zone == "one"


def test_preset_declared_types_match_actual(spark):
    """The PARSE_*_TYPE schemas exported for the VRL compiler's _RET
    table must equal what the parsers actually produce (names + types,
    nullability-insensitive)."""
    from vector_spark.functions import presets as P

    cases = [
        (P.parse_apache_log, P.PARSE_APACHE_LOG_TYPE),
        (lambda c: P.parse_apache_log(c, format="combined"),
         P.PARSE_APACHE_LOG_COMBINED_TYPE),
        (lambda c: P.parse_apache_log(c, format="error"),
         P.PARSE_APACHE_LOG_ERROR_TYPE),
        (P.parse_nginx_log, P.PARSE_NGINX_LOG_TYPE),
        (lambda c: P.parse_nginx_log(c, format="error"),
         P.PARSE_NGINX_LOG_ERROR_TYPE),
        (P.parse_syslog, P.PARSE_SYSLOG_TYPE),
        (P.parse_glog, P.PARSE_GLOG_TYPE),
        (P.parse_cef, P.PARSE_CEF_TYPE),
        (P.parse_aws_vpc_flow_log, P.PARSE_AWS_VPC_FLOW_LOG_TYPE),
        (P.parse_aws_alb_log, P.PARSE_AWS_ALB_LOG_TYPE),
        (P.parse_logfmt, P.PARSE_LOGFMT_TYPE),
    ]
    df = spark.createDataFrame([("x",)], "line string")
    for fn, declared in cases:
        actual = df.select(fn(F.col("line")).alias("p")).schema["p"].dataType
        assert actual.simpleString() == declared.simpleString(), fn


def test_glog_and_klog(spark):
    from vector_spark.functions.presets import parse_glog, parse_klog

    row = _one(
        spark,
        "E0210 13:55:36.123456  1234 server.cc:42] handler panicked: oom",
        parse_glog,
    )
    assert row.level == "error"
    assert (row.month, row.day) == (2, 10)
    assert row.timetxt == "13:55:36.123456"
    assert row.thread_id == 1234
    assert row.file == "server.cc" and row.line == 42
    assert row.message == "handler panicked: oom"
    assert parse_klog is parse_glog


def test_cef(spark):
    from vector_spark.functions.presets import parse_cef

    row = _one(
        spark,
        "CEF:0|Security|threatmanager|1.0|100|worm stopped|10|src=10.0.0.1 dst=2.1.2.2 spt=1232",
        parse_cef,
    )
    assert row.cef_version == 0
    assert row.device_vendor == "Security"
    assert row.signature_id == "100"
    assert row.name == "worm stopped"
    assert row.severity == "10"
    assert row.extension == {"src": "10.0.0.1", "dst": "2.1.2.2", "spt": "1232"}


def test_vpc_flow_log(spark):
    from vector_spark.functions.presets import parse_aws_vpc_flow_log

    row = _one(
        spark,
        "2 123456789010 eni-1235b8ca 172.31.16.139 172.31.16.21 20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK",
        parse_aws_vpc_flow_log,
    )
    assert row.version == 2
    assert row.srcaddr == "172.31.16.139"
    assert row.dstport == 22
    assert row.bytes == 4249
    assert row.action == "ACCEPT"
    # NODATA line with '-' fields
    row2 = _one(
        spark,
        "2 123456789010 eni-1235b8ca - - - - - - - 1431280876 1431280934 - NODATA",
        parse_aws_vpc_flow_log,
    )
    assert row2.srcaddr is None and row2.bytes is None and row2.log_status == "NODATA"


def test_aws_alb_log(spark):
    from vector_spark.functions.presets import parse_aws_alb_log

    line = (
        'https 2018-07-02T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 '
        '192.168.131.39:2817 10.0.0.1:80 0.086 0.048 0.037 200 200 0 57 '
        '"GET https://www.example.com:443/ HTTP/1.1" "curl/7.46.0" '
        'ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2'
    )
    row = _one(spark, line, parse_aws_alb_log)
    assert row.type == "https"
    assert row.client_ip == "192.168.131.39" and row.client_port == 2817
    assert row.elb_status_code == 200
    assert row.target_processing_time == 0.048
    assert row.method == "GET" and row.http_version == "HTTP/1.1"
    assert row.user_agent == "curl/7.46.0"
    assert row.ssl_protocol == "TLSv1.2"
