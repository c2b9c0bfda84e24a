"""Log-format parse presets — the VRL parse_* preset family
(parse_apache_log.rs / parse_common_log.rs / parse_syslog.rs /
parse_nginx_log.rs in lib/vrl/stdlib/src/) re-expressed as grok
bundles compiled to JVM-side regex structs (grok_extract_native:
whole-stage-codegen regexp_extract, no Python in the path).

Each preset returns one struct column of TYPED fields; non-matching
lines yield a struct of NULLs (callers route those to the dropped
channel, remap.rs:426-441 semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.functions.grok import grok_extract_native
from vector_spark.functions.parse import parse_key_value

# Field names follow the reference's REGEX_APACHE_COMMON_LOG group
# names verbatim (lib/vrl/stdlib/src/log_util.rs:18-30): host /
# identity / user / timestamp / message / method / path / protocol /
# status / size — so a VRL program written against the reference
# (`parse_common_log!(.line).size`) compiles unchanged here.
# status/size are NOTSPACE, not INT: real CLF emits '-' for size on
# 204/304 responses (and some servers for status), and the reference
# regex accepts '-' per field and leaves that field null rather than
# failing the whole line. try_cast below turns '-' into NULL, matching
# that field-level leniency.
# the timestamp matcher is any-bracket-content (DATA), not HTTPDATE:
# the reference regex is `[^\[]*` (log_util.rs:21) so custom
# timestamp_format values parse too
APACHE_COMMON_GROK = (
    '%{NOTSPACE:host} %{NOTSPACE:identity} %{NOTSPACE:user} '
    '[%{DATA:timestamp}] "%{WORD:method} %{NOTSPACE:path} '
    '%{NOTSPACE:protocol}" %{NOTSPACE:status} %{NOTSPACE:size}'
)

# whitespace after the program colon is optional and NOT part of the
# message ('root[8539]:syslog message' parses with message='syslog
# message' — examples/successful_parse_syslog_type.vrl pins it)
SYSLOG_3164_GROK = (
    "<%{POSINT:pri}>%{SYSLOGTIMESTAMP:tstxt} %{NOTSPACE:host} "
    "%{SYSLOGPROG}:%{SPACE}%{GREEDYDATA:message}"
)


# Declared output schemas — the VRL compiler's _RET table imports
# these so `. = parse_common_log!(.line)` can expand the event to the
# struct's fields statically. test_presets asserts each declared type
# equals the schema Spark actually produces, so they cannot drift.
PARSE_APACHE_LOG_TYPE = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("identity", T.StringType()),
    T.StructField("user", T.StringType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("message", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("protocol", T.StringType()),
    T.StructField("status", T.LongType()),
    T.StructField("size", T.LongType()),
])


# apache 'combined' = common + quoted referrer/agent; the reference
# spells it 'referrer' here (log_util.rs:58,62 — unlike nginx's
# single-r 'referer')
APACHE_COMBINED_GROK = (
    APACHE_COMMON_GROK + ' "%{DATA:referrer}" "%{DATA:agent}"'
)

PARSE_APACHE_LOG_COMBINED_TYPE = T.StructType(
    [T.StructField(n, T.StringType()) for n in
     ("host", "identity", "user")]
    + [T.StructField("timestamp", T.TimestampType())]
    + [T.StructField(n, T.StringType()) for n in
       ("message", "method", "path", "protocol")]
    + [T.StructField("status", T.LongType()),
       T.StructField("size", T.LongType()),
       T.StructField("referrer", T.StringType()),
       T.StructField("agent", T.StringType())]
)

# apache error log, the flog-style 'simple' variant — the first regex
# of REGEX_APACHE_ERROR_LOG (log_util.rs:76-89) and the one the
# reference's own parse_apache_log tests exercise; the threaded-MPM
# variant (log_util.rs:93-104) is not implemented
_APACHE_ERROR_RE = (
    r"^\s*(-|\[(-|([^\[]*))\])\s+"
    r"(-|\[(-|([^:]*):([^\[]*))\])\s+"
    r"(-|\[\s*pid\s*(-|([^:]*)(:\s*tid\s*([^\[]*))?)\])\s"
    r"(-|\[\s*client\s*(-|(.*:?):([^\[]*))\])\s"
    r"(-|(.*))\s*$"
)
_APACHE_ERROR_GROUPS = {
    "timestamp": 3, "module": 6, "severity": 7, "pid": 10,
    "thread": 12, "client": 15, "port": 16, "message": 18,
}

PARSE_APACHE_LOG_ERROR_TYPE = T.StructType([
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("module", T.StringType()),
    T.StructField("severity", T.StringType()),
    T.StructField("pid", T.LongType()),
    T.StructField("thread", T.StringType()),
    T.StructField("client", T.StringType()),
    T.StructField("port", T.LongType()),
    T.StructField("message", T.StringType()),
])

PARSE_APACHE_LOG_TYPES = {}  # filled after parse_apache_log below


def _strptime_fmt(fmt: str) -> str:
    """chrono strftime -> Spark pattern (late import: vrl_map imports
    this module at load time)."""
    from vector_spark.functions.vrl_map import _strptime_java

    return _strptime_java(fmt)


def _to_ts(txt: Column, tfmt: str) -> Column:
    """to_timestamp with one shim: Spark >= 3 cannot PARSE day-of-week
    patterns (EEE), so a leading '%a ' (chrono) is dropped from both
    the pattern and the text — the day name is redundant with the date."""
    if tfmt.startswith("EEE "):
        return F.to_timestamp(
            F.regexp_replace(txt, r"^[A-Za-z]{3,9},?\s+", ""), tfmt[4:]
        )
    return F.to_timestamp(txt, tfmt)


def parse_apache_log(col: Column, format: str = "common",  # noqa: A002
                     timestamp_format: str | None = None) -> Column:
    """Apache access/error log line -> typed struct, the exact field
    set and names of the reference per format
    (parse_apache_log.rs:19-27 format dispatch, kinds at :147-186):

    - 'common' -> (host, identity, user, timestamp:timestamp, message,
      method, path, protocol, status:long, size:long). `message` is the
      full request text 'method SP path SP protocol' exactly as the
      reference's nested message group captures it (log_util.rs:23-27).
    - 'combined' -> common + (referrer, agent) (log_util.rs:44-62).
    - 'error' -> (timestamp, module, severity, pid:long, thread,
      client, port:long, message) — the flog-style simple variant
      (log_util.rs:76-89; pid/port are integers per capture_value).

    timestamp_format is a chrono strftime string (reference default
    '%d/%b/%Y:%T %z', parse_apache_log.rs:16); VRL integers are i64,
    hence long."""
    if timestamp_format is None:
        tfmt = "dd/MMM/yyyy:HH:mm:ss Z"
    else:
        from vector_spark.functions.vrl_map import _strptime_java

        tfmt = _strptime_java(timestamp_format)
    if format == "error":
        from vector_spark.functions.parse import parse_regex_onepass

        g = parse_regex_onepass(col, _APACHE_ERROR_RE, _APACHE_ERROR_GROUPS)
        return F.struct(
            _to_ts(g["timestamp"], tfmt).alias("timestamp"),
            g["module"].alias("module"),
            g["severity"].alias("severity"),
            g["pid"].try_cast("bigint").alias("pid"),
            g["thread"].alias("thread"),
            g["client"].alias("client"),
            g["port"].try_cast("bigint").alias("port"),
            g["message"].alias("message"),
        )
    if format not in ("common", "combined"):
        raise ValueError(f"unknown apache log format {format!r}")
    grok = APACHE_COMMON_GROK if format == "common" else APACHE_COMBINED_GROK
    g = grok_extract_native(col, grok)
    fields = [
        F.nullif(g["host"], F.lit("-")).alias("host"),
        F.nullif(g["identity"], F.lit("-")).alias("identity"),
        F.nullif(g["user"], F.lit("-")).alias("user"),
        _to_ts(g["timestamp"], tfmt).alias("timestamp"),
        F.concat(g["method"], F.lit(" "), g["path"], F.lit(" "),
                 g["protocol"]).alias("message"),
        g["method"].alias("method"),
        g["path"].alias("path"),
        g["protocol"].alias("protocol"),
        g["status"].try_cast("bigint").alias("status"),
        g["size"].try_cast("bigint").alias("size"),
    ]
    if format == "combined":
        fields += [
            F.nullif(g["referrer"], F.lit("-")).alias("referrer"),
            F.nullif(g["agent"], F.lit("-")).alias("agent"),
        ]
    return F.struct(*fields)


# VRL exposes common-log parsing both standalone and as the apache
# 'common' format; keep both names.
parse_common_log = parse_apache_log
PARSE_COMMON_LOG_TYPE = PARSE_APACHE_LOG_TYPE
PARSE_APACHE_LOG_TYPES.update({
    "common": PARSE_APACHE_LOG_TYPE,
    "combined": PARSE_APACHE_LOG_COMBINED_TYPE,
    "error": PARSE_APACHE_LOG_ERROR_TYPE,
})


# nginx 'combined' (log_util.rs:110-131): identity is ALWAYS a literal
# dash in nginx's combined format, and a third quoted field (gzip
# ratio, $gzip_ratio) may follow agent. regex semantics
# (literal_text=False) carry the optional group through.
NGINX_COMBINED_GROK = (
    r'%{NOTSPACE:client} - %{NOTSPACE:user} \[%{HTTPDATE:timestamp}\] '
    r'"%{WORD:method} %{NOTSPACE:path} %{NOTSPACE:protocol}" '
    r'%{INT:status} %{INT:size} "%{DATA:referer}" "%{DATA:agent}"'
    r'( "%{DATA:compression}")?'
)

PARSE_NGINX_LOG_TYPE = T.StructType([
    T.StructField("client", T.StringType()),
    T.StructField("user", T.StringType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("request", T.StringType()),
    T.StructField("method", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("protocol", T.StringType()),
    T.StructField("status", T.LongType()),
    T.StructField("size", T.LongType()),
    T.StructField("referer", T.StringType()),
    T.StructField("agent", T.StringType()),
    T.StructField("compression", T.StringType()),
])


# nginx error log (REGEX_NGINX_ERROR_LOG, log_util.rs:134-155):
# 'ts [severity] pid#tid: *cid message' + optional comma-separated
# context clauses (excess/zone, client, server, request, upstream,
# host, referer)
_NGINX_ERROR_RE = (
    r'^\s*(.+)\s+\[(\w+)\]\s+(\d+)#(\d+):(\s+\*(\d+))?\s+([^,]*)'
    r'(,\s+excess:\s+([^\s]+)\sby\szone\s"([^,]+)")?'
    r'(,\s+client:\s+([^,]+))?(,\s+server:\s+([^,]+))?'
    r'(,\s+request:\s+"([^"]+)")?(,\s+upstream:\s+"([^"]+)")?'
    r'(,\s+host:\s+"([^"]+)")?(,\s+refer?rer:\s+"([^"]+)")?\s*$'
)
_NGINX_ERROR_GROUPS = {
    "timestamp": 1, "severity": 2, "pid": 3, "tid": 4, "cid": 6,
    "message": 7, "excess": 9, "zone": 10, "client": 12, "server": 14,
    "request": 16, "upstream": 18, "host": 20, "referer": 22,
}

PARSE_NGINX_LOG_ERROR_TYPE = T.StructType([
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("severity", T.StringType()),
    T.StructField("pid", T.LongType()),
    T.StructField("tid", T.LongType()),
    T.StructField("cid", T.LongType()),
    T.StructField("message", T.StringType()),
    T.StructField("excess", T.DoubleType()),
    T.StructField("zone", T.StringType()),
    T.StructField("client", T.StringType()),
    T.StructField("server", T.StringType()),
    T.StructField("request", T.StringType()),
    T.StructField("upstream", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("referer", T.StringType()),
])

PARSE_NGINX_LOG_TYPES = {}  # filled after parse_nginx_log below


def parse_nginx_log(col: Column, format: str = "combined",  # noqa: A002
                    timestamp_format: str | None = None) -> Column:
    """nginx log line -> typed struct, the reference's field set and
    names per format (parse_nginx_log.rs:103-112 format dispatch):

    - 'combined' -> (client, user, timestamp:timestamp, request,
      method, path, protocol, status:long, size:long, referer, agent,
      compression) (kinds at :156-169; 'referer' single-r as in the
      nginx variable); '-' fields normalized to NULL. `request` is the
      full quoted request text (log_util.rs:119-123). Default stamp
      '%d/%b/%Y:%T %z'.
    - 'error' -> (timestamp, severity, pid:long, tid:long, cid:long,
      message, excess:double, zone, client, server, request, upstream,
      host, referer) per REGEX_NGINX_ERROR_LOG's capture set
      (log_util.rs:134-155; pid/tid/cid integers and excess float per
      capture_value). Default stamp '%Y/%m/%d %H:%M:%S'."""
    if format == "error":
        from vector_spark.functions.parse import parse_regex_onepass

        tfmt = ("yyyy/MM/dd HH:mm:ss" if timestamp_format is None
                else _strptime_fmt(timestamp_format))
        g = parse_regex_onepass(col, _NGINX_ERROR_RE, _NGINX_ERROR_GROUPS)
        return F.struct(
            _to_ts(g["timestamp"], tfmt).alias("timestamp"),
            g["severity"].alias("severity"),
            g["pid"].try_cast("bigint").alias("pid"),
            g["tid"].try_cast("bigint").alias("tid"),
            g["cid"].try_cast("bigint").alias("cid"),
            g["message"].alias("message"),
            g["excess"].try_cast("double").alias("excess"),
            g["zone"].alias("zone"),
            g["client"].alias("client"),
            g["server"].alias("server"),
            g["request"].alias("request"),
            g["upstream"].alias("upstream"),
            g["host"].alias("host"),
            g["referer"].alias("referer"),
        )
    if format != "combined":
        raise ValueError(f"unknown nginx log format {format!r}")
    g = grok_extract_native(col, NGINX_COMBINED_GROK, literal_text=False)
    tfmt = ("dd/MMM/yyyy:HH:mm:ss Z" if timestamp_format is None
            else _strptime_fmt(timestamp_format))
    return F.struct(
        F.nullif(g["client"], F.lit("-")).alias("client"),
        F.nullif(g["user"], F.lit("-")).alias("user"),
        _to_ts(g["timestamp"], tfmt).alias("timestamp"),
        F.concat(g["method"], F.lit(" "), g["path"], F.lit(" "),
                 g["protocol"]).alias("request"),
        g["method"].alias("method"),
        g["path"].alias("path"),
        g["protocol"].alias("protocol"),
        g["status"].try_cast("bigint").alias("status"),
        g["size"].try_cast("bigint").alias("size"),
        F.nullif(g["referer"], F.lit("-")).alias("referer"),
        F.nullif(g["agent"], F.lit("-")).alias("agent"),
        F.nullif(F.nullif(g["compression"], F.lit("")), F.lit("-"))
        .alias("compression"),
    )


PARSE_NGINX_LOG_TYPES.update({
    "combined": PARSE_NGINX_LOG_TYPE,
    "error": PARSE_NGINX_LOG_ERROR_TYPE,
})


# severity/facility keyword tables — syslog_loose's as_str() names,
# which parse_syslog.rs:109-115 surfaces verbatim ("notice", "user");
# the facility table differs from to_syslog_facility.rs's at codes
# 13-15 (audit/alert/clockd), hence a separate list from vrl_compat's
_SYSLOG_SEVERITY_NAMES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]
_SYSLOG_FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clockd",
] + [f"local{i}" for i in range(8)]

# RFC5424: <pri>VERSION SP TIMESTAMP SP HOSTNAME SP APP-NAME SP PROCID
# SP MSGID SP STRUCTURED-DATA [SP MSG]; nil fields are '-', SD is '-'
# or [..] blocks (no unescaped ']' inside an element). Unanchored BODY:
# parse_syslog composes it into one anchored alternation with the
# RFC3164 grok so both dialects cost a single regex pass (groups 1-9).
_SYSLOG_5424_BODY = (
    r"<(\d{1,3})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) "
    r"(-|(?:\[[^\]]*\])+)(?: (.*))?"
)

PARSE_SYSLOG_TYPE = T.StructType([
    T.StructField("message", T.StringType()),
    T.StructField("hostname", T.StringType()),
    T.StructField("severity", T.StringType()),
    T.StructField("facility", T.StringType()),
    T.StructField("appname", T.StringType()),
    T.StructField("procid", T.LongType()),
    T.StructField("msgid", T.StringType()),
    T.StructField("version", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("tstxt", T.StringType()),
])


def _code_name(code: Column, names: list) -> Column:
    out = F.when(code == 0, F.lit(names[0]))
    for i, name in enumerate(names[1:], start=1):
        out = out.when(code == i, F.lit(name))
    return out.otherwise(F.lit(None).cast("string"))


def parse_syslog(col: Column) -> Column:
    """Syslog line (RFC5424 or RFC3164 dialect, auto-detected) ->
    struct(message, hostname, severity, facility, appname, procid:long,
    msgid, version:long, timestamp:timestamp, tstxt) — the reference's
    field names and value kinds (parse_syslog.rs:103-165: severity and
    facility are syslog_loose KEYWORDS like 'notice'/'user', hostname
    not host). Two additions the static schema affords: `tstxt` keeps
    the raw stamp text for RFC3164 lines (which carry no year or zone —
    resolving them is the caller's policy), and `procid` is long
    (numeric procids; alphanumeric RFC5424 PROCIDs null out). RFC5424
    STRUCTURED-DATA elements become dynamic root keys in the reference;
    a static schema cannot grow per-row columns, so SD is matched but
    not expanded.

    ONE regex pass for both dialects: the RFC5424 body and the
    compiled RFC3164 grok join into a single anchored alternation
    (`^(?:5424)$|^(?:3164)$` — ordered like syslog_loose, RFC5424
    first), applied once via the sentinel-replace trick; every output
    field indexes the shared split array, which is bound as a lambda
    variable via parse.bind_once so the alternation executes exactly
    once per row. Plain struct-field references are NOT enough: the
    nullif/coalesce wrappers are CaseWhen sugar, and Spark's
    subexpression elimination skips conditional branches, so after
    SimplifyExtractValueOps inlines the projected fields the regex
    re-ran once per field (bench: 1.9 s -> 48 s at sf0.1, 600k
    lines; bind_once restores the one-pass floor)."""
    from vector_spark.functions.grok import _capture_indices, grok_to_regex
    from vector_spark.functions.parse import bind_once

    re3, f3names = grok_to_regex(SYSLOG_3164_GROK, flavor="java")
    idx3 = _capture_indices(re3)
    off = 9  # capture groups in _SYSLOG_5424_BODY
    combined = f"^(?:{_SYSLOG_5424_BODY})$|^(?:{re3})$"
    pos3 = {
        name: off + idx3[f"g{i}"] for i, name in enumerate(f3names, start=1)
    }
    # arr slot order: 5424 pri/version/timestamp/hostname/appname/
    # procid/msgid/message ($8 = SD, matched but not extracted), then
    # the 3164 fields
    order = [1, 2, 3, 4, 5, 6, 7, 9,
             pos3["pri"], pos3["tstxt"], pos3["host"],
             pos3["program"], pos3["pid"], pos3["message"]]
    sep = "\x01"
    repl = sep.join(f"${g}" for g in order)
    arr = F.when(
        col.rlike(combined),
        F.split(F.regexp_replace(col, combined, repl), sep, -1),
    )

    def build(a: Column) -> Column:
        def slot(i):  # 1-based position in `order`; ''/missing -> NULL
            return F.nullif(F.try_element_at(a, F.lit(i)), F.lit(""))

        def nil(c):
            return F.nullif(c, F.lit("-"))

        pri = F.coalesce(slot(1), slot(9)).try_cast("int")
        return F.struct(
            F.coalesce(slot(8), slot(14)).alias("message"),
            nil(F.coalesce(slot(4), slot(11))).alias("hostname"),
            _code_name(F.pmod(pri, F.lit(8)), _SYSLOG_SEVERITY_NAMES)
            .alias("severity"),
            _code_name(F.floor(pri / 8).cast("int"), _SYSLOG_FACILITY_NAMES)
            .alias("facility"),
            nil(F.coalesce(slot(5), slot(12))).alias("appname"),
            nil(F.coalesce(slot(6), slot(13))).try_cast("bigint")
            .alias("procid"),
            nil(slot(7)).alias("msgid"),
            slot(2).try_cast("bigint").alias("version"),
            F.try_to_timestamp(nil(slot(3))).alias("timestamp"),
            F.coalesce(nil(slot(3)), slot(10)).alias("tstxt"),
        )

    return bind_once(arr, build)


def parse_logfmt(col: Column) -> Column:
    """logfmt line 'a=1 b=two' -> map<string,string>
    (parse_logfmt.rs; lenient: bare tokens without '=' are dropped)."""
    return parse_key_value(col, pair_sep=" ", kv_sep="=")


# plain numbered groups: this pattern feeds JVM regexp_extract, and
# Java's regex dialect rejects python's (?P<name>...) syntax
_GLOG_RE = (
    r"^([IWEF])(\d{2})(\d{2}) "
    r"(\d{2}:\d{2}:\d{2}\.\d{6})\s+"
    r"(\d+) ([^:]+):(\d+)\] (.*)$"
)
PARSE_GLOG_TYPE = T.StructType([
    T.StructField("level", T.StringType()),
    T.StructField("month", T.IntegerType()),
    T.StructField("day", T.IntegerType()),
    T.StructField("timetxt", T.StringType()),
    T.StructField("thread_id", T.LongType()),
    T.StructField("file", T.StringType()),
    T.StructField("line", T.IntegerType()),
    T.StructField("message", T.StringType()),
])


def parse_glog(col: Column) -> Column:
    """Google glog line 'I0210 13:55:36.123456  12 file.cc:42] msg' ->
    struct(level, month:int, day:int, timetxt, thread_id:long, file,
    line:int, message). kubernetes klog uses the identical layout
    (parse_glog.rs / parse_klog.rs; year is not on the wire — resolving
    it is the caller's policy, as in the reference)."""
    from vector_spark.functions.parse import parse_regex_onepass

    groups = {
        "level": 1, "month": 2, "day": 3, "timetxt": 4,
        "thread_id": 5, "file": 6, "line": 7, "message": 8,
    }
    g = parse_regex_onepass(col, _GLOG_RE, groups)
    level = g["level"]
    level_name = (
        F.when(level == "I", "info")
        .when(level == "W", "warning")
        .when(level == "E", "error")
        .when(level == "F", "fatal")
    )
    return F.struct(
        level_name.alias("level"),
        g["month"].try_cast("int").alias("month"),
        g["day"].try_cast("int").alias("day"),
        g["timetxt"].alias("timetxt"),
        g["thread_id"].try_cast("bigint").alias("thread_id"),
        g["file"].alias("file"),
        g["line"].try_cast("int").alias("line"),
        g["message"].alias("message"),
    )


# klog (kubernetes) is the glog layout
parse_klog = parse_glog
PARSE_KLOG_TYPE = PARSE_GLOG_TYPE


PARSE_CEF_TYPE = T.StructType([
    T.StructField("cef_version", T.IntegerType()),
    T.StructField("device_vendor", T.StringType()),
    T.StructField("device_product", T.StringType()),
    T.StructField("device_version", T.StringType()),
    T.StructField("signature_id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("severity", T.StringType()),
    T.StructField("extension", T.MapType(T.StringType(), T.StringType())),
])


def parse_cef(col: Column) -> Column:
    """ArcSight CEF header 'CEF:v|vendor|product|version|sig|name|sev|ext'
    -> struct(cef_version:int, device_vendor, device_product,
    device_version, signature_id, name, severity, extension:map).
    Escaped pipes (\\|) inside header fields are out of this split-based
    scope (parse_cef.rs handles them; the extension kv map is the part
    pipelines actually route on)."""
    body = F.regexp_extract(col, r"^CEF:(.*)$", 1)
    parts = F.split(body, r"\|", 8)
    ok = F.size(parts) >= 8
    ext = parse_key_value(F.element_at(parts, 8), pair_sep=" ", kv_sep="=")
    return F.struct(
        F.when(ok, F.element_at(parts, 1).try_cast("int")).alias("cef_version"),
        F.when(ok, F.element_at(parts, 2)).alias("device_vendor"),
        F.when(ok, F.element_at(parts, 3)).alias("device_product"),
        F.when(ok, F.element_at(parts, 4)).alias("device_version"),
        F.when(ok, F.element_at(parts, 5)).alias("signature_id"),
        F.when(ok, F.element_at(parts, 6)).alias("name"),
        F.when(ok, F.element_at(parts, 7)).alias("severity"),
        F.when(ok, ext).alias("extension"),
    )


_VPC_FLOW_FIELDS = [
    ("version", "int"), ("account_id", "string"), ("interface_id", "string"),
    ("srcaddr", "string"), ("dstaddr", "string"), ("srcport", "int"),
    ("dstport", "int"), ("protocol", "int"), ("packets", "bigint"),
    ("bytes", "bigint"), ("start", "bigint"), ("end", "bigint"),
    ("action", "string"), ("log_status", "string"),
]


_T_BY_NAME = {
    "int": T.IntegerType(), "bigint": T.LongType(),
    "double": T.DoubleType(), "string": T.StringType(),
}
PARSE_AWS_VPC_FLOW_LOG_TYPE = T.StructType(
    [T.StructField(n, _T_BY_NAME[t]) for n, t in _VPC_FLOW_FIELDS]
)


def parse_aws_vpc_flow_log(col: Column) -> Column:
    """AWS VPC flow log v2 default format (14 space-delimited fields)
    -> typed struct; '-' fields normalized to NULL
    (parse_aws_vpc_flow_log.rs)."""
    parts = F.split(F.trim(col), r"\s+")
    ok = F.size(parts) == len(_VPC_FLOW_FIELDS)
    out = []
    for i, (name, typ) in enumerate(_VPC_FLOW_FIELDS, start=1):
        v = F.nullif(F.element_at(parts, i), F.lit("-"))
        if typ != "string":
            v = v.try_cast(typ)
        out.append(F.when(ok, v).alias(name))
    return F.struct(*out)


# linux authorization logs (auth.log) are RFC3164 syslog lines; the
# reference's preset is syslog parsing plus auth-specific enrichment
parse_linux_authorization = parse_syslog
PARSE_LINUX_AUTHORIZATION_TYPE = PARSE_SYSLOG_TYPE
PARSE_LOGFMT_TYPE = T.MapType(T.StringType(), T.StringType())


# ALB core fields: type .. ssl_protocol plus the quoted request split
# into method/url/version (the remaining ~13 optional fields — ARNs,
# trace ids, redirect/error detail — follow the same quoted/unquoted
# grammar; extend the regex on demand, parse_aws_alb_log.rs covers all)
_ALB_RE = (
    r'^(\S+) (\S+) (\S+) ([^ :]+):(\d+|-) ([^ ]+) '
    r'([\d.-]+) ([\d.-]+) ([\d.-]+) (\d+|-) (\d+|-) (\d+) (\d+) '
    r'"(\S+) (\S+) (\S+)" "([^"]*)" (\S+) (\S+)'
)
_ALB_FIELDS = [
    ("type", "string"), ("time", "string"), ("elb", "string"),
    ("client_ip", "string"), ("client_port", "int"), ("target", "string"),
    ("request_processing_time", "double"), ("target_processing_time", "double"),
    ("response_processing_time", "double"), ("elb_status_code", "int"),
    ("target_status_code", "int"), ("received_bytes", "bigint"),
    ("sent_bytes", "bigint"), ("method", "string"), ("url", "string"),
    ("http_version", "string"), ("user_agent", "string"),
    ("ssl_cipher", "string"), ("ssl_protocol", "string"),
]


PARSE_AWS_ALB_LOG_TYPE = T.StructType(
    [T.StructField(n, _T_BY_NAME[t]) for n, t in _ALB_FIELDS]
)


def parse_aws_alb_log(col: Column) -> Column:
    """AWS ALB access-log core fields -> typed struct; '-' -> NULL
    (parse_aws_alb_log.rs)."""
    from vector_spark.functions.parse import parse_regex_onepass

    groups = {name: i for i, (name, _) in enumerate(_ALB_FIELDS, start=1)}
    g = parse_regex_onepass(col, _ALB_RE, groups)
    out = []
    for name, typ in _ALB_FIELDS:
        v = F.nullif(g[name], F.lit("-"))
        if typ != "string":
            v = v.try_cast(typ)
        out.append(v.alias(name))
    return F.struct(*out)
