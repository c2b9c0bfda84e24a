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

from vector_spark.functions.grok import grok_extract_native
from vector_spark.functions.parse import parse_key_value

# status/bytes are NOTSPACE, not INT: real CLF emits '-' for bytes on
# 204/304 responses (and some servers for status), and the reference's
# REGEX_APACHE_COMMON_LOG (src/sources/util/http/log_util.rs:29-30)
# accepts '-' per field and leaves that field null rather than failing
# the whole line. try_cast below turns '-' into NULL, matching that
# field-level leniency.
APACHE_COMMON_GROK = (
    '%{IP:client} %{NOTSPACE:ident} %{NOTSPACE:auth} '
    '[%{HTTPDATE:tstxt}] "%{WORD:method} %{NOTSPACE:path} '
    'HTTP/%{NUMBER:httpversion}" %{NOTSPACE:status} %{NOTSPACE:bytes}'
)

SYSLOG_3164_GROK = (
    "<%{POSINT:pri}>%{SYSLOGTIMESTAMP:tstxt} %{NOTSPACE:host} "
    "%{SYSLOGPROG}: %{GREEDYDATA:message}"
)


def parse_apache_log(col: Column) -> Column:
    """Apache/nginx Common Log Format line -> struct(client, ident,
    auth, ts:timestamp, method, path, httpversion, status:int,
    bytes:long). (parse_apache_log.rs 'common' format.)"""
    g = grok_extract_native(col, APACHE_COMMON_GROK)
    return F.struct(
        g["client"].alias("client"),
        F.nullif(g["ident"], F.lit("-")).alias("ident"),
        F.nullif(g["auth"], F.lit("-")).alias("auth"),
        F.to_timestamp(g["tstxt"], "dd/MMM/yyyy:HH:mm:ss Z").alias("ts"),
        g["method"].alias("method"),
        g["path"].alias("path"),
        g["httpversion"].alias("httpversion"),
        g["status"].try_cast("int").alias("status"),
        g["bytes"].try_cast("bigint").alias("bytes"),
    )


# VRL exposes common-log parsing both standalone and as the apache
# 'common' format; keep both names.
parse_common_log = parse_apache_log


NGINX_COMBINED_GROK = (
    APACHE_COMMON_GROK + ' "%{DATA:referrer}" "%{DATA:agent}"'
)


def parse_nginx_log(col: Column) -> Column:
    """nginx 'combined' access-log line (CLF + quoted referrer and
    user-agent) -> the apache struct plus referrer/agent; '-' fields
    normalized to NULL. (parse_nginx_log.rs 'combined' format.)"""
    g = grok_extract_native(col, NGINX_COMBINED_GROK)
    return F.struct(
        g["client"].alias("client"),
        F.nullif(g["ident"], F.lit("-")).alias("ident"),
        F.nullif(g["auth"], F.lit("-")).alias("auth"),
        F.to_timestamp(g["tstxt"], "dd/MMM/yyyy:HH:mm:ss Z").alias("ts"),
        g["method"].alias("method"),
        g["path"].alias("path"),
        g["httpversion"].alias("httpversion"),
        g["status"].try_cast("int").alias("status"),
        g["bytes"].try_cast("bigint").alias("bytes"),
        F.nullif(g["referrer"], F.lit("-")).alias("referrer"),
        F.nullif(g["agent"], F.lit("-")).alias("agent"),
    )


def parse_syslog(col: Column) -> Column:
    """RFC3164-ish syslog line '<pri>MMM dd HH:mm:ss host app: msg' ->
    struct(pri:int, facility:int, severity:int, tstxt, host, appname,
    procid, message). The SYSLOGPROG composite splits 'app[pid]' into
    appname + procid like the reference. Timestamp is left textual:
    RFC3164 stamps carry no year or zone — resolving them is a policy
    decision for the caller.
    (parse_syslog.rs; severity/facility split per RFC5424 PRI.)"""
    g = grok_extract_native(col, SYSLOG_3164_GROK)
    pri = g["pri"].try_cast("int")
    return F.struct(
        pri.alias("pri"),
        F.floor(pri / 8).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        g["tstxt"].alias("tstxt"),
        g["host"].alias("host"),
        g["program"].alias("appname"),
        g["pid"].try_cast("bigint").alias("procid"),
        g["message"].alias("message"),
    )


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
def parse_glog(col: Column) -> Column:
    """Google glog line 'I0210 13:55:36.123456  12 file.cc:42] msg' ->
    struct(level, month:int, day:int, timetxt, thread_id:long, file,
    line:int, message). kubernetes klog uses the identical layout
    (parse_glog.rs / parse_klog.rs; year is not on the wire — resolving
    it is the caller's policy, as in the reference)."""
    from vector_spark.functions.parse import parse_regex

    groups = {
        "level": 1, "month": 2, "day": 3, "timetxt": 4,
        "thread_id": 5, "file": 6, "line": 7, "message": 8,
    }
    g = parse_regex(col, _GLOG_RE, groups)
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


def parse_aws_alb_log(col: Column) -> Column:
    """AWS ALB access-log core fields -> typed struct; '-' -> NULL
    (parse_aws_alb_log.rs)."""
    from vector_spark.functions.parse import parse_regex

    groups = {name: i for i, (name, _) in enumerate(_ALB_FIELDS, start=1)}
    g = parse_regex(col, _ALB_RE, groups)
    out = []
    for name, typ in _ALB_FIELDS:
        v = F.nullif(g[name], F.lit("-"))
        if typ != "string":
            v = v.try_cast(typ)
        out.append(v.alias(name))
    return F.struct(*out)
