"""Complete VRL stdlib -> Spark mapping registry.

One entry per function file in the reference's stdlib
(lib/vrl/stdlib/src/<name>.rs, registry lib/vrl/stdlib/src/lib.rs:611+),
so "can I do X here?" has a single greppable answer. Each entry:

  kind:  'native'   — direct pyspark.sql.functions expression (fn given)
         'compose'  — built from this repo's helpers (fn given)
         'udf'      — Arrow-vectorized pandas UDF in this repo (fn given)
         'path'     — VRL event-path CRUD; in a fixed-schema DataFrame
                      world this is a DataFrame/Column operation, noted
         'driver'   — resolved driver-side at plan build (literal)
         'scope'    — deliberately out of scope, with the reason
  spark: the concrete Spark expression / API to use

Functions with fn callables are directly usable:
`VRL[name].fn(col, ...)` returns a Column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import functions as F

from vector_spark.functions import vrl_compat as V
from vector_spark.functions.parse import parse_json_col, parse_key_value, parse_regex
from vector_spark.functions.presets import (
    parse_apache_log,
    parse_aws_alb_log,
    parse_aws_vpc_flow_log,
    parse_cef,
    parse_common_log,
    parse_glog,
    parse_klog,
    parse_linux_authorization,
    parse_logfmt,
    parse_nginx_log,
    parse_syslog,
)


@dataclass(frozen=True)
class VrlFn:
    kind: str
    spark: str
    fn: Callable | None = None


def _grok(col, pattern):
    from vector_spark.functions.grok import grok_extract_pandas

    return grok_extract_pandas(col, pattern)


_STRP = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "I": "hh", "l": "h", "M": "mm", "S": "ss",
    "p": "a", "P": "a", "b": "MMM", "h": "MMM", "B": "MMMM",
    "a": "EEE", "A": "EEEE", "j": "DDD",
    "z": "xx", "Z": "zzz", "T": "HH:mm:ss", "R": "HH:mm",
    "D": "MM/dd/yy", "F": "yyyy-MM-dd", "%": "'%'", "t": "\t", "n": "\n",
}


def _strptime_java(fmt: str) -> str:
    """chrono strftime (VRL's parse_timestamp dialect) -> Java
    DateTimeFormatter pattern. Literal letters are single-quoted so
    'T'/'Z' separators survive; %.3f/%3f fraction forms map to S runs."""
    out, lit = [], []

    def flush():
        if lit:
            s = "".join(lit)
            if any(c.isalpha() for c in s):
                out.append("'" + s.replace("'", "''") + "'")
            else:
                out.append(s)
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] != "%":
            lit.append(fmt[i])
            i += 1
            continue
        rest = fmt[i + 1:]
        flush()
        if rest[:1] == ":" and rest[1:2] == "z":
            out.append("xxx")
            i += 3
        elif rest[:1] == "+":
            # chrono %+ = RFC3339 ("%Y-%m-%dT%H:%M:%S%.f%:z"); Spark's
            # pattern dialect has no optional fraction section, so map
            # the whole-second form (XXX accepts both '+00:00' and 'Z')
            out.append("yyyy-MM-dd'T'HH:mm:ssXXX")
            i += 2
        elif rest[:1] == "." and rest[1:2] in "369" and rest[2:3] == "f":
            out.append("." + "S" * int(rest[1]))
            i += 4
        elif rest[:1] in "369" and rest[1:2] == "f":
            out.append("S" * int(rest[0]))
            i += 3
        elif rest[:1] == "f":
            out.append("SSSSSSSSS")
            i += 2
        elif rest[:1] in _STRP:
            out.append(_STRP[rest[0]])
            i += 2
        else:
            lit.append(fmt[i])  # unknown spec: keep verbatim
            i += 1
    flush()
    return "".join(out)


def _ts_fmt(f):
    # VRL programs use chrono strftime; the Java dialect (golden tests,
    # direct Column use) has no '%' and passes through untouched
    return _strptime_java(f) if isinstance(f, str) and "%" in f else f


def _encode_json_any(s):
    """encode_json over ANY input type: wrap in a 1-element array so
    to_json accepts scalars (strings get proper JSON quoting/escaping),
    then strip the enclosing brackets."""
    j = F.to_json(F.array(s))
    return j.substr(F.lit(2), F.length(j) - F.lit(2))


VRL: dict[str, VrlFn] = {
    # --- parsing ---------------------------------------------------------
    "parse_grok": VrlFn("udf", "grok.grok_extract_pandas (compiled regex, Arrow)", _grok),
    "parse_groks": VrlFn("udf", "grok.parse_groks_pandas (first-match-wins, one Arrow crossing, aliases supported)", lambda c, ps, aliases=None, literal_text=True: __import__("vector_spark.functions.grok", fromlist=["parse_groks_pandas"]).parse_groks_pandas(c, ps, aliases=aliases, literal_text=literal_text)),
    "parse_regex": VrlFn("compose", "parse.parse_regex -> struct", parse_regex),
    "parse_regex_all": VrlFn("native", "F.regexp_extract_all", lambda c, r, i=1: F.regexp_extract_all(c, F.lit(r), i)),
    "parse_json": VrlFn("native", "F.from_json / get_json_object", parse_json_col),
    # escape='"' matches VRL's RFC4180 doubled-quote escaping (Spark's
    # default escape is backslash — golden-corpus replay caught it)
    "parse_csv": VrlFn("native", "F.from_csv(options={'escape': '\"'})", lambda c, s, o=None: F.from_csv(c, s, o or {"escape": '"'})),
    "parse_key_value": VrlFn("compose", "parse.parse_key_value -> map", parse_key_value),
    "parse_logfmt": VrlFn("compose", "presets.parse_logfmt", parse_logfmt),
    "parse_timestamp": VrlFn("native", "F.to_timestamp(fmt); strptime formats auto-converted", lambda c, f=None, format=None: F.to_timestamp(c, _ts_fmt(format if format is not None else f))),
    "parse_duration": VrlFn("compose", "vrl_compat.parse_duration", V.parse_duration),
    "parse_int": VrlFn("compose", "vrl_compat.parse_int (F.conv)", V.parse_int),
    "parse_url": VrlFn("compose", "vrl_compat.parse_url (F.parse_url)", V.parse_url),
    "parse_query_string": VrlFn("compose", "vrl_compat.parse_query_string (split + url_decode -> map)", V.parse_query_string),
    "parse_apache_log": VrlFn("compose", "presets.parse_apache_log (typed CLF struct)", parse_apache_log),
    "parse_common_log": VrlFn("compose", "presets.parse_common_log", parse_common_log),
    "parse_nginx_log": VrlFn("compose", "presets.parse_nginx_log (combined format struct)", parse_nginx_log),
    "parse_syslog": VrlFn("compose", "presets.parse_syslog (RFC3164 struct)", parse_syslog),
    "parse_tokens": VrlFn("compose", "vrl_compat.parse_tokens (tokenize.rs grammar: quoted/bracketed groups, '-' -> null)", V.parse_tokens),
    "parse_glog": VrlFn("compose", "presets.parse_glog (typed struct)", parse_glog),
    "parse_klog": VrlFn("compose", "presets.parse_klog (= glog layout)", parse_klog),
    "parse_cef": VrlFn("compose", "presets.parse_cef (header split + extension kv map)", parse_cef),
    "parse_linux_authorization": VrlFn("compose", "presets.parse_linux_authorization (= syslog layout)", parse_linux_authorization),
    "parse_aws_alb_log": VrlFn("compose", "presets.parse_aws_alb_log (typed core-field struct)", parse_aws_alb_log),
    "parse_aws_cloudwatch_log_subscription_message": VrlFn("compose", "vrl_compat.parse_aws_cloudwatch_log_subscription_message (camelCase JSON -> snake_case struct, ms->timestamp)", V.parse_aws_cloudwatch_log_subscription_message),
    "parse_aws_vpc_flow_log": VrlFn("compose", "presets.parse_aws_vpc_flow_log (typed struct)", parse_aws_vpc_flow_log),
    "parse_ruby_hash": VrlFn("compose", "vrl_compat.parse_ruby_hash (syntax rewrite -> try_parse_json VARIANT; heuristic, documented)", V.parse_ruby_hash),
    "parse_xml": VrlFn("udf", "vrl_compat.parse_xml (stdlib ElementTree -> JSON string, @attr/text_key mapping per reference)", V.parse_xml),
    "parse_user_agent": VrlFn("compose", "vrl_compat.parse_user_agent (regex family tables, JVM-side; heuristic vs the reference UA db — documented)", V.parse_user_agent),
    # --- string ----------------------------------------------------------
    "downcase": VrlFn("native", "F.lower", F.lower),
    "upcase": VrlFn("native", "F.upper", F.upper),
    "contains": VrlFn("native", "F.contains / instr>0", lambda c, s: F.instr(c, s) > 0),
    "starts_with": VrlFn("native", "F.startswith", lambda c, s: c.startswith(s)),
    "ends_with": VrlFn("native", "F.endswith", lambda c, s: c.endswith(s)),
    "split": VrlFn("native", "F.split", F.split),
    "join": VrlFn("native", "F.array_join / concat_ws", lambda c, sep: F.array_join(c, sep)),
    "replace": VrlFn("native", "F.regexp_replace", F.regexp_replace),
    "slice": VrlFn("native", "F.slice(arr, start+1, end-start) / substring for strings (non-negative indices)", lambda c, start, end: F.slice(c, start + 1, end - start)),
    "strlen": VrlFn("native", "F.length", F.length),
    "length": VrlFn("native", "F.length (string) / F.size (array/map)", lambda c, collection=False: F.size(c) if collection else F.length(c)),
    "strip_whitespace": VrlFn("compose", "vrl_compat.strip_whitespace (all-whitespace trim; F.trim only strips spaces)", V.strip_whitespace),
    "strip_ansi_escape_codes": VrlFn("compose", "vrl_compat.strip_ansi_escape_codes", V.strip_ansi_escape_codes),
    "truncate": VrlFn("compose", "vrl_compat.truncate", V.truncate),
    "find": VrlFn("compose", "vrl_compat.find (0-based, -1 miss)", V.find),
    "match": VrlFn("native", "Column.rlike / F.regexp_like (dynamic pattern)", lambda c, r: c.rlike(r) if isinstance(r, str) else F.regexp_like(c, r)),
    "match_any": VrlFn("compose", "OR of rlikes", lambda c, rs: __import__("functools").reduce(lambda a, b: a | b, [c.rlike(r) for r in rs])),
    "match_array": VrlFn("compose", "F.exists(arr, x -> x.rlike(r))", lambda c, r: F.exists(c, lambda x: x.rlike(r))),
    "match_datadog_query": VrlFn("compose", "conditions.datadog_search.dd_query(query, df) — full query->Column compiler (takes the DataFrame for schema resolution, not a single column)", lambda q, df=None: __import__("vector_spark.conditions", fromlist=["dd_query"]).dd_query(q, df)),
    "redact": VrlFn("compose", "vrl_compat.redact", V.redact),
    "chunks": VrlFn("compose", "vrl_compat.chunks_str (sequence+substring transform; chars not bytes — documented)", V.chunks_str),
    "reverse_dns": VrlFn("scope", "network lookup; env-dependent", None),
    # --- codecs / crypto -------------------------------------------------
    "encode_base64": VrlFn("compose", "vrl_compat.encode_base64", V.encode_base64),
    "decode_base64": VrlFn("compose", "vrl_compat.decode_base64", V.decode_base64),
    "encode_json": VrlFn("native", "F.to_json via 1-array wrap (works for scalars too: [x] -> strip brackets)", lambda s: _encode_json_any(s)),
    "encode_key_value": VrlFn("compose", "codecs.encode_kv_map", lambda m: __import__("vector_spark.sources.codecs", fromlist=["encode_kv_map"]).encode_kv_map(m)),
    "encode_logfmt": VrlFn("compose", "codecs.encode_kv_map (sorted k=v; logfmt form)", lambda m: __import__("vector_spark.sources.codecs", fromlist=["encode_kv_map"]).encode_kv_map(m)),
    "encode_percent": VrlFn("compose", "vrl_compat.encode_percent (F.url_encode)", V.encode_percent),
    "decode_percent": VrlFn("compose", "vrl_compat.decode_percent (F.url_decode)", V.decode_percent),
    "decode_mime_q": VrlFn("udf", "vrl_compat.decode_mime_q (RFC2047, stdlib quopri/base64 via Arrow UDF)", V.decode_mime_q),
    "md5": VrlFn("native", "F.md5", F.md5),
    "sha1": VrlFn("native", "F.sha1", F.sha1),
    "sha2": VrlFn("native", "F.sha2", F.sha2),
    "sha3": VrlFn("udf", "vrl_compat.sha3 (hashlib sha3, Arrow pandas UDF; default SHA3-512)", V.sha3),
    "encrypt": VrlFn("native", "F.aes_encrypt (JVM AES; GCM/CBC/ECB modes — the reference adds CFB/CTR variants, documented dialect)", lambda c, key, mode="GCM": F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit(mode))),
    "decrypt": VrlFn("native", "F.aes_decrypt", lambda c, key, mode="GCM": F.aes_decrypt(c, F.lit(key), F.lit(mode)).cast("string")),
    "random_bytes": VrlFn("scope", "nondeterministic by design; F.rand-seeded UDF at need", None),
    # --- numeric ---------------------------------------------------------
    "ceil": VrlFn("native", "F.ceil", F.ceil),
    "floor": VrlFn("native", "F.floor", F.floor),
    "round": VrlFn("native", "F.round", F.round),
    "mod_func": VrlFn("native", "F.pmod / %", F.pmod),
    "log": VrlFn("driver", "VRL log() emits to the host's log (side effect, returns null); Spark analogue is df.observe / log4j, not a Column fn", None),
    "format_int": VrlFn("compose", "vrl_compat.format_int (sign-preserving F.conv)", V.format_int),
    "format_number": VrlFn("native", "F.format_number", F.format_number),
    # --- type conversion / introspection ---------------------------------
    "to_bool": VrlFn("compose", "vrl_compat.to_bool (yes/y/1-style coercions)", V.to_bool),
    "to_float": VrlFn("native", "cast('double')", lambda c: c.cast("double")),
    "to_int": VrlFn("native", "cast('bigint')", lambda c: c.cast("bigint")),
    "to_string": VrlFn("native", "cast('string')", lambda c: c.cast("string")),
    "to_timestamp": VrlFn("compose", "vrl_compat.to_timestamp_auto (the reference's automatic format ladder incl. UNIX seconds and Common Log)", V.to_timestamp_auto),
    "to_unix_timestamp": VrlFn("native", "F.unix_timestamp", F.unix_timestamp),
    "to_regex": VrlFn("scope", "regex literals live in expressions, not columns", None),
    "boolean": VrlFn("native", "cast + isnull assert (type assertion)", None),
    "integer": VrlFn("native", "cast + isnull assert", None),
    "float": VrlFn("native", "cast + isnull assert", None),
    "string": VrlFn("native", "cast + isnull assert", None),
    "array": VrlFn("native", "type assertion; schema-known in DataFrames", None),
    "object": VrlFn("native", "type assertion; schema-known in DataFrames", None),
    "timestamp": VrlFn("native", "type assertion; schema-known in DataFrames", None),
    "is_array": VrlFn("driver", "schema-known constant per column", None),
    "is_boolean": VrlFn("driver", "schema-known constant per column", None),
    "is_float": VrlFn("driver", "schema-known constant per column", None),
    "is_integer": VrlFn("driver", "schema-known constant per column", None),
    "is_object": VrlFn("driver", "schema-known constant per column", None),
    "is_regex": VrlFn("driver", "schema-known constant per column", None),
    "is_string": VrlFn("driver", "schema-known constant per column", None),
    "is_timestamp": VrlFn("driver", "schema-known constant per column", None),
    "is_json": VrlFn("native", "F.try_parse_json(c).isNotNull()", lambda c: F.try_parse_json(c).isNotNull()),
    "is_null": VrlFn("native", "Column.isNull", lambda c: c.isNull()),
    "is_empty": VrlFn("compose", "length(c)==0 (string form)", lambda c: F.length(c) == 0),
    "is_nullish": VrlFn("compose", "vrl_compat.is_nullish", V.is_nullish),
    "is_ipv4": VrlFn("compose", "rlike(ipv4 regex)", lambda c: c.rlike(r"^(\d{1,3}\.){3}\d{1,3}$")),
    "is_ipv6": VrlFn("native", "rlike(ipv6 heuristic regex)", lambda c: c.rlike(r"^(?:[0-9a-fA-F]{0,4}:){2,7}[0-9a-fA-F.:]*$")),
    "tag_types_externally": VrlFn("native", "struct-wrap per type (to_json shape)", None),
    "type_def": VrlFn("driver", "VRL-internal type reflection == DataFrame schema", None),
    # --- collections / event paths ---------------------------------------
    "append": VrlFn("native", "F.concat(arrays)", lambda a, b: F.concat(a, b)),
    "push": VrlFn("native", "F.array_append", lambda a, x: F.array_append(a, x)),
    "compact": VrlFn("native", "F.array_compact / map_filter", F.array_compact),
    "flatten": VrlFn("native", "F.flatten", F.flatten),
    "includes": VrlFn("native", "F.array_contains", F.array_contains),
    "keys": VrlFn("native", "F.map_keys", F.map_keys),
    "values": VrlFn("native", "F.map_values", F.map_values),
    "map_keys": VrlFn("native", "F.transform_keys (VRL's 1-arg |key| closure)", lambda m, f: F.transform_keys(m, lambda k, v: f(k))),
    "map_values": VrlFn("native", "F.transform_values (VRL's 1-arg |value| closure)", lambda m, f: F.transform_values(m, lambda k, v: f(v))),
    "merge": VrlFn("native", "F.map_concat (deep=false shallow merge)", lambda a, b: F.map_concat(F.map_filter(a, lambda k, v: ~F.map_contains_key(b, k)), b)),
    "filter": VrlFn("native", "F.filter (higher-order)", lambda c, f: F.filter(c, f)),
    "for_each": VrlFn("native", "F.transform / F.aggregate (Column-level analogue; the VRL-source compiler supports the real side-effect closure via a packed-accumulator F.aggregate fold — vrl_codegen._for_each)", lambda c, f: F.transform(c, f)),
    "map": VrlFn("native", "F.transform", lambda c, f: F.transform(c, f)),
    "unique": VrlFn("native", "F.array_distinct", F.array_distinct),
    "unnest": VrlFn("native", "F.explode (1->N rows)", F.explode),
    "tally": VrlFn("compose", "vrl_compat.tally (aggregate HOF, no shuffle)", V.tally),
    "tally_value": VrlFn("compose", "vrl_compat.tally_value", V.tally_value),
    "only_fields": VrlFn("path", "struct projection (df.select at frame level)", lambda c, fields: F.struct(*[c[f].alias(f) for f in fields])),
    "remove": VrlFn("path", "Column.dropFields (df.drop at frame level)", lambda c, field: c.dropFields(field)),
    "del": VrlFn("path", "Column.dropFields (df.drop at frame level)", lambda c, field: c.dropFields(field)),
    "set": VrlFn("path", "Column.withField (df.withColumn at frame level)", lambda c, field, v: c.withField(field, v)),
    "get": VrlFn("path", "Column.getItem / getField / element_at", lambda c, field: c[field]),
    "exists": VrlFn("path", "schema check + isNotNull (struct-field form)", lambda c, field: c[field].isNotNull()),
    # --- time / env / misc ------------------------------------------------
    "now": VrlFn("native", "F.current_timestamp", F.current_timestamp),
    "format_timestamp": VrlFn("native", "F.date_format; strptime formats auto-converted", lambda c, f: F.date_format(c, _ts_fmt(f))),
    "uuid_v4": VrlFn("native", "F.uuid (per-row, nondeterministic)", lambda: F.uuid()),
    "get_env_var": VrlFn("driver", "F.lit(os.environ[...]) at plan build (like the reference: resolved at runtime on the host)", lambda name, default=None: F.lit(__import__("os").environ.get(name, default))),
    "get_hostname": VrlFn("driver", "F.lit(socket.gethostname()) at plan build", lambda: F.lit(__import__("socket").gethostname())),
    "assert": VrlFn("native", "F.assert_true / F.raise_error (test-only)", lambda cond, msg=None: F.assert_true(cond, F.lit(msg)) if msg is not None else F.assert_true(cond)),
    "assert_eq": VrlFn("native", "F.assert_true(a == b)", lambda a, b: F.assert_true(a == b)),
    # --- IP ---------------------------------------------------------------
    "ip_aton": VrlFn("compose", "vrl_compat.ip_aton (JVM split+shift, IPv4)", V.ip_aton),
    "ip_ntoa": VrlFn("compose", "vrl_compat.ip_ntoa", V.ip_ntoa),
    "ip_cidr_contains": VrlFn("compose", "vrl_compat.ip_cidr_contains (IPv4 mask compare)", V.ip_cidr_contains),
    "ip_subnet": VrlFn("compose", "vrl_compat.ip_subnet (/len or dotted netmask)", V.ip_subnet),
    "ip_to_ipv6": VrlFn("compose", "vrl_compat.ip_to_ipv6 (v4-mapped form)", V.ip_to_ipv6),
    "ipv6_to_ipv4": VrlFn("compose", "vrl_compat.ipv6_to_ipv4 (v4-mapped unwrap)", V.ipv6_to_ipv4),
    "ip_ntop": VrlFn("udf", "vrl_compat.ip_ntop (stdlib inet_ntop, both families, Arrow)", V.ip_ntop),
    "ip_pton": VrlFn("udf", "vrl_compat.ip_pton (stdlib inet_pton, both families, Arrow)", V.ip_pton),
    # --- syslog ----------------------------------------------------------
    "to_syslog_facility": VrlFn("compose", "vrl_compat.to_syslog_facility (code 0-23 -> keyword)", V.to_syslog_facility),
    "to_syslog_level": VrlFn("compose", "vrl_compat.to_syslog_level", V.to_syslog_level),
    "to_syslog_severity": VrlFn("compose", "vrl_compat.to_syslog_severity", V.to_syslog_severity),
}


def coverage_summary() -> dict[str, int]:
    out: dict[str, int] = {}
    for e in VRL.values():
        out[e.kind] = out.get(e.kind, 0) + 1
    out["total"] = len(VRL)
    out["with_callable"] = sum(1 for e in VRL.values() if e.fn is not None)
    return out
