"""VRL stdlib compatibility layer (SURVEY.md §2.3).

Vector exposes ~140 scalar functions (lib/vrl/stdlib/src/lib.rs:611+).
Most lower 1:1 to pyspark.sql.functions (the §2.3 mapping table);
this module pins the non-trivial ones to named helpers so a pipeline
written against VRL names ports mechanically. Everything here is a
pure Column expression (JVM-side, codegen'd) — no UDFs.

Each helper cites its lib/vrl/stdlib/src/<name>.rs counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# --- parsing ---------------------------------------------------------------

# token grammar of vector-common tokenize.rs:11-35: a token is a
# bracketed [..] group (backslash escapes inside), a quoted ".." group,
# or a run of chars outside ' \t["'
_TOKEN_RX = r'(\[(?:\\.|[^\]\\])*\]|"(?:\\.|[^"\\])*"|[^ \t\["]+)'


def parse_tokens(col: Column) -> Column:
    """parse_tokens.rs:5-16 / tokenize.rs: whitespace-split except
    "..." and [...] groups (delimiters stripped); '' and '-' tokens
    -> NULL. One JVM regex pass + array transform, no Python."""
    toks = F.regexp_extract_all(col, F.lit(_TOKEN_RX), 1)

    def fix(t):
        inner = F.when(
            t.rlike(r'^\[.*\]$') | t.rlike(r'^".*"$'),
            t.substr(F.lit(2), F.length(t) - 2),
        ).otherwise(t)
        return F.when(
            (inner == "") | (inner == "-"), F.lit(None).cast("string")
        ).otherwise(inner)

    return F.transform(toks, fix)


def to_timestamp_auto(col: Column) -> Column:
    """to_timestamp's 'automatic' string parse — the reference tries a
    fixed format ladder (conversion.rs:229-287: local formats, UNIX
    seconds, RFC3339, then TZ'd formats incl. Common Log). Expressed as
    one coalesce of try_to_timestamp rungs; pure-digit strings are UNIX
    seconds exactly as %s ranks in the reference ladder. The RFC2822 /
    `date`-output rungs with day-of-week names are not included (Spark
    >= 3 cannot parse EEE)."""
    c = F.trim(col.cast("string"))
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),     # %F %T
        F.try_to_timestamp(c, F.lit("d-MMM-yyyy HH:mm:ss")),     # %v %T
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),   # %FT%T
        F.try_to_timestamp(c, F.lit("MM/dd/yyyy:HH:mm:ss")),     # %m/%d/%Y:%T
        F.when(c.rlike(r"^\d+$"),
               F.timestamp_seconds(c.try_cast("long"))),         # %s
        F.try_to_timestamp(c),              # ISO 8601 / RFC 3339 family
        F.try_to_timestamp(c, F.lit("dd/MMM/yyyy:HH:mm:ss Z")),  # CLF
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )


def parse_duration(col: Column, unit: str = "ms") -> Column:
    """parse_duration.rs: '3m', '250ms', '1.5s' -> number in `unit`."""
    num = F.regexp_extract(col, r"^([0-9]*\.?[0-9]+)", 1).cast("double")
    u = F.regexp_extract(col, r"([a-zµ]+)$", 1)
    ns = (
        F.when(u == "ns", 1.0)
        .when(u.isin("us", "µs"), 1e3)
        .when(u == "ms", 1e6)
        .when(u == "s", 1e9)
        .when(u == "m", 60e9)
        .when(u == "h", 3600e9)
        .when(u == "d", 86400e9)
    )
    target = {"ns": 1.0, "us": 1e3, "ms": 1e6, "s": 1e9, "m": 60e9, "h": 3600e9, "d": 86400e9}[unit]
    return num * ns / F.lit(target)


def parse_int(col: Column, base: int | None = None) -> Column:
    """parse_int.rs: auto-detects 0x/0o/0b prefixes when base absent."""
    if base is not None:
        return F.conv(col, base, 10).cast("bigint")
    stripped = F.regexp_replace(col, r"^0[xob]", "")
    return (
        F.when(col.startswith("0x"), F.conv(stripped, 16, 10).cast("bigint"))
        .when(col.startswith("0o"), F.conv(stripped, 8, 10).cast("bigint"))
        .when(col.startswith("0b"), F.conv(stripped, 2, 10).cast("bigint"))
        .otherwise(col.try_cast("bigint"))
    )


def parse_url(col: Column) -> Column:
    """parse_url.rs -> struct(scheme, host, port, path, query)."""
    return F.struct(
        F.parse_url(col, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(col, F.lit("HOST")).alias("host"),
        F.parse_url(col, F.lit("PATH")).alias("path"),
        F.parse_url(col, F.lit("QUERY")).alias("query"),
    )


# --- string ----------------------------------------------------------------

def truncate(col: Column, limit: int, suffix: str = "...") -> Column:
    """truncate.rs: cut to limit chars, appending suffix when cut."""
    return F.when(
        F.length(col) > limit, F.concat(F.substring(col, 1, limit), F.lit(suffix))
    ).otherwise(col)


def redact(col: Column, patterns: list[str], replacement: str = "[REDACTED]") -> Column:
    """redact.rs: replace every regex match with a marker."""
    out = col
    for p in patterns:
        out = F.regexp_replace(out, p, replacement)
    return out


def strip_whitespace(col: Column) -> Column:
    """strip_whitespace.rs trims ALL whitespace (\\n, \\t, ...);
    F.trim only strips the space character — golden-corpus replay
    caught the difference."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def strip_ansi_escape_codes(col: Column) -> Column:
    """strip_ansi_escape_codes.rs."""
    return F.regexp_replace(col, r"\x1b\[[0-9;]*[A-Za-z]", "")


def snakecase(col: Column) -> Column:
    """snakecase.rs: CamelCase / kebab-case / spaces -> snake_case."""
    s = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1_$2")
    s = F.regexp_replace(s, r"[\s\-]+", "_")
    return F.lower(s)


# --- codec ------------------------------------------------------------------

def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


def encode_percent(col: Column) -> Column:
    """encode_percent.rs: RFC 3986 percent-encoding. url_encode is
    form-encoding (space -> '+'); a literal '+' in the input becomes
    %2B first, so rewriting '+' -> '%20' afterwards is lossless."""
    return F.regexp_replace(F.url_encode(col), r"\+", "%20")


def decode_percent(col: Column) -> Column:
    """decode_percent.rs: fallible in VRL — malformed percent-encoding
    errors the expression, and the event goes to the error channel.
    `F.url_decode` under ANSI mode instead THROWS (CANNOT_DECODE_URL),
    killing the whole job on one dirty value; `try_url_decode` -> NULL
    is the Spark-side analogue of the fallible error."""
    return F.try_url_decode(col)


# --- type conversion ---------------------------------------------------------

_TRUE_STRINGS = ["true", "t", "yes", "y", "1"]
_FALSE_STRINGS = ["false", "f", "no", "n", "0"]


def to_bool(col: Column) -> Column:
    """to_bool.rs (Conversion::parse_bool): true/t/yes/y/1 -> true,
    false/f/no/n/0 -> false (case-insensitive); numerics by != 0;
    null for anything else (the fallible branch)."""
    low = F.lower(F.trim(col.cast("string")))
    return (
        F.when(low.isin(_TRUE_STRINGS), F.lit(True))
        .when(low.isin(_FALSE_STRINGS), F.lit(False))
        .otherwise(col.try_cast("boolean"))
    )


# --- type introspection ------------------------------------------------------

def is_nullish(col: Column) -> Column:
    """is_nullish.rs: null, empty, whitespace-only, or '-'."""
    return col.isNull() | F.trim(col).isin("", "-")


# --- IPv4 math (ip_*.rs family; dotted-quad paths JVM-side) ------------------

_IPV4_RX = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def ip_aton(col: Column) -> Column:
    """ip_aton.rs: IPv4 dotted quad -> numeric (network byte order).
    Invalid input -> NULL (the fallible branch)."""
    ok = col.rlike(_IPV4_RX)
    parts = F.split(col, r"\.")
    octs = [F.element_at(parts, i + 1).cast("bigint") for i in range(4)]
    valid = ok
    for o in octs:
        valid = valid & (o <= 255)
    num = octs[0] * 16777216 + octs[1] * 65536 + octs[2] * 256 + octs[3]
    return F.when(valid, num)


def ip_ntoa(col: Column) -> Column:
    """ip_ntoa.rs: numeric -> IPv4 dotted quad."""
    n = col.cast("bigint")
    return F.when(
        (n >= 0) & (n <= 4294967295),
        F.concat_ws(
            ".",
            F.shiftright(n, 24).bitwiseAND(F.lit(255)).cast("string"),
            F.shiftright(n, 16).bitwiseAND(F.lit(255)).cast("string"),
            F.shiftright(n, 8).bitwiseAND(F.lit(255)).cast("string"),
            n.bitwiseAND(F.lit(255)).cast("string"),
        ),
    )


def _cidr_mask(bits: Column) -> Column:
    """/bits -> 32-bit netmask as bigint (bits==0 -> 0). shiftleft
    only takes a literal shift count, so the column-valued 2^(32-b)
    goes through pow (exact in doubles up to 2^53)."""
    full = F.lit(4294967295)
    low = F.pow(F.lit(2.0), (F.lit(32) - bits).cast("double")).cast("bigint") - 1
    return F.when(bits <= 0, 0).when(bits >= 32, full).otherwise(full - low)


def ip_cidr_contains(cidr: Column, ip: Column) -> Column:
    """ip_cidr_contains.rs (IPv4): ip inside 'a.b.c.d/len'. NULL when
    either side fails to parse (callers coalesce per their error
    policy, matching the fallible !)."""
    base = F.substring_index(cidr, "/", 1)
    bits = F.substring_index(cidr, "/", -1).try_cast("int")
    mask = _cidr_mask(bits)
    return (ip_aton(ip).bitwiseAND(mask)) == (ip_aton(base).bitwiseAND(mask))


def ip_subnet(ip: Column, mask: Column) -> Column:
    """ip_subnet.rs (IPv4): apply '/len' or dotted netmask -> network
    address string."""
    bits = F.when(
        mask.startswith("/"), F.substring(mask, 2, 2).try_cast("int")
    )
    m = F.coalesce(_cidr_mask(bits), ip_aton(mask))
    return ip_ntoa(ip_aton(ip).bitwiseAND(m))


def ip_to_ipv6(col: Column) -> Column:
    """ip_to_ipv6.rs: v4 -> v4-mapped v6 '::ffff:a.b.c.d'; v6 input
    passes through."""
    is_v4 = col.rlike(_IPV4_RX)
    return F.when(is_v4, F.concat(F.lit("::ffff:"), col)).otherwise(col)


def ipv6_to_ipv4(col: Column) -> Column:
    """ipv6_to_ipv4.rs: '::ffff:a.b.c.d' -> 'a.b.c.d'; plain v4 passes
    through; non-mapped v6 -> NULL (reference errors)."""
    is_v4 = col.rlike(_IPV4_RX)
    mapped = F.lower(col).startswith("::ffff:")
    return F.when(is_v4, col).when(mapped, F.substring(col, 8, 2_000_000))


# --- misc string/url ---------------------------------------------------------


def parse_query_string(col: Column) -> Column:
    """parse_query_string.rs: 'foo=1&bar=2' -> map<string,string>,
    percent-decoded; a leading '?' is tolerated; keys without '='
    get ''. Lenient like the reference: malformed percent-encoding
    (e.g. 'q=100%') keeps the raw token instead of erroring the job
    (try_url_decode -> NULL -> coalesce to raw)."""
    q = F.when(col.startswith("?"), F.substring(col, 2, 2_000_000)).otherwise(col)
    pairs = F.filter(F.split(q, "&"), lambda p: F.length(p) > 0)

    def _dec(raw: Column) -> Column:
        return F.coalesce(F.try_url_decode(raw), raw)

    entries = F.transform(
        pairs,
        lambda p: F.struct(
            _dec(F.substring_index(p, "=", 1)).alias("key"),
            _dec(
                F.when(F.instr(p, "=") > 0, F.substr(p, F.instr(p, "=") + 1)).otherwise(
                    F.lit("")
                )
            ).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def format_int(col: Column, base: int) -> Column:
    """format_int.rs: integer -> string in `base`; negatives keep the
    sign (F.conv alone would two's-complement them)."""
    n = col.cast("bigint")
    mag = F.lower(F.conv(F.abs(n).cast("string"), 10, base))
    return F.when(n < 0, F.concat(F.lit("-"), mag)).otherwise(mag)


def chunks_str(col: Column, n: int) -> Column:
    """chunks.rs over strings: split into <=n-CHAR chunks (the
    reference slices bytes; documented divergence — character slicing
    is the sane unicode-safe Spark form)."""
    k = F.ceil(F.length(col) / F.lit(n)).cast("int")
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.substring(col, i * n + 1, n))


def tally(col: Column) -> Column:
    """tally.rs: array<string> -> map<value, count>. aggregate HOF —
    no explode, no shuffle."""
    return F.aggregate(
        col,
        F.create_map().cast("map<string,bigint>"),
        lambda acc, x: F.map_concat(
            F.map_filter(acc, lambda k, v: k != x),
            F.create_map(x, F.coalesce(F.element_at(acc, x), F.lit(0)) + 1),
        ),
    )


def tally_value(col: Column, value) -> Column:
    """tally_value.rs: occurrences of `value` in the array."""
    return F.size(F.filter(col, lambda x: x == value)).cast("bigint")


def find(col: Column, substring: str) -> Column:
    """find.rs: 0-based index of first occurrence, -1 when absent."""
    pos = F.instr(col, substring)
    return F.when(pos > 0, pos - 1).otherwise(F.lit(-1)).cast("bigint")


def parse_ruby_hash(col: Column) -> Column:
    """parse_ruby_hash.rs: ruby hash literal -> VARIANT (Spark 4
    parse_json) after rewriting the ruby surface syntax: '=>' -> ':',
    nil -> null, :symbol keys -> "symbol". Heuristic string rewrite —
    a STRING VALUE containing '=>' or ':sym' would be corrupted;
    fine for the log payloads this function exists for (the reference
    parses properly but its own docs scope it to ruby-ish logs)."""
    s = F.regexp_replace(col, r"=>", ":")
    s = F.regexp_replace(s, r":\s*nil\b", ": null")
    s = F.regexp_replace(s, r":([A-Za-z_]\w*)\s*:", r'"$1":')
    return F.try_parse_json(s)


def parse_xml(col: Column, text_key: str = "value") -> Column:
    """parse_xml.rs: XML -> nested object, rendered as a JSON string
    (chain from_json/try_parse_json for typed access). Mapping follows
    the reference: attributes keyed '@attr'; an element with children
    or attributes nests, its text under `text_key`; text-only elements
    collapse to their string; repeated siblings become arrays. Python
    stdlib ElementTree behind one Arrow pandas UDF."""
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def px(s):  # pd.Series -> pd.Series
        import xml.etree.ElementTree as ET

        def conv(el):
            out = {f"@{k}": v for k, v in el.attrib.items()}
            text = (el.text or "").strip()
            kids = list(el)
            if not kids and not out:
                return text
            for kid in kids:
                v = conv(kid)
                if kid.tag in out:
                    prev = out[kid.tag]
                    out[kid.tag] = prev + [v] if isinstance(prev, list) else [prev, v]
                else:
                    out[kid.tag] = v
            if text:
                out[text_key] = text
            return out

        def one(v):
            if v is None:
                return None
            try:
                root = ET.fromstring(str(v))
            except ET.ParseError:
                return None
            return _json.dumps({root.tag: conv(root)}, sort_keys=True)

        return pd.Series([one(v) for v in s])

    return px(col)


_UA_BROWSERS = [
    # (family, version-capture regex) — FIRST match wins; order matters
    # (Edge/Opera carry Chrome tokens, Chrome carries Safari tokens)
    ("Edge", r"Edge?/(\d+[\w.]*)"),
    ("Opera Mini", r"Opera Mini/(\d+[\w.]*)"),
    ("Opera", r"(?:Opera[/ ]|OPR/)(\d+[\w.]*)"),
    ("Firefox", r"Firefox/(\d+[\w.]*)"),
    ("Chrome", r"Chrom(?:e|ium)/(\d+[\w.]*)"),
    ("Safari", r"Version/(\d+[\w.]*).*Safari/"),
    ("Internet Explorer", r"MSIE (\d+[\w.]*)"),
]
_UA_OS = [
    ("Windows", r"Windows (NT \d+\.\d+)"),
    ("iOS", r"iPhone OS (\d+[_\d]*)"),
    ("Mac OS X", r"Mac OS X (\d+[_.\d]*)"),
    ("Android", r"Android (\d+[\w.]*)"),
    ("Linux", r"Linux()"),  # empty capture: no version on the wire
]


def parse_user_agent(col: Column) -> Column:
    """parse_user_agent.rs 'fast mode' analogue -> struct(browser
    struct<family,version>, os struct<family,version>, device
    struct<category>). HEURISTIC regex family tables, not the
    reference's UA database (documented divergence: unknown agents
    yield null families rather than db-backed guesses); fully
    JVM-side."""
    def first_match(table):
        fam = F.lit(None).cast("string")
        ver = F.lit(None).cast("string")
        for family, rx in reversed(table):
            hit = col.rlike(rx)
            v = F.nullif(F.regexp_extract(col, rx, 1), F.lit(""))
            fam = F.when(hit, family).otherwise(fam)
            ver = F.when(hit, v).otherwise(ver)
        return fam, ver

    bfam, bver = first_match(_UA_BROWSERS)
    osfam, osver = first_match(_UA_OS)
    mobile = col.rlike(r"Mobile|iPhone|Android|Opera Mini")
    bot = col.rlike(r"(?i)bot|crawler|spider|slurp")
    category = (
        F.when(bot, "bot").when(mobile, "mobile").otherwise(
            F.when(bfam.isNotNull() | osfam.isNotNull(), "pc")
        )
    )
    return F.struct(
        F.struct(bfam.alias("family"), bver.alias("version")).alias("browser"),
        F.struct(osfam.alias("family"), osver.alias("version")).alias("os"),
        F.struct(category.alias("category")).alias("device"),
    )


# --- crypto/codec UDF leaves (no JVM builtin; Arrow-vectorized) --------------


def sha3(col: Column, variant: str = "SHA3-512") -> Column:
    """sha3.rs: SHA3 digests (default variant SHA3-512, like the
    reference). No JVM builtin -> one Arrow pandas UDF."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    algo = {
        "SHA3-224": hashlib.sha3_224,
        "SHA3-256": hashlib.sha3_256,
        "SHA3-384": hashlib.sha3_384,
        "SHA3-512": hashlib.sha3_512,
    }[variant]

    @pandas_udf("string")
    def h(s):  # pd.Series -> pd.Series
        return pd.Series(
            [None if v is None else algo(str(v).encode()).hexdigest() for v in s]
        )

    return h(col)


def decode_mime_q(col: Column) -> Column:
    """decode_mime_q.rs: RFC 2047 encoded-words ('=?utf-8?b?...?=' /
    '?q?...') -> decoded text, embedded words decoded in place.
    Pure-stdlib python (email.header) behind one Arrow pandas UDF."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def dec(s):  # pd.Series -> pd.Series
        import base64
        import quopri
        import re as _re

        # delimiters anchored literally: the '=?'/'?=' of an RFC 2047
        # encoded-word are mandatory (optional '=' would swallow
        # ordinary text like 'who?utf-8?q?x?')
        word = _re.compile(r"=\?([^?]*)\?([bBqQ])\?([^?]*)\?=")

        def one(v):
            if v is None:
                return None

            def sub(m):
                charset = m.group(1) or "utf-8"
                enc, payload = m.group(2).lower(), m.group(3)
                try:
                    raw = (
                        base64.b64decode(payload + "=" * (-len(payload) % 4))
                        if enc == "b"
                        else quopri.decodestring(payload.replace("_", " "))
                    )
                    return raw.decode(charset, errors="replace")
                except Exception:
                    return m.group(0)

            return word.sub(sub, v)

        return pd.Series([one(v) for v in s])

    return dec(col)


# --- syslog ------------------------------------------------------------------

_SYSLOG_LEVELS = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]


def to_syslog_level(severity: Column) -> Column:
    """to_syslog_level.rs: severity 0-7 -> keyword."""
    expr = F.lit(None).cast("string")
    out = F.when(severity == 0, _SYSLOG_LEVELS[0])
    for i, name in enumerate(_SYSLOG_LEVELS[1:], start=1):
        out = out.when(severity == i, name)
    return out.otherwise(expr)


def to_syslog_severity(level: Column) -> Column:
    """to_syslog_severity.rs: keyword -> 0-7."""
    out = F.when(F.lower(level) == _SYSLOG_LEVELS[0], 0)
    for i, name in enumerate(_SYSLOG_LEVELS[1:], start=1):
        out = out.when(F.lower(level) == name, i)
    return out.otherwise(F.lit(None).cast("int"))


_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_facility(code: Column) -> Column:
    """to_syslog_facility.rs: facility code 0-23 -> keyword; out of
    range -> NULL (the fallible branch)."""
    out = F.when(code == 0, _SYSLOG_FACILITIES[0])
    for i, name in enumerate(_SYSLOG_FACILITIES[1:], start=1):
        out = out.when(code == i, name)
    return out.otherwise(F.lit(None).cast("string"))


def ip_ntop(col: Column) -> Column:
    """ip_ntop.rs: packed network-order bytes (4 = IPv4, 16 = IPv6)
    -> printable address. stdlib socket.inet_ntop behind one Arrow
    pandas UDF (both families); wrong lengths -> NULL (the reference
    errors)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def f(s):
        import socket

        def one(b):
            if b is None:
                return None
            b = bytes(b)
            try:
                if len(b) == 4:
                    return socket.inet_ntop(socket.AF_INET, b)
                if len(b) == 16:
                    return socket.inet_ntop(socket.AF_INET6, b)
            except OSError:
                pass
            return None

        return pd.Series([one(v) for v in s])

    return f(col)


def ip_pton(col: Column) -> Column:
    """ip_pton.rs: printable address -> packed bytes (4 or 16);
    malformed -> NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def f(s):
        import socket

        def one(v):
            if v is None:
                return None
            for fam in (socket.AF_INET, socket.AF_INET6):
                try:
                    return socket.inet_pton(fam, v)
                except OSError:
                    continue
            return None

        return pd.Series([one(v) for v in s])

    return f(col)


_CLOUDWATCH_RAW_SCHEMA = (
    "messageType string, owner string, logGroup string, logStream string, "
    "subscriptionFilters array<string>, "
    "logEvents array<struct<id:string,timestamp:bigint,message:string>>"
)


def parse_aws_cloudwatch_log_subscription_message(col: Column) -> Column:
    """parse_aws_cloudwatch_log_subscription_message.rs: the AWS
    camelCase subscription JSON -> the reference's snake_case struct,
    log-event timestamps lifted from epoch-millis to timestamps."""
    raw = F.from_json(col, _CLOUDWATCH_RAW_SCHEMA)
    return F.struct(
        raw["messageType"].alias("message_type"),
        raw["owner"].alias("owner"),
        raw["logGroup"].alias("log_group"),
        raw["logStream"].alias("log_stream"),
        raw["subscriptionFilters"].alias("subscription_filters"),
        F.transform(
            raw["logEvents"],
            lambda e: F.struct(
                e["id"].alias("id"),
                F.timestamp_millis(e["timestamp"]).alias("timestamp"),
                e["message"].alias("message"),
            ),
        ).alias("log_events"),
    )
