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
    return F.url_decode(col)


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
