"""Grok pattern -> regex compiler + vectorized extractors.

Re-implements the capability of VRL's `parse_grok`/`parse_groks`
(lib/vrl/stdlib/src/parse_grok.rs; Datadog grok engine in
lib/datadog/grok/) as:

  1. a compile step on the driver: grok pattern string with
     %{SYNTAX:name} captures -> one Python/Java regex with named groups
     (the reference likewise compiles grok to regex once per config);
  2. a run step that is either
     - `grok_extract_pandas`: ONE Arrow-vectorized pandas UDF pass
       returning map<string,string> (the featured hot path — no
       per-row Python, batches cross to Python once per Arrow batch), or
     - `grok_extract_native`: JVM-side and whole-stage-codegen'd in
       ONE regex pass (sentinel-joined regexp_replace, then split —
       not one regexp_extract per field, which re-ran the full
       composite regex per column).

Only the grok primitives the fixtures need are implemented; adding
more is a one-line table entry.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Standard grok pattern library (public grok syntax; definitions may
# reference other patterns with %{NAME} — expansion is recursive).
# Some multi-alternative upstream definitions (QS, PATH, URI) are
# re-derived in a backtracking-safe python/RE2-compatible form (no
# atomic groups / possessive quantifiers).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\d+",
    "NONNEGINT": r"\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPV6": r"[0-9a-fA-F:]{2,39}(?:%\w+)?",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPORHOST": r"(?:%{IPV4}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"(?:%{EMAILADDRESS}|%{USER}|-)",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*'|`(?:\\.|[^\\`])*`)",
    "QS": r"%{QUOTEDSTRING}",
    "UNIXPATH": r"(?:/[\w.$%+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "TTY": r"/dev/(?:pts|tty[pq]?)\w*",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\|\^\-\[\]<>]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "DATESTAMP": r"(?:%{DATE_US}|%{DATE_EU})[- ]%{TIME}",
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|TRACE|debug|info|warn(?:ing)?|error|fatal|trace)",
    "PROG": r"[^:\[\s]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "SYSLOGTIMESTAMP": r"\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}",
    # composites (standard grok apache patterns; NUMBER for status and
    # the (NUMBER|-) bytes alternative per upstream COMMONAPACHELOG)
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} '
        r'\[%{HTTPDATE:timestamp}\] '
        r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r'%{NUMBER:response} (?:%{NUMBER:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
}

_MAX_DEPTH = 20

# Datadog grok matchers (lib/datadog/grok/src/matchers/): lowercase
# names, mapped onto the standard grok table where the semantics
# coincide. regex("...") and date("...") are parameterized and
# handled in _matcher_regex.
_DD_TO_GROK: dict[str, str] = {
    "notSpace": "NOTSPACE",
    "space": "SPACE",
    "data": "DATA",
    "word": "WORD",
    "integer": "INT",
    "integerExt": "INT",
    "number": "NUMBER",
    "numberExt": "BASE10NUM",
    "ip": "IP",
    "ipv4": "IPV4",
    "ipv6": "IPV6",
    "hostname": "HOSTNAME",
    "ipOrHost": "IPORHOST",
    "port": "POSINT",
    "doubleQuotedString": "QUOTEDSTRING",
    "singleQuotedString": "QUOTEDSTRING",
    "uuid": "UUID",
    "mac": "MAC",
    "boolean": "LOGBOOL",
}
GROK_PATTERNS["LOGBOOL"] = r"(?:[Tt]rue|TRUE|[Ff]alse|FALSE)"

_MATCHER_CALL = re.compile(r"^(\w+)\((.*)\)$", re.S)

# matchers whose TYPE travels with the matcher (no explicit filter
# needed): %{integer:field} yields a bigint field
_TYPED_MATCHERS = {
    "integer": "integer",
    "integerExt": "integer",
    "number": "number",
    "numberExt": "number",
    "boolean": "boolean",
}


def _unquote(arg: str) -> str:
    """Strip the surrounding double quotes of a matcher argument and
    unescape the grammar's \\" / \\\\ escapes (other backslashes —
    \\d etc. — pass through untouched)."""
    arg = arg.strip()
    if len(arg) >= 2 and arg[0] == '"' and arg[-1] == '"':
        arg = arg[1:-1]
    return re.sub(r'\\(["\\])', r"\1", arg)


def _date_format_regex(fmt: str) -> str:
    """Java SimpleDateFormat-ish date() matcher format -> matching
    regex (the reference builds the matcher regex from the format the
    same way, lib/datadog/grok/src/matchers/date.rs)."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c.isalpha():
            j = i
            while j < len(fmt) and fmt[j] == c:
                j += 1
            n = j - i
            if c in "yYdHhmsS":
                out.append(rf"\d{{{n}}}" if n > 1 else r"\d{1,2}")
            elif c == "M":
                out.append(r"[A-Za-z]{3,}" if n >= 3 else (r"\d{2}" if n == 2 else r"\d{1,2}"))
            elif c == "E":
                out.append(r"[A-Za-z]{3,}")
            elif c == "Z":
                out.append(r"(?:[+-]\d{4}|[+-]\d{2}:\d{2}|Z|[A-Z]{2,5})")
            elif c == "z":
                out.append(r"[A-Za-z][A-Za-z0-9/_+-]*")
            elif c == "a":
                out.append(r"[APap][Mm]")
            else:
                out.append(re.escape(c * n))
            i = j
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


def _sanitize_groups(fields: list[str]) -> list[str]:
    """Dotted Datadog field names (network.client.ip) are not valid
    regex group identifiers; map each field to a deterministic
    sanitized group name (collision-safe, order-preserving)."""
    out: list[str] = []
    seen: set[str] = set()
    for f in fields:
        g = re.sub(r"\W", "_", f)
        if not g or g[0].isdigit():
            g = "f_" + g
        while g in seen:
            g += "_"
        seen.add(g)
        out.append(g)
    return out


def _scan_capture(pat: str, i: int) -> tuple[list[str], int]:
    """Parse the %{...} capture starting at pat[i], splitting on
    TOP-LEVEL ':' (quotes and parens shield — filters/matchers like
    keyvalue(": ",",") and date("HH:mm") carry ':' inside args).
    Returns ([matcher, name?, filter?], index_past_closing_brace)."""
    j = i + 2
    n = len(pat)
    depth = 0
    seg: list[str] = []
    segs: list[str] = []
    while j < n:
        c = pat[j]
        if c == '"':
            seg.append(c)
            j += 1
            while j < n and pat[j] != '"':
                if pat[j] == "\\" and j + 1 < n:
                    seg.append(pat[j : j + 2])
                    j += 2
                else:
                    seg.append(pat[j])
                    j += 1
            if j < n:
                seg.append('"')
                j += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "}" and depth == 0:
            segs.append("".join(seg))
            return segs, j + 1
        elif c == ":" and depth == 0:
            segs.append("".join(seg))
            seg = []
            j += 1
            continue
        seg.append(c)
        j += 1
    raise ValueError(f"unterminated %{{...}} capture in grok pattern: {pat!r}")


def _capture_indices(regex: str) -> dict[str, int]:
    """Map named-group name -> 1-based numeric group index, counting
    EVERY capturing group (raw parens from Datadog regex-literal
    patterns included). Skips escapes and char classes; lookbehinds
    ((?<= / (?<!) are not groups."""
    idx: dict[str, int] = {}
    counter = 0
    i = 0
    in_class = False
    n = len(regex)
    while i < n:
        c = regex[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            nxt = regex[i + 1 : i + 2]
            if nxt != "?":
                counter += 1
            elif regex[i + 2 : i + 3] == "<" and regex[i + 3 : i + 4] not in ("=", "!"):
                counter += 1
                m = re.match(r"\?<(\w+)>", regex[i + 1 :])
                if m:
                    idx[m.group(1)] = counter
        i += 1
    return idx


def _anchor(rx: str) -> str:
    """Wrap ^...$ while keeping leading global inline flags ((?s) etc.)
    at the very start — Python 3.11+ rejects '^(?s)...'."""
    m = re.match(r"^((?:\(\?[aiLmsux]+\))+)", rx)
    if m:
        return f"{m.group(1)}^{rx[m.end():]}$"
    return f"^{rx}$"


def compile_grok(
    pattern: str,
    flavor: str = "python",
    aliases: dict[str, str] | None = None,
    literal_text: bool = True,
) -> tuple[str, list[str], dict[str, str]]:
    """Compile a grok pattern to (regex, field_names, filters).

    Pattern references expand RECURSIVELY (composites like
    %{COMBINEDAPACHELOG} carry named captures in their definitions);
    field names are collected in group-appearance order, which is what
    lets the java flavor address them by group index. Literal text is
    regex-escaped. Unnamed captures match without capturing. flavor:
    'python' emits (?P<name>...) with SANITIZED group names (see
    _sanitize_groups — dotted Datadog fields), 'java' emits plain
    numbered groups and avoids escaping characters Java's Pattern
    rejects escaped.

    `aliases` is the Datadog parse_groks alias map
    (lib/datadog/grok/src/parse_grok_rules.rs; exercised by the
    flagship config regression/cases/http_pipelines_blackhole/vector/
    vector.toml:44-74): user-defined named sub-patterns — names may
    contain dots — whose definitions may reference builtin matchers
    AND other aliases, and may carry their own %{matcher:field:filter}
    captures; those nested fields and filters surface in the result.
    Matchers support the Datadog lowercase table (_DD_TO_GROK) plus
    parameterized regex("...") and date("format").

    `literal_text=True` (the classic-grok default here) regex-escapes
    the pattern's literal text; False is the DATADOG semantics
    (lib/datadog/grok/src/parse_grok_rules.rs): the pattern IS a
    regex with %{} insertions — '(?s)', atomic groups '(?>...)' and
    '\\[' pass through. Alias definitions always use regex semantics.

    Filters (3rd segment) are collected, not applied —
    grok_extract_typed applies them as typed Column post-processing.
    """
    fields: list[str] = []
    filters: dict[str, str] = {}
    aliases = aliases or {}

    def esc(lit: str) -> str:
        if flavor == "java":
            # Java Pattern errors on "illegal escapes" like '\ ' that
            # Python produces; escape only true regex metacharacters.
            return re.sub(r"([.^$*+?()\[\]{}|\\])", r"\\\1", lit)
        return re.escape(lit)

    def matcher_regex(matcher: str, depth: int) -> str:
        if matcher in aliases:
            # alias definitions are grok patterns: literals inside are
            # already regex syntax (the reference treats them as such)
            return expand(aliases[matcher], depth + 1, False)
        m = _MATCHER_CALL.match(matcher)
        if m and m.group(1) == "regex":
            return f"(?:{_unquote(m.group(2))})"
        if m and m.group(1) == "date":
            # date("format"[, "tz"]): only the FORMAT shapes the regex
            fmt = _unquote(_split_filter_args(m.group(2))[0])
            return f"(?:{_date_format_regex(fmt)})"
        key = matcher if matcher in GROK_PATTERNS else _DD_TO_GROK.get(matcher)
        if key is None:
            raise ValueError(f"unknown grok syntax %{{{matcher}}}")
        return expand(GROK_PATTERNS[key], depth + 1, False)

    def expand(pat: str, depth: int, escape_literals: bool) -> str:
        if depth > _MAX_DEPTH:
            raise ValueError("grok expansion too deep (cycle?)")
        out: list[str] = []
        pos = 0
        while True:
            k = pat.find("%{", pos)
            if k < 0:
                break
            lit = pat[pos:k]
            out.append(esc(lit) if escape_literals else lit)
            segs, end = _scan_capture(pat, k)
            matcher = segs[0]
            name = segs[1] if len(segs) > 1 and segs[1] else None
            filt = segs[2] if len(segs) > 2 and segs[2] else None
            # The OUTER name is appended before expanding the
            # definition: group indices follow '(' appearance order
            # (the outer group's paren precedes any nested composite
            # captures), and the java flavor addresses groups by that
            # index.
            if name:
                fields.append(name)
                if filt:
                    filters[name] = filt
                elif matcher in _TYPED_MATCHERS:
                    # Datadog matchers carry implied types
                    # (matchers/mod.rs): %{integer:f} coerces like an
                    # explicit :integer filter would
                    filters[name] = _TYPED_MATCHERS[matcher]
                elif matcher.startswith("date("):
                    # the date matcher IMPLIES a Date filter in the
                    # reference (parse_grok_rules resolves %{date(f):x}
                    # to a DateFilter; apply_date_filter converts the
                    # matched text to a timestamp) — carry the full
                    # matcher spelling as the filter
                    filters[name] = matcher
                gname = _sanitize_groups(fields)[-1]
                sub = matcher_regex(matcher, depth)
                # java flavor: named groups too ((?<gN>, java-legal
                # names) so extract sites can recover the true numeric
                # index even when raw pattern parens add groups
                group = (
                    f"(?P<{gname}>{sub})"
                    if flavor == "python"
                    else f"(?<g{len(fields)}>{sub})"
                )
                out.append(group)
            elif filt:
                # Root-destination filtered captures (%{data::keyvalue(...)}):
                # the reference (parse_grok.rs:65-68) merges the filter's
                # map result into the EVENT ROOT. Spark structs have no
                # dynamic root, so the result surfaces as a reserved
                # `_kvroot[N]` field (grok_extract_typed applies the
                # filter -> map<string,string> callers can flatten);
                # dropping it silently lost the flagship error pattern's
                # extracted key-values.
                n_root = sum(1 for f in fields if f.startswith("_kvroot"))
                name = "_kvroot" if n_root == 0 else f"_kvroot{n_root + 1}"
                fields.append(name)
                filters[name] = filt
                gname = _sanitize_groups(fields)[-1]
                sub = matcher_regex(matcher, depth)
                group = (
                    f"(?P<{gname}>{sub})"
                    if flavor == "python"
                    else f"(?<g{len(fields)}>{sub})"
                )
                out.append(group)
            else:
                # empty-name unfiltered captures (%{data}-in-composite)
                # match without capturing
                out.append(f"(?:{matcher_regex(matcher, depth)})")
            pos = end
        tail = pat[pos:]
        out.append(esc(tail) if escape_literals else tail)
        return "".join(out)

    return expand(pattern, 0, literal_text), fields, filters


def grok_to_regex(
    pattern: str,
    flavor: str = "python",
    aliases: dict[str, str] | None = None,
    literal_text: bool = True,
) -> tuple[str, list[str]]:
    """Compile a grok pattern to (regex_with_named_groups, field_names).
    See compile_grok for expansion/alias/filter semantics."""
    regex, fields, _ = compile_grok(
        pattern, flavor=flavor, aliases=aliases, literal_text=literal_text
    )
    return regex, fields


def grok_filters(pattern: str, aliases: dict[str, str] | None = None) -> dict[str, str]:
    """Extract the Datadog-style per-field filters from a grok pattern:
    {'status': 'integer', 'bytes': 'nullIf("-")', ...} — including
    filters declared inside alias definitions."""
    _, _, filters = compile_grok(pattern, aliases=aliases)
    return filters


_NULLIF_RX = re.compile(r'^nullIf\(\s*"((?:\\.|[^"])*)"\s*\)$')
_SCALE_RX = re.compile(r"^scale\(\s*([0-9.eE+-]+)\s*\)$")
_KEYVALUE_RX = re.compile(
    r'^keyvalue\(\s*(?:"((?:\\.|[^"])*)"\s*(?:,\s*"((?:\\.|[^"])*)"\s*'
    r'(?:,\s*"((?:\\.|[^"])*)"\s*(?:,\s*"((?:\\.|[^"])*)"\s*)?)?)?)?\)$'
)

_DEFAULT_QUOTES = [('"', '"'), ("'", "'"), ("<", ">")]
_DEFAULT_FIELD_DELIMS = [" ", ",", ";"]


def datadog_keyvalue(
    col: Column,
    kv_sep: str = "=",
    allow_extra: str = "",
    quotes: list[tuple[str, str]] | None = None,
    field_delims: list[str] | None = None,
    allow_given: bool = False,
) -> Column:
    """Datadog grok keyvalue filter -> map<string,string>, JVM-side.

    Arg order matches the reference
    (lib/datadog/grok/src/filters/keyvalue.rs filter_from_function):
    (key_value_delimiter, value-allow-list extra chars appended to the
    `[\\w.\\-_@...]` class, quote pair, field delimiter) — arg 2 is NOT
    a pair separator.

    Semantics replicated from keyvalue.rs parse():
      * field delimiters are tried IN ORDER (default ' ' ',' ';'); the
        first whose split yields only fully-parseable tokens wins, else
        the last is used leniently (reference: last_result);
      * keys/values may be quoted (default pairs "" '' <>) — quotes are
        stripped; unquoted keys must fully match the allow-class,
        unquoted values keep their longest allow-class prefix (the
        match_re_or_empty rule — a value starting with a disallowed
        char parses as '' and the pair is dropped);
      * pairs with blank keys, empty values, or the literal `null` are
        dropped (apply_filter's post-insert filter + parse_null).
    Divergence (documented): the reference's nom parser is sequential,
    so a field delimiter INSIDE an allowed value only splits here; and
    numbers/booleans stay strings in the map<string,string>.
    """
    quotes = quotes or _DEFAULT_QUOTES
    delims = field_delims or _DEFAULT_FIELD_DELIMS
    allow_cls = r"[\w.\-_@" + allow_extra + "]"
    full_rx = f"^{allow_cls}+$"
    prefix_rx = f"^({allow_cls}*)"

    def quoted(v: Column) -> Column:
        cond = F.lit(False)
        for qo, qc in quotes:
            cond = cond | (
                (F.length(v) >= 2) & v.startswith(qo) & v.endswith(qc)
            )
        return cond

    def unquoted_inner(v: Column) -> Column:
        return F.substring(v, F.lit(2), F.length(v) - 2)

    def parse_key(raw: Column) -> Column:
        k = F.trim(raw)
        return (
            F.when(quoted(k), unquoted_inner(k))
            .when(k.rlike(full_rx), k)
            .otherwise(F.lit(None).cast("string"))
        )

    def parse_val(raw: Column) -> Column:
        v = F.trim(raw)
        return (
            F.when(quoted(v), unquoted_inner(v))
            .when(v == "null", F.lit(None).cast("string"))
            .otherwise(F.regexp_extract(v, prefix_rx, 1))
        )

    def split_tokens(d: str) -> Column:
        rx = r"\s+" if d == " " else r"\s*" + re.sub(
            r"([.^$*+?()\[\]{}|\\])", r"\\\1", d
        ) + r"\s*"
        return F.filter(
            F.split(F.trim(col), rx, -1), lambda t: F.length(t) > 0
        )

    def token_ok(t: Column) -> Column:
        # a token parses iff: key=value with a valid key and a value
        # that is quoted / empty / a full allow-class match, OR a
        # standalone value (parses to a dropped Null pair upstream)
        has_kv = F.instr(t, kv_sep) > 0
        key_raw = F.trim(F.substring_index(t, kv_sep, 1))
        val_raw = F.trim(F.substr(t, F.instr(t, kv_sep) + len(kv_sep)))
        key_ok = quoted(key_raw) | key_raw.rlike(full_rx)
        # match_re_or_empty (keyvalue.rs:326-334): the value regex is
        # `^[...]*` by default but `^[...]+` when the allow-list arg is
        # given — with `+`, a value the regex cannot match AT ALL is
        # skipped to the next delimiter and parses as '' (dropped pair),
        # while a PARTIAL match leaves unconsumed input and fails the
        # line; with `*` the empty prefix always matches, so only a
        # full match (or empty value) parses.
        val_ok = (
            quoted(val_raw)
            | (F.length(val_raw) == 0)
            | val_raw.rlike(full_rx)
        )
        if allow_given:
            prefix = F.regexp_extract(val_raw, prefix_rx, 1)
            val_ok = val_ok | (F.length(prefix) == 0)
        standalone_ok = quoted(F.trim(t)) | F.trim(t).rlike(full_rx)
        return F.when(has_kv, key_ok & val_ok).otherwise(standalone_ok)

    def entries(toks: Column) -> Column:
        pairs = F.filter(toks, lambda t: F.instr(t, kv_sep) > 0)
        ent = F.transform(
            pairs,
            lambda p: F.struct(
                parse_key(F.substring_index(p, kv_sep, 1)).alias("key"),
                parse_val(
                    F.substr(p, F.instr(p, kv_sep) + len(kv_sep))
                ).alias("value"),
            ),
        )
        return F.filter(
            ent,
            lambda e: e["key"].isNotNull()
            & (F.length(F.trim(e["key"])) > 0)
            & e["value"].isNotNull()
            & (F.length(e["value"]) > 0),
        )

    result = entries(split_tokens(delims[-1]))
    for d in reversed(delims[:-1]):
        toks = split_tokens(d)
        result = F.when(F.forall(toks, token_ok), entries(toks)).otherwise(
            result
        )
    # duplicate keys: keep the LAST occurrence (BTreeMap insert order in
    # apply_filter) — folded left so the default EXCEPTION dedup policy
    # of map_from_entries can never throw on a dirty line
    empty = F.create_map().cast("map<string,string>")
    return F.aggregate(
        result,
        empty,
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _: k != e["key"]),
            F.create_map(e["key"], e["value"]),
        ),
    )


def _split_filter_args(s: str) -> list[str]:
    """Split a filter's argument list on TOP-LEVEL commas (commas
    inside double quotes or nested parens belong to the argument)."""
    args: list[str] = []
    cur: list[str] = []
    depth = 0
    in_q = False
    i = 0
    while i < len(s):
        ch = s[i]
        if in_q:
            if ch == "\\" and i + 1 < len(s):
                cur.append(ch)
                cur.append(s[i + 1])
                i += 2
                continue
            if ch == '"':
                in_q = False
        elif ch == '"':
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail or args:
        args.append(tail)
    return args


def _dd_array(col: Column, filt: str) -> Column:
    """Datadog grok `array` filter (lib/datadog/grok/src/filters/
    array.rs): strip the bracket pair, split on the delimiter, and
    optionally apply a value filter to every element. Argument forms
    mirror array.rs filter_from_function — array(), array("sep"),
    array(filter), array("[]", "sep"), array("sep", filter),
    array("[]", "sep", filter). Brackets arg: "" = none, 1 char =
    same open/close, 2 chars = open+close. Elements are NOT trimmed
    (array.rs take_until keeps inner spaces; its own test expects
    " 1 " from "[ 1 ,2]"). A non-bracketed input yields NULL (the
    reference's parse error), and an empty interior yields an empty
    array."""
    m = re.match(r"^array\((.*)\)$", filt, re.S)
    raw_args = _split_filter_args(m.group(1)) if m else []

    def is_str(a: str) -> bool:
        return a.startswith('"')

    brackets: str | None = None
    delim: str | None = None
    value_filter: str | None = None
    if len(raw_args) == 1:
        if is_str(raw_args[0]):
            delim = _unquote(raw_args[0])
        else:
            value_filter = raw_args[0]
    elif len(raw_args) == 2:
        if is_str(raw_args[0]) and is_str(raw_args[1]):
            brackets, delim = _unquote(raw_args[0]), _unquote(raw_args[1])
        elif is_str(raw_args[0]):
            delim, value_filter = _unquote(raw_args[0]), raw_args[1]
        else:
            raise ValueError(f"invalid array filter arguments: {filt!r}")
    elif len(raw_args) == 3:
        if not (is_str(raw_args[0]) and is_str(raw_args[1])):
            raise ValueError(f"invalid array filter arguments: {filt!r}")
        brackets, delim = _unquote(raw_args[0]), _unquote(raw_args[1])
        value_filter = raw_args[2]
    elif len(raw_args) > 3:
        raise ValueError(f"invalid array filter arguments: {filt!r}")

    if brackets is None:
        open_b, close_b = "[", "]"
    elif brackets == "":
        open_b = close_b = ""
    elif len(brackets) == 1:
        open_b = close_b = brackets
    elif len(brackets) == 2:
        open_b, close_b = brackets[0], brackets[1]
    else:
        raise ValueError(f"array brackets arg must be 0-2 chars: {brackets!r}")
    delim = delim if delim is not None else ","

    if open_b == "":
        inner = col
    else:
        rx = "^" + re.escape(open_b) + "(.*)" + re.escape(close_b) + r"\s*$"
        inner = F.when(col.rlike(rx), F.regexp_extract(col, rx, 1))
    arr = F.when(
        inner == "", F.array().cast("array<string>")
    ).otherwise(F.split(inner, re.escape(delim), -1))
    if value_filter is not None:
        inner_f = value_filter
        arr = F.transform(arr, lambda v: apply_grok_filter(v, inner_f))
    return arr


def apply_grok_filter(col: Column, filt: str) -> Column:
    """Datadog grok filters (lib/datadog/grok/src/grok_filter.rs:14-33
    and filters/) as Column post-processing over the extracted string:
    integer, integerExt (scientific notation, truncated toward zero),
    number, numberExt, boolean, nullIf("v"), scale(x), lowercase,
    uppercase, json -> VARIANT (try_parse_json; NULL on malformed —
    the reference's filter error), array(...) -> array (see
    :func:`_dd_array`), keyvalue(...) -> map<string,string>
    (filters/keyvalue.rs)."""
    if filt == "integer":
        return col.try_cast("bigint")
    if filt == "integerExt":
        # grok_filter.rs IntegerExt: parse as f64 then `as i64`
        # (truncation toward zero) — double->bigint cast semantics
        return col.try_cast("double").try_cast("bigint")
    if filt in ("number", "numberExt"):
        return col.try_cast("double")
    if filt == "json":
        # grok_filter.rs Json: serde_json parse, error -> filter
        # failure; Spark-first = VARIANT (arbitrary JSON, columnar)
        return F.try_parse_json(col)
    if filt == "array" or filt.startswith("array("):
        return _dd_array(col, filt)
    if filt.startswith("date("):
        # matchers/date.rs apply_date_filter: parse the matched text
        # with the (Java SimpleDateFormat-style) format -> timestamp.
        # Spark's datetime patterns use the same letters, so the
        # format passes through; the optional 2nd arg is the timezone
        # naive datetimes are IN (date.rs parse_timezone) — with the
        # engine's session tz pinned to UTC, to_utc_timestamp performs
        # exactly that reinterpretation. Unparseable text -> NULL (the
        # reference's filter-failure path).
        m = re.match(r"^date\((.*)\)$", filt, re.S)
        args = _split_filter_args(m.group(1)) if m else []
        if not args:
            raise ValueError(f"date filter needs a format: {filt!r}")
        fmt = _unquote(args[0])
        ts = F.try_to_timestamp(col, F.lit(fmt))
        if len(args) > 1:
            ts = F.to_utc_timestamp(ts, _unquote(args[1]))
        return ts
    if filt == "boolean":
        return F.lower(col) == "true"
    if filt == "lowercase":
        return F.lower(col)
    if filt == "uppercase":
        return F.upper(col)
    m = _NULLIF_RX.match(filt)
    if m:
        return F.nullif(col, F.lit(m.group(1)))
    m = _SCALE_RX.match(filt)
    if m:
        return col.try_cast("double") * float(m.group(1))
    m = _KEYVALUE_RX.match(filt)
    if m:
        # reference signature (keyvalue.rs filter_from_function):
        # (key_value_delimiter, value allow-list extra chars, quotes,
        # field_delimiter) — arg 2 is NOT a pair separator
        kv_sep = _unquote(f'"{m.group(1)}"') if m.group(1) is not None else "="
        allow_extra = _unquote(f'"{m.group(2)}"') if m.group(2) is not None else ""
        quotes = None
        if m.group(3):
            q = _unquote(f'"{m.group(3)}"')
            if len(q) != 2:
                raise ValueError(f"keyvalue quotes arg must be 2 chars: {q!r}")
            quotes = [(q[0], q[1])]
        field_delims = None
        if m.group(4) is not None:
            field_delims = [_unquote(f'"{m.group(4)}"')]
        return datadog_keyvalue(
            col,
            kv_sep=kv_sep,
            allow_extra=allow_extra,
            quotes=quotes,
            field_delims=field_delims,
            allow_given=m.group(2) is not None,
        )
    raise ValueError(f"unsupported grok filter {filt!r}")


def grok_extract_typed(
    col: Column,
    grok_pattern: str,
    engine: str = "native",
    anchored: bool = True,
    aliases: dict[str, str] | None = None,
    literal_text: bool = True,
) -> Column:
    """%{SYNTAX:name:filter} patterns -> struct with the filters
    applied as typed Columns (parity: Datadog grok's filter chain,
    applied after the regex match like the reference's
    apply_filter). Filters declared inside alias definitions apply
    too."""
    _, fields, filters = compile_grok(
        grok_pattern, aliases=aliases, literal_text=literal_text
    )
    base = (
        grok_extract_native(
            col, grok_pattern, anchored=anchored, aliases=aliases,
            literal_text=literal_text,
        )
        if engine == "native"
        else grok_extract_pandas(
            col, grok_pattern, anchored=anchored, aliases=aliases,
            literal_text=literal_text, fence=False,
        )
    )
    parts = []
    for f in fields:
        v = base[f]
        if f in filters:
            v = apply_grok_filter(v, filters[f])
        parts.append(v.alias(f))
    return F.struct(*parts)


def parse_groks_pandas(
    col: Column,
    grok_patterns: list[str],
    aliases: dict[str, str] | None = None,
    literal_text: bool = True,
) -> Column:
    """VRL parse_groks (lib/vrl/stdlib/src/parse_groks.rs): try each
    pattern IN ORDER, first match wins. One Arrow crossing total: a
    single pandas UDF walks the pattern list per batch, extracting
    only over still-unmatched rows (the common case resolves on the
    first pattern, so later regexes see shrinking inputs). Output is
    the union of all patterns' fields; unmatched rows are all-NULL.
    `aliases` is the Datadog user-defined alias map (applied to every
    pattern, like the reference's per-call aliases argument)."""
    compiled = []
    all_fields: list[str] = []
    for p in grok_patterns:
        rx, fields = grok_to_regex(p, aliases=aliases, literal_text=literal_text)
        compiled.append((re.compile(_anchor(rx)), list(zip(fields, _sanitize_groups(fields)))))
        for f in fields:
            if f not in all_fields:
                all_fields.append(f)
    schema = T.StructType([T.StructField(f, T.StringType()) for f in all_fields])

    def extract(s: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(
            {f: pd.Series([None] * len(s), index=s.index, dtype=object) for f in all_fields}
        )
        remaining = s.notna()
        for rx, field_groups in compiled:
            if not remaining.any():
                break
            sub = s[remaining]
            matched = sub.str.match(rx).fillna(False)
            if not matched.any():
                continue
            # str.extract returns EVERY capture group (raw pattern
            # parens included) — address the declared fields by their
            # SANITIZED group name, never by position
            hit = sub[matched].str.extract(rx)
            for f, g in field_groups:
                out.loc[hit.index, f] = hit[g].where(pd.notna(hit[g]), None)
            remaining.loc[hit.index] = False
        return out

    return pandas_udf(extract, schema).asNondeterministic()(col)


def grok_extract_pandas(
    col: Column,
    grok_pattern: str,
    anchored: bool = True,
    aliases: dict[str, str] | None = None,
    literal_text: bool = True,
    fence: bool = True,
) -> Column:
    """struct<field:string,...> of named captures; all-NULL fields on
    no-match.

    One compiled-regex pass per Arrow batch, fully vectorized:
    pandas str.extract returns the capture DataFrame which IS the
    Arrow struct batch — zero per-row Python. This is the parse hot
    path; benchmarked ~10x the dict-building row-wise variant.
    """
    regex, fields = grok_to_regex(
        grok_pattern, aliases=aliases, literal_text=literal_text
    )
    groups = _sanitize_groups(fields)
    if anchored:
        regex = _anchor(regex)
    schema = T.StructType([T.StructField(f, T.StringType()) for f in fields])

    # engine selection happens ONCE on the driver: pyarrow's
    # extract_regex (RE2, zero-copy over the Arrow batch) measures ~7x
    # faster than pandas str.extract on the flagship mix and handles
    # null-gated rows natively; RE2 rejects lookarounds/backrefs, so
    # grok-derived patterns outside its subset fall back to pandas.
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        pc.extract_regex(pa.array([], type=pa.string()), pattern=regex)
        use_re2 = True
    except pa.lib.ArrowInvalid:
        use_re2 = False

    def extract(s: pd.Series) -> pd.DataFrame:
        if use_re2:
            import pyarrow as pa
            import pyarrow.compute as pc

            # Spark tasks are the parallelism unit; keep arrow's own
            # CPU pool out of the picture (ncpu threads per EACH
            # python worker would oversubscribe the machine)
            if pa.cpu_count() != 1:
                pa.set_cpu_count(1)
            # type pinned: an all-null batch would otherwise infer the
            # arrow `null` type, for which extract_regex has no kernel
            st = pc.extract_regex(
                pa.Array.from_pandas(s, type=pa.string()), pattern=regex
            )
            # CRITICAL: null inputs / failed matches are marked invalid
            # on the STRUCT, but the child arrays carry "" placeholders
            # at those positions and st.field() bypasses the parent
            # validity. Without the mask every non-matching row emits
            # empty strings, and a downstream try_cast('') "succeeds"
            # via the exception path — building a cast-error message
            # per row (measured 4x end-to-end slowdown) and silently
            # changing isNotNull semantics.
            valid = st.is_valid()
            none = pa.scalar(None, type=pa.string())
            return pd.DataFrame(
                {
                    f: pc.if_else(valid, st.field(g), none).to_pandas()
                    for f, g in zip(fields, groups)
                }
            )
        compiled = re.compile(regex)
        # pandas fallback: callers gate the input per template
        # (F.when(cond, text)), so most rows arrive NULL; regex only
        # the non-null subset and reindex the misses back
        sub = s.dropna()
        if len(sub) == len(s):
            out = s.str.extract(compiled)
        else:
            out = sub.str.extract(compiled).reindex(s.index)
        # str.extract returns EVERY capture group (raw pattern parens
        # included); select the declared fields by sanitized group
        # name and restore the original (possibly dotted) field names
        out = out[groups]
        out.columns = list(fields)
        return out.where(pd.notna(out), None)

    # `fence` (asNondeterministic) is a pure optimizer fence: the UDF
    # IS deterministic, but without it Catalyst's project-collapse
    # inlines the call into any filter that references a derived
    # column and the plan evaluates the SAME grok UDF in two
    # ArrowEvalPython nodes (once for the parse_ok filter, once for
    # the projection) — seen via .explain("formatted") on the fused
    # pipeline. The fence CUTS THE OTHER WAY when the struct is
    # referenced once per field (grok_extract_typed): nondeterministic
    # expressions are never common-subexpression-eliminated, so N
    # field accesses become N UDF evaluations. Rule: fence=True for
    # single-reference + downstream-filter call sites (the flagship),
    # fence=False for fan-out-into-fields call sites.
    udf = pandas_udf(extract, schema)
    if fence:
        udf = udf.asNondeterministic()
    return udf(col)


def grok_extract_native(
    col: Column,
    grok_pattern: str,
    anchored: bool = True,
    aliases: dict[str, str] | None = None,
    literal_text: bool = True,
) -> Column:
    """struct<field:string,...> of named captures, JVM-side and
    whole-stage-codegen'd, in ONE regex pass: the anchored pattern is
    applied once via regexp_replace with a sentinel-joined $N
    replacement, then split — NOT one regexp_extract per field, which
    executes the full regex per column and turned a 10-field composite
    into ~20 regex runs per row (bench: op_parse_combined 14 s -> 2 s
    at sf0.1 after this rewrite). An unmatched optional group
    substitutes '' exactly like regexp_extract did, so field-level
    semantics are unchanged; non-matching ROWS (one rlike, shared via
    CSE) stay a struct of NULLs."""
    regex, fields = grok_to_regex(
        grok_pattern, flavor="java", aliases=aliases, literal_text=literal_text
    )
    if anchored:
        regex = _anchor(regex)
    # regexp_* address groups by number; the compiler names OUR field
    # groups (?<gN>...) so their true numeric indices can be recovered
    # even when raw pattern parens contribute extra groups
    indices = _capture_indices(regex)
    if not anchored:
        # the replace-join trick needs the whole string to be ONE
        # match; unanchored patterns fall back to per-field extract
        parts = [
            F.when(
                col.rlike(regex),
                F.regexp_extract(col, regex, indices[f"g{i}"]),
            ).alias(name)
            for i, name in enumerate(fields, start=1)
        ]
        return F.struct(*parts)
    sep = "\x01"  # cannot occur in a capture: it's a control byte no
    # grok primitive matches in log text; collisions would only split
    # a field early, never crash
    repl = sep.join(f"${indices[f'g{i}']}" for i in range(1, len(fields) + 1))
    # the when() lives INSIDE the shared array expression: per-field
    # when(ok, extract)s would each re-run the regex because Spark's
    # subexpression elimination refuses to hoist out of conditional
    # branches — here every field references the identical
    # unconditional `arr`, which codegen evaluates once
    arr = F.when(
        col.rlike(regex), F.split(F.regexp_replace(col, regex, repl), sep, -1)
    )
    parts = []
    for i, name in enumerate(fields):
        parts.append(F.try_element_at(arr, F.lit(i + 1)).alias(name))
    return F.struct(*parts)
