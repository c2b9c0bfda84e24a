"""Datadog search query -> Spark Column compiler.

The reference's second condition type (src/conditions/datadog_search.rs;
grammar lib/datadog/search-syntax/src/grammar.pest, AST node.rs,
matcher lib/datadog/filter/src/matcher.rs) compiles a Lucene-flavored
query string into an event predicate. Here the same grammar compiles
into ONE Spark Column expression — pure JVM-side predicates (rlike /
equality / array exists), no Python in the row path, so the compiled
condition participates in whole-stage codegen and predicate pushdown
exactly like a hand-written Column.

Supported surface (the subset the reference's own test table
exercises, datadog_search.rs:322-1020):
  term            field:value, bare keywords (multiterm folding)
  quoted phrase   field:"a phrase", "bare phrase"
  prefix/wildcard field:val*, field:*val*, *val, field:*
  comparison      field:>n  >=n  <n  <=n   (numeric or lexicographic)
  range           field:[a TO b], {a TO b}, [* TO b], [a TO *]
  existence       _exists_:field, _missing_:field
  boolean         AND / OR / NOT / - / +, parentheses, field:(query)
  matchall        *:*  and bare *

Field resolution (field.rs normalize_fields, adapted to a FIXED
schema — documented divergences from the reference's free-form event
model):
  @facet      -> column path 'custom.<facet>' (facet_prefix)
  default     -> each of schema.default_fields (word-boundary match)
  reserved    -> direct column (reference list + any actual column of
                 the DataFrame when one is supplied: in a typed table
                 the schema IS the reserved-attribute set)
  anything else -> tags array element match ('key:value' entries in
                 schema.tags_col)

Two deliberate divergences for typed columns (the reference only ever
string-matches `Value::Bytes`; a fixed-schema engine knows better):
  * equality/comparison against a NUMERIC column with a numeric query
    value compares numerically (reference would return false);
  * `_exists_` tests IS NOT NULL (presence and null-ness coincide in
    a fixed schema).
Null semantics vs the reference's 2-valued matchers: leaves stay
3-valued (a NULL field yields NULL, which filters exactly like the
reference's FALSE) so positive predicates remain PUSHDOWN-ELIGIBLE —
wrapping every leaf in coalesce(pred, false) was measured to disable
parquet PushedFilters entirely. Only negation needs the 2-valued
repair: NOT compiles to coalesce(NOT x, TRUE), restoring "NOT over a
null field is true" at exactly the nodes where 3-valued logic
diverges.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field as _dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# field.rs:13-22
RESERVED_ATTRIBUTES = frozenset(
    ["host", "source", "status", "service", "trace_id", "message", "timestamp", "tags"]
)
_DEFAULT_SENTINEL = "_default_"


# --------------------------------------------------------------------------
# AST (node.rs QueryNode)
# --------------------------------------------------------------------------


@dataclass
class _Node:
    pass


@dataclass
class MatchAll(_Node):
    pass


@dataclass
class MatchNone(_Node):
    pass


@dataclass
class Exists(_Node):
    attr: str


@dataclass
class Missing(_Node):
    attr: str


@dataclass
class Term(_Node):
    attr: str
    value: str


@dataclass
class Phrase(_Node):
    attr: str
    phrase: str


@dataclass
class Prefix(_Node):
    attr: str
    prefix: str


@dataclass
class Wildcard(_Node):
    attr: str
    pattern: str


@dataclass
class Compare(_Node):
    attr: str
    op: str  # > >= < <=
    value: object  # int | float | str


@dataclass
class RangeN(_Node):
    attr: str
    lower: object  # value or None (unbounded)
    lower_inc: bool
    upper: object
    upper_inc: bool


@dataclass
class Not(_Node):
    node: _Node


@dataclass
class Bool(_Node):
    op: str  # 'and' | 'or'
    nodes: list


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TERM_END = set(' \t\r\n()[]{}"')
# INVALID_TERM_STARTS beyond the enders (grammar.pest:20)
_TERM_BAD_START = set('+-!:~^?*\\>=<"')


@dataclass
class _Tok:
    kind: str  # lparen rparen and or not plus phrase range cmp term field star
    text: str = ""
    # range payload
    lo: object = None
    hi: object = None
    lo_inc: bool = True
    hi_inc: bool = True
    # cmp payload
    op: str = ""


def _unescape(s: str) -> str:
    """grammar.rs unescape: drop one level of backslash escaping."""
    out, esc = [], False
    for c in s:
        if esc:
            out.append(c)
            esc = False
        elif c == "\\":
            esc = True
        else:
            out.append(c)
    return "".join(out)


def _comparison_value(raw: str):
    """node.rs ComparisonValue::from — strip surrounding quotes, then
    '*' -> unbounded (None), else int, else float, else string."""
    m = _re.match(r'^"(.+)"$', raw)
    if m:
        raw = m.group(1)
    raw = _unescape(raw)
    if raw == "*":
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw


def _read_term(q: str, i: int) -> tuple[str, int, bool]:
    """Read a maximal TERM/TERM_GLOB starting at i; returns (raw, next_i,
    has_glob). Respects backslash escapes; '*'/'?' allowed inside."""
    out = []
    glob = False
    n = len(q)
    while i < n:
        c = q[i]
        if c == "\\" and i + 1 < n:
            out.append(c)
            out.append(q[i + 1])
            i += 2
            continue
        if c in _TERM_END or c == ":":
            break
        if c in "<>=":  # comparisons only valid at value start; terms end here
            break
        if c in "*?":
            glob = True
        out.append(c)
        i += 1
    return "".join(out), i, glob


def _tokenize(q: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("lparen"))
            i += 1
        elif c == ")":
            toks.append(_Tok("rparen"))
            i += 1
        elif c == '"':
            j = i + 1
            buf = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            if j >= n:
                raise ValueError(f"unterminated phrase in datadog query: {q!r}")
            toks.append(_Tok("phrase", "".join(buf)))
            i = j + 1
        elif c in "[{":
            lo_inc = c == "["
            j = q.find("]", i)
            k = q.find("}", i)
            end = min(x for x in (j, k) if x >= 0) if max(j, k) >= 0 else -1
            if end < 0:
                raise ValueError(f"unterminated range in datadog query: {q!r}")
            # grammar.pest tokenizes the brackets independently, but the
            # reference's SEMANTIC layer (grammar.rs:241-245) panics on any
            # mixed (Gte,Lt)/(Gt,Lte) combination — '[1 TO 5}' is invalid
            # upstream, so reject it here for parity.
            hi_inc = q[end] == "]"
            if lo_inc != hi_inc:
                raise ValueError(
                    f"mixed range brackets are invalid (grammar.rs 241-245): "
                    f"{q[i:end + 1]!r}"
                )
            inner = q[i + 1 : end]
            parts = _re.split(r"\s+TO\s+", inner.strip())
            if len(parts) != 2:
                raise ValueError(f"range needs 'lower TO upper': {inner!r}")
            toks.append(
                _Tok(
                    "range",
                    lo=_comparison_value(parts[0]),
                    hi=_comparison_value(parts[1]),
                    lo_inc=lo_inc,
                    hi_inc=hi_inc,
                )
            )
            i = end + 1
        elif c in "<>":
            op = c
            i += 1
            if i < n and q[i] == "=":
                op += "="
                i += 1
            toks.append(_Tok("cmp", op=op))
        elif c == "-":
            toks.append(_Tok("not"))
            i += 1
        elif c == "+":
            toks.append(_Tok("plus"))
            i += 1
        elif c == "*" and (i + 1 >= n or q[i + 1] in _TERM_END or q[i + 1] == ":"):
            # lone STAR (value or *:* head)
            if i + 1 < n and q[i + 1] == ":":
                toks.append(_Tok("field", "*"))
                i += 2
            else:
                toks.append(_Tok("star"))
                i += 1
        else:
            raw, j, glob = _read_term(q, i)
            if not raw:
                raise ValueError(f"unexpected character {c!r} at {i} in {q!r}")
            if j < n and q[j] == ":":
                toks.append(_Tok("field", raw))
                i = j + 1
            elif raw == "AND":
                toks.append(_Tok("and"))
                i = j
            elif raw == "OR":
                toks.append(_Tok("or"))
                i = j
            elif raw == "NOT":
                toks.append(_Tok("not"))
                i = j
            else:
                toks.append(_Tok("glob" if glob else "term", raw))
                i = j
    return toks


# --------------------------------------------------------------------------
# parser (grammar.rs visit_query / visit_clause, incl. Lucene occur logic)
# --------------------------------------------------------------------------

_MUST, _SHOULD, _MUST_NOT = "must", "should", "must_not"


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_query(self, default_field: str, stop_at_rparen: bool = False) -> _Node:
        clauses: list[list] = []  # [occur, node] (mutable occur)
        modifier: str | None = None
        while True:
            t = self.peek()
            if t is None or (stop_at_rparen and t.kind == "rparen"):
                break
            if t.kind == "not":
                self.next()
                modifier = _MUST_NOT
                continue
            if t.kind == "plus":
                self.next()
                continue
            if t.kind == "and":
                self.next()
                if clauses and clauses[-1][0] == _SHOULD:
                    clauses[-1][0] = _MUST
                continue
            if t.kind == "or":
                self.next()
                if clauses and clauses[-1][0] == _MUST:
                    clauses[-1][0] = _SHOULD
                if modifier is None:
                    modifier = _SHOULD
                continue
            # multiterm folding (grammar.pest multitermlookahead): runs
            # of bare TERMs not followed by AND/OR fold into one default
            # -field term joined by spaces
            if t.kind == "term" and modifier is None:
                terms = []
                while True:
                    t2 = self.peek()
                    if t2 is None or t2.kind != "term":
                        break
                    nxt = (
                        self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
                    )
                    if nxt is not None and nxt.kind in ("and", "or"):
                        break
                    terms.append(_unescape(self.next().text))
                if terms:
                    clauses.append([_MUST, Term(default_field, " ".join(terms))])
                    continue
            node = self.parse_clause(default_field)
            clauses.append([modifier or _MUST, node])
            modifier = None
        return self._combine(clauses)

    @staticmethod
    def _combine(clauses: list[list]) -> _Node:
        if not clauses:
            return MatchAll()
        if len(clauses) == 1:
            occur, node = clauses[0]
            if occur == _MUST_NOT:
                if isinstance(node, MatchAll):
                    return MatchNone()
                return Not(node)
            return node
        and_nodes, or_nodes = [], []
        has_must = has_must_not = has_should = False
        for occur, node in clauses:
            if occur == _MUST:
                and_nodes.append(node)
                has_must = True
            elif occur == _MUST_NOT:
                and_nodes.append(Not(node))
                has_must_not = True
            else:
                or_nodes.append(node)
                has_should = True
        if has_must or not has_should:
            return Bool("and", and_nodes)
        if not has_must_not:
            return Bool("or", or_nodes)
        and_nodes.append(Bool("or", or_nodes))
        return Bool("and", and_nodes)

    def parse_clause(self, default_field: str) -> _Node:
        t = self.next()
        if t.kind == "star":
            return MatchAll() if default_field == _DEFAULT_SENTINEL else Wildcard(
                default_field, "*"
            )
        if t.kind == "lparen":
            node = self.parse_query(default_field, stop_at_rparen=True)
            nxt = self.peek()
            if nxt is not None and nxt.kind == "rparen":
                self.next()
            return node
        if t.kind == "phrase":
            return Phrase(default_field, t.text)
        if t.kind == "term":
            return Term(default_field, _unescape(t.text))
        if t.kind == "glob":
            raw = _unescape_glob(t.text)
            if _is_prefix(t.text):
                return Prefix(default_field, raw[:-1])
            return Wildcard(default_field, raw)
        if t.kind == "range":
            return RangeN(default_field, t.lo, t.lo_inc, t.hi, t.hi_inc)
        if t.kind == "cmp":
            return self._finish_cmp(default_field, t.op)
        if t.kind == "field":
            attr = _unescape(t.text)
            if attr == "*":  # *:* matchall
                v = self.peek()
                if v is not None and v.kind in ("star", "term", "glob"):
                    self.next()
                return MatchAll()
            v = self.peek()
            if v is None:
                raise ValueError(f"field '{attr}:' missing a value")
            if v.kind == "lparen":
                self.next()
                node = self.parse_query(attr, stop_at_rparen=True)
                nxt = self.peek()
                if nxt is not None and nxt.kind == "rparen":
                    self.next()
                return node
            if v.kind == "star":
                self.next()
                if attr == _DEFAULT_SENTINEL:
                    return MatchAll()
                return Wildcard(attr, "*")
            if v.kind == "phrase":
                self.next()
                if attr == "_exists_":
                    return Exists(v.text)
                if attr == "_missing_":
                    return Missing(v.text)
                return Phrase(attr, v.text)
            if v.kind == "term":
                self.next()
                value = _unescape(v.text)
                if attr == "_exists_":
                    return Exists(value)
                if attr == "_missing_":
                    return Missing(value)
                return Term(attr, value)
            if v.kind == "glob":
                self.next()
                raw = _unescape_glob(v.text)
                if _is_prefix(v.text):
                    return Prefix(attr, raw[:-1])
                return Wildcard(attr, raw)
            if v.kind == "range":
                self.next()
                return RangeN(attr, v.lo, v.lo_inc, v.hi, v.hi_inc)
            if v.kind == "cmp":
                self.next()
                return self._finish_cmp(attr, v.op)
            raise ValueError(f"field '{attr}:' followed by {v.kind}")
        raise ValueError(f"unexpected token {t.kind} in datadog query")

    def _finish_cmp(self, attr: str, op: str) -> _Node:
        v = self.peek()
        if v is None or v.kind not in ("term", "phrase", "glob"):
            raise ValueError(f"comparison '{attr}:{op}' missing a value")
        self.next()
        return Compare(attr, op, _comparison_value(v.text))


def _is_prefix(raw_glob: str) -> bool:
    """TERM_PREFIX: exactly one glob char, a trailing '*' (pest:30)."""
    return (
        raw_glob.endswith("*")
        and "*" not in raw_glob[:-1]
        and "?" not in raw_glob
        and len(raw_glob) > 1
    )


def _unescape_glob(s: str) -> str:
    # keep '*' semantics; unescape everything else
    return _unescape(s.replace("\\*", "\x00")).replace("\x00", "\\*")


def parse_dd(query: str) -> _Node:
    """Parse a Datadog search query into the AST (parser.rs parse)."""
    q = query.strip()
    if not q:
        return MatchAll()
    return _Parser(_tokenize(q)).parse_query(_DEFAULT_SENTINEL)


# --------------------------------------------------------------------------
# compiler: AST -> Column
# --------------------------------------------------------------------------


@dataclass
class DdSchema:
    """Field-resolution config (field.rs DEFAULT_FIELDS /
    RESERVED_ATTRIBUTES, adapted to a fixed schema)."""

    default_fields: tuple = ("message",)
    tags_col: str | None = "tags"
    facet_prefix: str = "custom."
    reserved: frozenset = _dc_field(default_factory=lambda: RESERVED_ATTRIBUTES)


_JAVA_RE_SPECIALS = set(".^$|?*+()[]{}\\")


def _re_escape(s: str) -> str:
    return "".join("\\" + c if c in _JAVA_RE_SPECIALS else c for c in s)


def _word_regex(pat: str) -> str:
    """datadog_filter regex.rs:5 — escaped pattern with '*' -> '.*',
    bounded by \\b (searched, not anchored)."""
    return r"\b" + _re_escape(pat).replace("\\*", ".*") + r"\b"


def _wildcard_regex(pat: str) -> str:
    """regex.rs:15 — anchored ^...$ with '*' -> '.*'."""
    return "^" + _re_escape(pat).replace("\\*", ".*") + "$"


def _field_type(df: DataFrame | None, path: str):
    """Resolve a dotted path against the schema; returns the DataType,
    or None when the path can't exist. Map value types resolve to the
    map's valueType (lookup of an absent key is null at runtime)."""
    if df is None:
        return T.StringType()
    cur = df.schema
    for part in path.split("."):
        if isinstance(cur, T.StructType):
            match = next((f for f in cur.fields if f.name == part), None)
            if match is None:
                return None
            cur = match.dataType
        elif isinstance(cur, T.MapType):
            cur = cur.valueType
        else:
            return None
    return cur


def _is_numeric(dt) -> bool:
    return isinstance(dt, T.NumericType)


class _Compiler:
    """EventFilter semantics (datadog_search.rs:57-260) over Columns."""

    def __init__(self, schema: DdSchema, df: DataFrame | None):
        self.s = schema
        self.df = df
        self.df_cols = set(df.columns) if df is not None else None

    # ---- field resolution (field.rs normalize_fields) ----

    def resolve(self, attr: str) -> list[tuple[str, str]]:
        """-> [(kind, path)], kind in default|facet|reserved|tag."""
        if attr == _DEFAULT_SENTINEL:
            return [("default", f) for f in self.s.default_fields]
        if attr.startswith("@"):
            return [("facet", self.s.facet_prefix + attr[1:])]
        if attr in self.s.default_fields:
            return [("default", attr)]
        if attr in self.s.reserved:
            return [("reserved", attr)]
        # fixed-schema adaptation: an actual column is addressed
        # directly (the schema IS the reserved set); only non-columns
        # fall through to the tags array
        if self.df_cols is not None and attr.split(".")[0] in self.df_cols:
            return [("reserved", attr)]
        return [("tag", attr)]

    # ---- leaf helpers ----

    def _col(self, path: str) -> Column | None:
        if _field_type(self.df, path) is None:
            return None
        col = None
        for part in path.split("."):
            col = F.col(part) if col is None else col.getField(part)
        return col

    def _tags(self) -> Column | None:
        if self.s.tags_col is None or (
            self.df_cols is not None and self.s.tags_col not in self.df_cols
        ):
            return None
        return F.col(self.s.tags_col)

    @staticmethod
    def _b(col: Column | None) -> Column:
        """Unresolvable field -> constant FALSE; otherwise the raw
        3-valued predicate (NULL filters like FALSE; negation repairs
        the one divergent case — see module docstring)."""
        if col is None:
            return F.lit(False)
        return col

    def _any_tag(self, fn) -> Column:
        tags = self._tags()
        if tags is None:
            return F.lit(False)
        return self._b(F.exists(tags, fn))

    # ---- EventFilter ops ----

    def exists(self, kind: str, path: str) -> Column:
        if kind == "tag":
            pref = path + ":"
            return self._any_tag(
                lambda v: (v == path) | v.startswith(pref)
            )
        if kind == "reserved" and path == "tags":
            return self._any_tag(lambda v: v == path)
        return self._b(self._col(path).isNotNull() if self._col(path) is not None else None)

    def equals(self, kind: str, path: str, value: str) -> Column:
        if kind == "default":
            c = self._str_col(path)
            return self._b(c.rlike(_word_regex(value)) if c is not None else None)
        if kind == "reserved" and path == "tags":
            return self._any_tag(lambda v: v == value)
        if kind == "tag":
            want = f"{path}:{value}"
            return self._any_tag(lambda v: v == want)
        # facet / reserved: typed equality for numeric columns
        # (documented divergence), string equality otherwise
        c = self._col(path)
        if c is None:
            return F.lit(False)
        dt = _field_type(self.df, path)
        num = _to_number(value)
        if _is_numeric(dt) and num is not None:
            return self._b(c == F.lit(num))
        return self._b(c.cast("string") == F.lit(value))

    def prefix(self, kind: str, path: str, prefix: str) -> Column:
        if kind == "default":
            c = self._str_col(path)
            return self._b(
                c.rlike(_word_regex(prefix + "*")) if c is not None else None
            )
        if kind == "tag":
            want = f"{path}:{prefix}"
            return self._any_tag(lambda v: v.startswith(want))
        c = self._col(path)
        return self._b(
            c.cast("string").startswith(prefix) if c is not None else None
        )

    def wildcard(self, kind: str, path: str, pattern: str) -> Column:
        if kind == "default":
            c = self._str_col(path)
            return self._b(c.rlike(_word_regex(pattern)) if c is not None else None)
        if kind == "tag":
            rx = _wildcard_regex(f"{path}:{pattern}")
            return self._any_tag(lambda v: v.rlike(rx))
        c = self._col(path)
        return self._b(
            c.cast("string").rlike(_wildcard_regex(pattern)) if c is not None else None
        )

    def compare(self, kind: str, path: str, op: str, value) -> Column:
        if kind == "tag":
            pref = path + ":"
            rhs = F.lit(str(value))
            return self._any_tag(
                lambda v: v.startswith(pref)
                & _cmp(F.substring(v, len(pref) + 1, 2_000_000), op, rhs)
            )
        c = self._col(path)
        if c is None:
            return F.lit(False)
        dt = _field_type(self.df, path)
        if isinstance(value, (int, float)):
            if _is_numeric(dt):
                return self._b(_cmp(c, op, F.lit(value)))
            # string column vs numeric rhs: the reference coerces the
            # rhs to a string and compares lexicographically
            # (datadog_search.rs:219-230)
            return self._b(_cmp(c.cast("string"), op, F.lit(_num_str(value))))
        if _is_numeric(dt):
            return F.lit(False)  # (Integer lhs, String rhs) => false
        return self._b(_cmp(c.cast("string"), op, F.lit(str(value))))

    def range(self, kind: str, path: str, node: RangeN) -> Column:
        # filter.rs Filter::range default impl
        if node.lower is None and node.upper is None:
            return self.exists(kind, path)
        if node.lower is None:
            return self.compare(
                kind, path, "<=" if node.upper_inc else "<", node.upper
            )
        if node.upper is None:
            return self.compare(
                kind, path, ">=" if node.lower_inc else ">", node.lower
            )
        return self.compare(
            kind, path, ">=" if node.lower_inc else ">", node.lower
        ) & self.compare(kind, path, "<=" if node.upper_inc else "<", node.upper)

    def _str_col(self, path: str) -> Column | None:
        c = self._col(path)
        if c is None:
            return None
        dt = _field_type(self.df, path)
        return c if isinstance(dt, T.StringType) else c.cast("string")

    # ---- tree walk (matcher.rs build_matcher) ----

    def compile(self, node: _Node) -> Column:
        if isinstance(node, MatchAll):
            return F.lit(True)
        if isinstance(node, MatchNone):
            return F.lit(False)
        if isinstance(node, Not):
            return _not(self.compile(node.node))
        if isinstance(node, Bool):
            cols = [self.compile(n) for n in node.nodes]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if node.op == "and" else (out | c)
            return out
        if isinstance(node, Exists):
            return self._any_field(node.attr, self.exists)
        if isinstance(node, Missing):
            # matcher.rs:116-123: ALL resolved fields must be absent
            # (an absent/null container counts as missing -> _not)
            parts = [_not(self.exists(k, p)) for k, p in self.resolve(node.attr)]
            return _fold_and(parts)
        if isinstance(node, (Term, Phrase)):
            value = node.value if isinstance(node, Term) else node.phrase
            return self._any_field(node.attr, lambda k, p: self.equals(k, p, value))
        if isinstance(node, Prefix):
            return self._any_field(
                node.attr, lambda k, p: self.prefix(k, p, node.prefix)
            )
        if isinstance(node, Wildcard):
            return self._any_field(
                node.attr, lambda k, p: self.wildcard(k, p, node.pattern)
            )
        if isinstance(node, Compare):
            return self._any_field(
                node.attr, lambda k, p: self.compare(k, p, node.op, node.value)
            )
        if isinstance(node, RangeN):
            return self._any_field(node.attr, lambda k, p: self.range(k, p, node))
        raise TypeError(f"unknown node {node!r}")

    def _any_field(self, attr: str, fn) -> Column:
        parts = [fn(kind, path) for kind, path in self.resolve(attr)]
        return _fold_or(parts)


def _not(col: Column) -> Column:
    """2-valued negation: NULL input means 'did not match', so its
    negation is TRUE (the reference's matcher returns false -> NOT
    gives true)."""
    return F.coalesce(~col, F.lit(True))


def _fold_or(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _fold_and(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _cmp(lhs: Column, op: str, rhs: Column) -> Column:
    if op == ">":
        return lhs > rhs
    if op == ">=":
        return lhs >= rhs
    if op == "<":
        return lhs < rhs
    return lhs <= rhs


def _to_number(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return None


def _num_str(v) -> str:
    # Rust Display for integers/floats: 5 -> "5", 5.0 -> "5"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def dd_query(
    query: str, df: DataFrame | None = None, schema: DdSchema | None = None
) -> Column:
    """Compile a Datadog search query string into a Spark Column
    predicate, usable anywhere a Column condition is (route / filter /
    when). Pass `df` to resolve fields against its schema (missing
    fields compile to FALSE, like the reference's missing-key
    behavior, and actual columns become reserved attributes)."""
    node = parse_dd(query)
    return _Compiler(schema or DdSchema(), df).compile(node)
