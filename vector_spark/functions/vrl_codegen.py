"""VRL AST -> native Spark Column compiler.

Compiles a parsed VRL program (vrl_lang.parse_vrl) into pure JVM
expressions over a DataFrame row — the "remap with VRL source" path of
the reference (src/transforms/remap.rs compiles VRL to its own VM; here
the same programs compile to Catalyst expressions, so they run inside
whole-stage codegen with zero Python in the hot path).

Semantics mapping (documented divergences are deliberate — a statically
typed engine cannot replicate every dynamic-typing edge):

- **events are rows**: top-level event fields are DataFrame columns;
  nested paths are struct fields (reads via getField, writes via
  Column.withField / dropFields). Reading a path absent from the schema
  yields null, matching VRL's missing-path semantics.
- **runtime errors are NULL**: VRL's fallible-expression errors map to
  NULL results (Spark's own semantics for failed casts / division by
  zero / non-matching parses). Hence ``a ?? b`` compiles to
  ``coalesce``-style selection, ``f!(...)`` to an abort-on-NULL guard,
  and ``ok, err = f(...)`` assigns the NULL-on-error result plus a
  generic error marker. Divergence: a *legitimately* null ok-result of
  a fallible call is indistinguishable from an error.
- **abort** (reference ast.rs Abort; remap's drop-on-abort): execution
  state freezes at the abort point — every later assignment is guarded
  by NOT-aborted, bit-identical to the reference test suite's
  state-at-abort results. ``CompiledVrl.apply`` either filters aborted
  rows or routes them to a dropped port like operators/remap.py.
- **static type checks**: where VRL defers to runtime (can't add string
  to integer, non-boolean predicate), the DataFrame schema decides at
  compile time: statically-impossible operations become always-error
  values (NULL + marked), mirroring the reference's runtime errors; the
  error lists in tests/expressions/arithmetic/*/invalid.vrl are the
  ground truth for which combinations error.
- **parse_json** returns a lazy JSON proxy: path navigation compiles to
  ``get_json_object`` with an accumulated JSONPath, so ``.a.b[0]`` on
  parsed JSON needs no schema and stays JVM-side; materializing an
  entire parsed object does require a schema and raises VrlUnsupported.
- **%metadata is a compile-time namespace**: the event's second
  namespace (``%foo`` paths) compiles exactly like VRL variables — a
  per-event scratch dict of typed Columns that starts empty, merges
  across if-branches, and is NOT part of the emitted event (matching
  the reference, where metadata only reaches a sink if the program
  copies it into the event). Sources here populate no metadata, so a
  program reading ``%foo`` before writing it sees null.
- function calls dispatch to the golden-replayed stdlib registry
  (functions/vrl_map.py VRL[name].fn) with literal-argument extraction;
  type-assert functions (string!/integer!/...) resolve against the
  static schema.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, replace

from pyspark.sql import Column, functions as F, types as T

from vector_spark.functions.vrl_lang import (
    Abort,
    Arr,
    Assign,
    Block,
    FnCall,
    If,
    Lit,
    Not,
    Obj,
    Op,
    Program,
    Query,
    Template,
    Var,
    VrlUnsupported,
    parse_vrl,
)

MISSING = object()


class VrlCompileError(ValueError):
    pass


_REGEX = T.DataType()  # sentinel "regex" type (compile-time only)


@dataclass
class Val:
    col: Column
    vtype: object = None  # T.DataType | None (unknown/dynamic)
    fallible: bool = False
    always_err: bool = False
    pylit: object = MISSING
    json: tuple | None = None  # (src Column, jsonpath) lazy parse_json proxy
    err_msg: Column | None = None  # error message when this errors at runtime


def _vrl_type_name(t) -> str:
    """VRL diagnostic type names (value/src/lib.rs Kind display)."""
    if t is None:
        return "value"
    if _is_int(t):
        return "integer"
    if isinstance(t, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "float"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BooleanType):
        return "boolean"
    if isinstance(t, T.NullType):
        return "null"
    if isinstance(t, T.ArrayType):
        return "array"
    if isinstance(t, (T.StructType, T.MapType)):
        return "object"
    if isinstance(t, T.TimestampType):
        return "timestamp"
    if t is _REGEX:
        return "regex"
    return "value"


def _type_default(t) -> Column:
    """VRL's on-error default for the ok target of `ok, err = expr`."""
    if t is None or isinstance(t, T.NullType):
        return F.lit(None)
    if _is_int(t):
        return F.lit(0).cast("long")
    if isinstance(t, (T.DoubleType, T.FloatType)):
        return F.lit(0.0)
    if isinstance(t, T.StringType):
        return F.lit("")
    if isinstance(t, T.BooleanType):
        return F.lit(False)
    if isinstance(t, T.ArrayType):
        return F.array().cast(t)
    if isinstance(t, T.StructType):
        # VRL's object default is {}; the static analogue is the shape
        # with every field null
        if not t.fields:
            return F.from_json(F.lit("{}"), t)
        return F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in t.fields]
        )
    return F.lit(None).cast(t)


def _quote_name(name: str) -> str:
    """Backtick-quote a field name for F.col when it contains path
    metacharacters (VRL allows keys like \"foo..bar\")."""
    if name.replace("_", "a").isalnum():
        return name
    return "`" + name.replace("`", "``") + "`"


def _lit(py, vtype) -> Val:
    return Val(F.lit(py), vtype, pylit=py)


_NULL = lambda: Val(F.lit(None), T.NullType(), pylit=None)  # noqa: E731


def _is_num(t) -> bool:
    return isinstance(t, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
                          T.ShortType, T.ByteType, T.DecimalType))


def _is_int(t) -> bool:
    return isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))


def _resolve(v: Val) -> Column:
    """Materialize a value (collapses a JSON proxy to its string form)."""
    if v.json is not None:
        src, path = v.json
        return F.get_json_object(src, path)
    return v.col


def _unify(a, b, structs: bool = False):
    """Least common type of two branch/coalesce arms, or raise.

    structs=True additionally unions two object shapes (field union,
    absent fields NULL) — wanted for error-coalesce arms like
    `parse_regex(...) ?? {}`, but NOT for array literals, where
    widening heterogeneous elements would silently null-pad them (the
    rfcs/8381 merge-fold corpus relies on per-element static shapes)."""
    if a is None or b is None:
        return None
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    if _is_num(a) and _is_num(b):
        return T.DoubleType()
    if structs and isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: dict = {}
        order: list = []
        for f in list(a.fields) + list(b.fields):
            if f.name not in fields:
                fields[f.name] = f.dataType
                order.append(f.name)
            else:
                fields[f.name] = _unify(fields[f.name], f.dataType,
                                        structs=True)
        return T.StructType([T.StructField(n, fields[n]) for n in order])
    raise VrlUnsupported(f"cannot unify branch types {a} and {b}")


def _stringly(v: Val) -> Column:
    """String-space materialization for dynamic coalescing: collections
    render as their JSON text (matching get_json_object's value space)."""
    c = _resolve(v)
    if isinstance(v.vtype, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(c)
    if isinstance(v.vtype, T.StringType) or v.vtype is None:
        return c
    return c.try_cast("string")


def _cast_to(v: Val, t) -> Column:
    c = _resolve(v)
    if t is None or v.vtype == t or isinstance(v.vtype, T.NullType):
        return c
    if isinstance(t, T.StructType) and isinstance(v.vtype, T.StructType):
        # widen to the union shape: present fields recurse, absent ones
        # are typed NULLs; a NULL struct (VRL error value) stays NULL
        src = {f.name: f.dataType for f in v.vtype.fields}
        cols = []
        for f in t.fields:
            if f.name in src:
                sub = Val(c.getField(f.name), src[f.name])
                cols.append(_cast_to(sub, f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.when(c.isNotNull(), F.struct(*cols))
    # try_cast: the session runs ANSI mode (Spark 4 default); VRL's
    # runtime cast errors map to NULL, never to job-killing exceptions
    return c.try_cast(t)


class Env:
    """Compile-time event/variable state."""

    def __init__(self, schema: T.StructType):
        self.schema = {f.name: f.dataType for f in schema}
        self.order = [f.name for f in schema]
        self.fields: dict[str, Val] = {}
        self.dropped: set[str] = set()
        # deleted after a possible abort: aborted rows keep the old value
        # (state-at-abort), surviving rows see it deleted -- resolved at
        # apply() time depending on whether aborted rows are emitted
        self.cond_dropped: set[str] = set()
        self.vars: dict[str, Val] = {}
        # %metadata: the event's second namespace (reference
        # lib/vrl/compiler/src/state.rs external metadata). A remap
        # program starts with empty metadata (sources populate it in the
        # reference; this engine has no source-side metadata), uses it as
        # per-event scratch space, and it is NOT part of the emitted
        # event — exactly the reference's encode-time behavior.
        self.meta: dict[str, Val] = {}
        self.meta_order: list[str] = []
        self.abort: Column | None = None  # None = statically not aborted

    def clone(self) -> "Env":
        e = Env(T.StructType([]))
        e.schema = self.schema
        e.order = list(self.order)
        e.fields = dict(self.fields)
        e.dropped = set(self.dropped)
        e.cond_dropped = set(self.cond_dropped)
        e.vars = dict(self.vars)
        e.meta = dict(self.meta)
        e.meta_order = list(self.meta_order)
        e.abort = self.abort
        return e

    def get_field(self, name: str) -> Val:
        if name in self.fields:
            return self.fields[name]
        if name in self.dropped:
            return _NULL()
        if name in self.schema:
            return Val(F.col(_quote_name(name)), self.schema[name])
        return _NULL()

    def has_field(self, name: str) -> bool:
        return (name in self.fields) or (
            name in self.schema and name not in self.dropped
        )


# --------------------------------------------------------------------------
# function dispatch tables
# --------------------------------------------------------------------------

_TYPE_ASSERTS = {
    # reference identifiers (integer.rs:16 is "int", boolean.rs:17 is
    # "bool" — the type-assert family is int/float/bool/string/
    # timestamp/array/object)
    "bool": T.BooleanType,
    "int": T.LongType,
    "float": T.DoubleType,
    "string": T.StringType,
    "timestamp": T.TimestampType,
    "array": T.ArrayType,
    "object": T.StructType,
}

_IS_TESTS = {
    "is_boolean": T.BooleanType,
    "is_integer": T.LongType,
    "is_float": T.DoubleType,
    "is_string": T.StringType,
    "is_timestamp": T.TimestampType,
    "is_array": T.ArrayType,
    "is_object": T.StructType,
    "is_regex": type(None),
}

# return types for common registry functions so downstream expressions
# keep static typing (unlisted -> dynamic/None, which compiles permissively)
_RET = {
    "downcase": T.StringType(),
    "upcase": T.StringType(),
    "replace": T.StringType(),
    "truncate": T.StringType(),
    "slice": T.StringType(),
    "strip_whitespace": T.StringType(),
    "strip_ansi_escape_codes": T.StringType(),
    "join": T.StringType(),
    "sha1": T.StringType(),
    "sha2": T.StringType(),
    "sha3": T.StringType(),
    "md5": T.StringType(),
    "encode_base64": T.StringType(),
    "decode_base64": T.StringType(),
    "encode_json": T.StringType(),
    "encode_percent": T.StringType(),
    "decode_percent": T.StringType(),
    "format_timestamp": T.StringType(),
    "format_int": T.StringType(),
    "format_number": T.StringType(),
    "snakecase": T.StringType(),
    "camelcase": T.StringType(),
    "kebabcase": T.StringType(),
    "pascalcase": T.StringType(),
    "length": T.LongType(),
    "strlen": T.LongType(),
    "to_unix_timestamp": T.LongType(),
    "parse_int": T.LongType(),
    "round": T.DoubleType(),
    "floor": T.DoubleType(),
    "ceil": T.DoubleType(),
    "abs": T.DoubleType(),
    "contains": T.BooleanType(),
    "starts_with": T.BooleanType(),
    "ends_with": T.BooleanType(),
    "includes": T.BooleanType(),
    "match": T.BooleanType(),
    "is_empty": T.BooleanType(),
    "is_nullish": T.BooleanType(),
    "split": T.ArrayType(T.StringType()),
    "parse_tokens": T.ArrayType(T.StringType()),
    "now": T.TimestampType(),
    "to_timestamp": T.TimestampType(),
    "parse_timestamp": T.TimestampType(),
}

# preset parsers return TYPED structs/maps whose declared schemas live
# next to the parsers (presets.PARSE_*_TYPE, drift-checked by
# test_presets) — with these registered, `. = parse_common_log!(.line)`
# statically expands the event to the reference's field set
# (host/identity/user/timestamp/message/method/path/protocol/status/
# size, log_util.rs:18-30)
from vector_spark.functions import presets as _presets  # noqa: E402

_RET.update({
    "parse_apache_log": _presets.PARSE_APACHE_LOG_TYPE,
    "parse_common_log": _presets.PARSE_COMMON_LOG_TYPE,
    "parse_nginx_log": _presets.PARSE_NGINX_LOG_TYPE,
    "parse_syslog": _presets.PARSE_SYSLOG_TYPE,
    "parse_linux_authorization": _presets.PARSE_LINUX_AUTHORIZATION_TYPE,
    "parse_glog": _presets.PARSE_GLOG_TYPE,
    "parse_klog": _presets.PARSE_KLOG_TYPE,
    "parse_cef": _presets.PARSE_CEF_TYPE,
    "parse_aws_vpc_flow_log": _presets.PARSE_AWS_VPC_FLOW_LOG_TYPE,
    "parse_aws_alb_log": _presets.PARSE_AWS_ALB_LOG_TYPE,
    "parse_logfmt": _presets.PARSE_LOGFMT_TYPE,
})

_FALLIBLE = {
    "to_int", "to_float", "to_bool", "to_timestamp", "parse_timestamp",
    "slice", "get", "parse_int",
}

# scalar-string functions: a collection operand is a per-row runtime
# error in VRL (fed through ??/!), not a plan-analysis failure
_SCALAR_INPUT_FNS = {
    "upcase", "downcase", "truncate", "strip_whitespace",
    "strip_ansi_escape_codes", "replace", "sha1", "sha2", "sha3", "md5",
    "contains", "starts_with", "ends_with", "snakecase", "camelcase",
    "kebabcase", "pascalcase", "encode_base64", "encode_percent",
    "decode_percent", "strlen",
}


def _fallible_fn(name: str) -> bool:
    return name in _FALLIBLE or name.startswith("parse_") or name.startswith("decode_")


# --------------------------------------------------------------------------
# compiler
# --------------------------------------------------------------------------


class _Compiler:
    def __init__(self, schema: T.StructType, json_schemas=None):
        self.env = Env(schema)
        # path-string -> DataType: gives parse_json on a known event
        # path a TYPED result (from_json) instead of the lazy
        # get_json_object proxy, enabling `. = parse_json!(.message)`
        self.json_schemas = {
            k: (T._parse_datatype_string(v) if isinstance(v, str) else v)
            for k, v in (json_schemas or {}).items()
        }

    # -- abort guards ------------------------------------------------------
    def _guard(self, new: Column, old: Column) -> Column:
        if self.env.abort is None:
            return new
        return F.when(~F.coalesce(self.env.abort, F.lit(False)), new).otherwise(old)

    def _note_abort(self, cond: Column) -> None:
        prev = self.env.abort
        if prev is None:
            self.env.abort = cond
        else:
            # new aborts only fire on rows not already aborted
            self.env.abort = prev | (cond & ~F.coalesce(prev, F.lit(False)))

    # -- statements --------------------------------------------------------
    def run(self, prog: Program) -> Val:
        out = _NULL()
        for s in prog.stmts:
            out = self.stmt(s)
        return out

    def stmt(self, node) -> Val:
        if isinstance(node, Assign):
            return self._assign(node)
        if isinstance(node, Abort):
            return self._abort(node)
        v = self.expr(node)
        if v.fallible and not isinstance(node, (If,)):
            # VRL rejects unhandled fallible root expressions (E103); an
            # expression statement's value is discarded, so only surface
            # it for assignments (checked in _assign)
            pass
        return v

    def _abort(self, node: Abort) -> Val:
        if node.message is not None:
            self.expr(node.message)  # evaluated for parity; message unused
        self._note_abort(F.lit(True))
        return _NULL()

    def _assign(self, node: Assign) -> Val:
        val = self.expr(node.expr)
        handled = len(node.targets) == 2
        if val.fallible and not handled and not val.always_err:
            raise VrlCompileError(
                "unhandled fallible assignment (handle with `??`, `!`, or "
                "`ok, err = ...`)"
            )
        if val.always_err and not handled:
            raise VrlCompileError("expression always errors (type mismatch)")
        ok_val = val
        if handled:
            res = _resolve(val)
            plausible = bool(val.fallible or val.always_err)
            msg = val.err_msg if val.err_msg is not None else F.lit(
                "function call error"
            )
            err_col = F.when(
                res.isNull() & F.lit(plausible), msg
            ).otherwise(F.lit(None).cast("string"))
            self._store(node.targets[1], Val(err_col, T.StringType()), node.op)
            # on error the ok target takes the type's default value
            # (tests/expressions/assignment/infallible_external.vrl: 0.0)
            ok_col = res
            if plausible:
                ok_col = F.when(res.isNull(), _type_default(val.vtype)).otherwise(res)
            ok_val = Val(ok_col, val.vtype, pylit=val.pylit, json=val.json)
            self._store(node.targets[0], ok_val, node.op)
            # the assignment-expression value is err on error, ok otherwise
            # (tests/expressions/assignment/infallible_err_return_value.vrl)
            if plausible:
                return Val(
                    F.when(err_col.isNotNull(), err_col).otherwise(
                        ok_col.try_cast("string")
                    ),
                    T.StringType(),
                )
            return ok_val
        self._store(node.targets[0], ok_val, node.op)
        return ok_val

    def _store(self, target, val: Val, op: str) -> None:
        kind = target[0]
        if kind == "noop":
            return
        if op == "|=":
            cur = self._load_target(target)
            val = self._merge(cur, val)
        if kind == "event":
            self._event_set(target[1], val)
        elif kind == "meta":
            self._meta_set(target[1], val)
        elif kind == "var":
            name, path = target[1], target[2]
            if path:
                cur = self.env.vars.get(name, _NULL())
                self.env.vars[name] = self._with_path(cur, path, val)
            else:
                self.env.vars[name] = val
        else:  # pragma: no cover
            raise VrlCompileError(f"bad assignment target {target}")

    def _load_target(self, target) -> Val:
        if target[0] == "event":
            return self._event_get(target[1])
        if target[0] == "meta":
            return self._meta_get(target[1])
        if target[0] == "var":
            base = self.env.vars.get(target[1], _NULL())
            for seg in target[2]:
                base = self._get_seg(base, seg)
            return base
        return _NULL()

    # -- event paths -------------------------------------------------------
    def _event_get(self, path: list) -> Val:
        if not path:
            return self._whole_event()
        head = path[0]
        if head[0] == "field":
            base = self.env.get_field(head[1])
        elif head[0] == "coalesce":
            base = self._coalesce_fields(
                [self.env.get_field(n) for n in head[1] if self.env.has_field(n)]
            )
        else:
            raise VrlUnsupported("event root index path")
        for seg in path[1:]:
            base = self._get_seg(base, seg)
        return base

    # -- %metadata paths ----------------------------------------------------
    def _meta_get(self, path: list) -> Val:
        if not path:
            # whole-metadata read: struct of fields in insertion order
            # (tests/expressions/arithmetic/addition/metadata.vrl expects
            # {"foo": .., "bar": ..} in write order)
            if not self.env.meta_order:
                return Val(
                    F.from_json(F.lit("{}"), T.StructType([])), T.StructType([])
                )
            cols, stype = [], []
            for n in self.env.meta_order:
                v = self.env.meta[n]
                cols.append(_resolve(v).alias(n))
                stype.append(T.StructField(n, v.vtype or T.StringType()))
            return Val(F.struct(*cols), T.StructType(stype))
        head = path[0]
        if head[0] != "field":
            raise VrlUnsupported("metadata root index path")
        base = self.env.meta.get(head[1], _NULL())
        for seg in path[1:]:
            base = self._get_seg(base, seg)
        return base

    def _meta_set(self, path: list, val: Val) -> None:
        if not path:
            # `% = <object>`: replace the whole namespace; decompose a
            # statically-typed struct into per-field slots
            if isinstance(val.vtype, T.StructType):
                self.env.meta = {}
                self.env.meta_order = []
                for f in val.vtype.fields:
                    self.env.meta[f.name] = Val(
                        val.col.getField(f.name), f.dataType
                    )
                    self.env.meta_order.append(f.name)
                return
            raise VrlUnsupported("metadata root assignment of a non-object")
        head = path[0]
        if head[0] != "field":
            raise VrlUnsupported("metadata root index path")
        name = head[1]
        if path[1:]:
            cur = self.env.meta.get(name, _NULL())
            val = self._with_path(cur, path[1:], val)
        if self.env.abort is not None:
            old = self.env.meta.get(name, _NULL())
            val = Val(self._guard(_resolve(val), _resolve(old)),
                      _unify_or_none(val.vtype, old.vtype))
        self.env.meta[name] = val
        if name not in self.env.meta_order:
            self.env.meta_order.append(name)

    def _whole_event(self) -> Val:
        names = [n for n in self.env.order if n not in self.env.dropped]
        names += [
            n for n in self.env.fields
            if n not in names and n not in self.env.dropped
        ]
        cols, stype = [], []
        for n in names:
            v = self.env.get_field(n)
            cols.append(_resolve(v).alias(n))
            stype.append(T.StructField(n, v.vtype or T.StringType()))
        if not cols:
            return Val(
                F.from_json(F.lit("{}"), T.StructType([])), T.StructType([])
            )
        return Val(F.struct(*cols), T.StructType(stype))

    def _coalesce_fields(self, vals: list) -> Val:
        vals = [v for v in vals if not isinstance(v.vtype, T.NullType)]
        if not vals:
            return _NULL()
        t = vals[0].vtype
        for v in vals[1:]:
            t = _unify(t, v.vtype)
        return Val(F.coalesce(*[_cast_to(v, t) for v in vals]), t)

    def _get_seg(self, base: Val, seg) -> Val:
        if base.json is not None:
            src, p = base.json
            if seg[0] == "field":
                return Val(F.lit(None), None, fallible=base.fallible,
                           json=(src, f"{p}.{seg[1]}"))
            if seg[0] == "index":
                return Val(F.lit(None), None, fallible=base.fallible,
                           json=(src, f"{p}[{seg[1]}]"))
            raise VrlUnsupported("coalesce path on parsed JSON")
        t = base.vtype
        if seg[0] == "field":
            if isinstance(t, T.StructType):
                if seg[1] in t.fieldNames():
                    return Val(base.col.getField(seg[1]), t[seg[1]].dataType)
                return _NULL()
            if isinstance(t, T.MapType):
                return Val(base.col.getItem(seg[1]), t.valueType)
            return _NULL()  # field access on scalar -> null (VRL query miss)
        if seg[0] == "index":
            if isinstance(t, T.ArrayType):
                i = seg[1]
                pos = i + 1 if i >= 0 else i  # element_at is 1-based; neg ok
                return Val(F.try_element_at(base.col, F.lit(pos)), t.elementType)
            return _NULL()
        if seg[0] == "coalesce":
            if isinstance(t, T.StructType):
                vals = [
                    Val(base.col.getField(n), t[n].dataType)
                    for n in seg[1] if n in t.fieldNames()
                ]
                return self._coalesce_fields(vals)
            return _NULL()
        raise VrlUnsupported(f"path segment {seg}")

    def _event_set(self, path: list, val: Val) -> None:
        if not path:
            # `. = expr` — replace the event wholesale
            if not isinstance(val.vtype, T.StructType):
                raise VrlUnsupported("`. = <non-object>` replacement")
            for n in list(self.env.order) + list(self.env.fields):
                self.env.dropped.add(n)
                # drop the stale binding too: get_field consults
                # `fields` before `dropped`, so a previously-assigned
                # field would otherwise resurrect through a later
                # branch merge with its pre-replacement value
                self.env.fields.pop(n, None)
            for f in val.vtype.fields:
                self._event_set([("field", f.name)],
                                Val(val.col.getField(f.name), f.dataType))
            return
        head = path[0]
        if head[0] == "coalesce":
            # write to the first existing field, else the last alternative
            name = next(
                (n for n in head[1] if self.env.has_field(n)), head[1][-1]
            )
        elif head[0] != "field":
            raise VrlUnsupported("event root write via index")
        else:
            name = head[1]
        cur = self.env.get_field(name)
        new = self._with_path(cur, path[1:], val)
        old_col = _resolve(cur)
        if self.env.abort is None:
            self.env.fields[name] = Val(_resolve(new), new.vtype)
        else:
            t_merged = _unify_or_none(new.vtype, cur.vtype)
            if (t_merged is None and new.vtype is not None
                    and cur.vtype is not None):
                # TYPE-CHANGING write under a conditional abort: a static
                # schema cannot hold both shapes, and aborted rows are
                # dropped from the ok port anyway — they see NULL here
                # instead of state-at-abort
                guarded = F.when(
                    ~F.coalesce(self.env.abort, F.lit(False)), _resolve(new)
                )
                self.env.fields[name] = Val(guarded, new.vtype)
            else:
                guarded = self._guard(_resolve(new), old_col)
                self.env.fields[name] = Val(guarded, t_merged)
        self.env.dropped.discard(name)
        self.env.cond_dropped.discard(name)
        if name not in self.env.order:
            self.env.order.append(name)

    def _with_path(self, cur: Val, path: list, val: Val) -> Val:
        if not path:
            return val
        seg = path[0]
        if seg[0] == "index":
            return self._with_index(cur, seg[1], path[1:], val)
        if seg[0] == "coalesce":
            # coalesce-path assignment writes to the FIRST existing field,
            # falling back to the last alternative
            # (tests/expressions/assignment/single_external_complex.vrl)
            names = seg[1]
            name = names[-1]
            if isinstance(cur.vtype, T.StructType):
                for n in names:
                    if n in cur.vtype.fieldNames():
                        name = n
                        break
            seg = ("field", name)
        else:
            name = seg[1]
        if isinstance(cur.vtype, T.StructType) and cur.json is None:
            inner_cur = self._get_seg(cur, seg)
            inner = self._with_path(inner_cur, path[1:], val)
            newt = T.StructType([
                f if f.name != name else T.StructField(name, inner.vtype or f.dataType)
                for f in cur.vtype.fields
            ])
            if name not in cur.vtype.fieldNames():
                newt = T.StructType(
                    list(cur.vtype.fields)
                    + [T.StructField(name, inner.vtype or T.StringType())]
                )
            return Val(cur.col.withField(name, _resolve(inner)), newt)
        # overwrite non-object with a fresh nested object (VRL semantics)
        inner = self._with_path(_NULL(), path[1:], val)
        return Val(
            F.struct(_resolve(inner).alias(name)),
            T.StructType([T.StructField(name, inner.vtype or T.StringType())]),
        )

    def _with_index(self, cur: Val, i: int, rest: list, val: Val) -> Val:
        """Array-index assignment with VRL's hole/extension semantics
        (tests/expressions/assignment/indexing.vrl is the ground truth):

        - positive i past the end extends with NULL holes then writes
          at i (`.x[5] = v` on [] -> [null x5? no: null,null,null,null,null,v]);
        - negative i within bounds writes at len-|i|;
        - negative i past the front PREPENDS: [v] ++ existing ++ NULL
          holes up to length |i| (`v2[-2] = 3` on [] -> [3, null]).
        """
        if isinstance(cur.vtype, T.ArrayType) and cur.json is None:
            elem_t = cur.vtype.elementType
            inner_cur = Val(F.try_element_at(cur.col, F.lit(i + 1 if i >= 0 else i)),
                            elem_t)
        else:
            # non-array (or missing) target is overwritten with an array
            elem_t = T.NullType()
            inner_cur = _NULL()
        inner = self._with_path(inner_cur, rest, val)
        et = _unify_or_none(elem_t, inner.vtype)
        if et is None and isinstance(cur.vtype, T.ArrayType) and not (
                isinstance(elem_t, T.NullType)):
            # writing a conflicting type into a typed array slot would
            # silently try_cast the OTHER elements to null — loud
            # unsupported beats quiet corruption (VRL arrays are
            # heterogeneous; a static schema's aren't)
            raise VrlUnsupported(
                "static type coercion: heterogeneous array element "
                f"assignment ({elem_t} slot, {inner.vtype} value)"
            )
        if et is None or isinstance(et, T.NullType):
            et = inner.vtype if inner.vtype and not isinstance(
                inner.vtype, T.NullType) else T.StringType()
        arr = (
            cur.col.try_cast(T.ArrayType(et))
            if isinstance(cur.vtype, T.ArrayType)
            else F.lit(None).cast(T.ArrayType(et))
        )
        arr0 = F.coalesce(arr, F.array().cast(T.ArrayType(et)))
        n = F.size(arr0)
        v = _cast_to(inner, et)
        if i >= 0:
            idx = F.lit(i)
            new = F.transform(
                F.sequence(F.lit(0), F.greatest(n - 1, idx)),
                lambda j: F.when(j == idx, v).otherwise(
                    F.when(j < n, F.try_element_at(arr0, j + 1))
                ),
            )
        else:
            m = -i
            pos = n - F.lit(m)
            replaced = F.transform(
                F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                lambda j: F.when(j == pos, v).otherwise(
                    F.try_element_at(arr0, j + 1)
                ),
            )
            prepended = F.concat(
                F.array(v),
                arr0,
                F.array_repeat(F.lit(None).cast(et), F.lit(m) - 1 - n),
            )
            new = F.when(n >= m, replaced).otherwise(prepended)
        return Val(new, T.ArrayType(et))

    # -- expressions -------------------------------------------------------
    def expr(self, node) -> Val:
        if isinstance(node, Lit):
            return self._literal(node)
        if isinstance(node, Arr):
            return self._array(node)
        if isinstance(node, Obj):
            return self._object(node)
        if isinstance(node, Block):
            # a block errors if ANY unhandled fallible expression statement
            # errors (tests/expressions/block/fallible.vrl: the whole block
            # value falls through to the `??` default)
            out = _NULL()
            errs = []
            for s in node.stmts:
                out = self.stmt(s)
                if not isinstance(s, Assign) and (out.fallible or out.always_err):
                    errs.append(_resolve(out).isNull())
            if errs:
                any_err = errs[0]
                for e in errs[1:]:
                    any_err = any_err | e
                col = F.when(~any_err, _resolve(out))  # else NULL = error
                return Val(col, out.vtype, fallible=True,
                           err_msg=out.err_msg)
            return out
        if isinstance(node, Var):
            if node.name not in self.env.vars:
                raise VrlCompileError(f"undefined variable {node.name}")
            return self.env.vars[node.name]
        if isinstance(node, Query):
            return self._query(node)
        if isinstance(node, FnCall):
            return self._call(node)
        if isinstance(node, If):
            return self._if(node)
        if isinstance(node, Op):
            return self._op(node)
        if isinstance(node, Not):
            return self._not(node)
        if isinstance(node, Abort):
            return self._abort(node)
        if isinstance(node, Assign):
            return self._assign(node)
        raise VrlUnsupported(f"expression {type(node).__name__}")

    def _literal(self, node: Lit) -> Val:
        k = node.kind
        if k == "string":
            tmpl: Template = node.value
            lit = tmpl.literal
            if lit is not None:
                return _lit(lit, T.StringType())
            parts = []
            for kind, v in tmpl.segments:
                if kind == "lit":
                    parts.append(F.lit(v))
                else:
                    if v not in self.env.vars:
                        raise VrlCompileError(f"undefined template variable {v}")
                    parts.append(_resolve(self.env.vars[v]).cast("string"))
            return Val(F.concat(*parts), T.StringType())
        if k == "rawstring":
            return _lit(node.value, T.StringType())
        if k == "int":
            return Val(F.lit(node.value).cast("long"), T.LongType(),
                       pylit=node.value)
        if k == "float":
            return _lit(node.value, T.DoubleType())
        if k == "bool":
            return _lit(node.value, T.BooleanType())
        if k == "null":
            return _NULL()
        if k == "regex":
            return Val(F.lit(node.value), _REGEX, pylit=node.value)
        if k == "timestamp":
            return Val(
                F.to_timestamp(F.lit(node.value.replace("T", " ").replace("Z", ""))),
                T.TimestampType(), pylit=node.value,
            )
        raise VrlUnsupported(f"literal kind {k}")

    def _array(self, node: Arr) -> Val:
        items = [self.expr(i) for i in node.items]
        if not items:
            # pylit=[] marks the empty-array literal so push/append can
            # RETYPE the element instead of being stuck with array<string>
            return Val(F.array().cast("array<string>"),
                       T.ArrayType(T.StringType()), pylit=[])
        t = items[0].vtype
        for v in items[1:]:
            t = _unify(t, v.vtype)
        if t is None or isinstance(t, T.NullType):
            t = T.StringType()
        return Val(F.array(*[_cast_to(v, t) for v in items]), T.ArrayType(t))

    def _object(self, node: Obj) -> Val:
        if not node.pairs:
            return Val(F.from_json(F.lit("{}"), T.StructType([])),
                       T.StructType([]), pylit={})
        cols, fields = [], []
        for k, e in node.pairs:
            v = self.expr(e)
            cols.append(_resolve(v).alias(k))
            fields.append(T.StructField(k, v.vtype or T.StringType()))
        return Val(F.struct(*cols), T.StructType(fields))

    def _query(self, node: Query) -> Val:
        tkind = node.target[0]
        if tkind == "event":
            return self._event_get(node.path)
        if tkind == "meta":
            return self._meta_get(node.path)
        if tkind == "var":
            base = self.env.vars.get(node.target[1])
            if base is None:
                raise VrlCompileError(f"undefined variable {node.target[1]}")
            for seg in node.path:
                base = self._get_seg(base, seg)
            return base
        if tkind == "expr":
            # static navigation through literal containers lets paths walk
            # into heterogeneous literals (and parse_json proxies) exactly
            cur = node.target[1]
            path = list(node.path)
            while path and isinstance(cur, (Arr, Obj)):
                seg = path[0]
                if isinstance(cur, Arr) and seg[0] == "index" and 0 <= seg[1] < len(cur.items):
                    cur = cur.items[seg[1]]
                    path.pop(0)
                elif isinstance(cur, Obj) and seg[0] == "field":
                    match = [e for k, e in cur.pairs if k == seg[1]]
                    if not match:
                        return _NULL()
                    cur = match[0]
                    path.pop(0)
                else:
                    break
            base = self.expr(cur) if not isinstance(cur, Val) else cur
            for seg in path:
                base = self._get_seg(base, seg)
            return base
        raise VrlUnsupported(f"query target {tkind}")

    # -- operators ---------------------------------------------------------
    def _truthy(self, v: Val) -> Column:
        c = _resolve(v)
        if isinstance(v.vtype, T.BooleanType):
            return F.coalesce(c, F.lit(False))
        if isinstance(v.vtype, T.NullType):
            return F.lit(False)
        return c.isNotNull()

    def _op(self, node: Op) -> Val:
        op = node.op
        if op == "??":
            lhs = self.expr(node.lhs)
            rhs = self.expr(node.rhs)
            if lhs.always_err:
                return rhs
            if not lhs.fallible:
                return lhs
            t = _unify(lhs.vtype, rhs.vtype, structs=True)
            if t is None:
                # dynamic (JSON) side: coalesce in JSON-string space
                out = F.when(_resolve(lhs).isNotNull(), _stringly(lhs)
                             ).otherwise(_stringly(rhs))
                return Val(out, None, fallible=rhs.fallible)
            out = F.when(_resolve(lhs).isNotNull(), _cast_to(lhs, t)).otherwise(
                _cast_to(rhs, t)
            )
            return Val(out, t, fallible=rhs.fallible)
        lhs = self.expr(node.lhs)
        rhs = self.expr(node.rhs)
        if op in ("==", "!="):
            return self._eq(lhs, rhs, op)
        if op == "||":
            return self._or(lhs, rhs)
        if op == "&&":
            return self._and(lhs, rhs)
        if op == "|":
            return self._merge(lhs, rhs)
        if op in ("+", "-", "*", "/"):
            return self._arith(lhs, rhs, op)
        if op in (">", ">=", "<", "<="):
            return self._cmp(lhs, rhs, op)
        raise VrlUnsupported(f"operator {op}")

    def _eq(self, lhs: Val, rhs: Val, op: str) -> Val:
        lt, rt = lhs.vtype, rhs.vtype
        if lt is not None and rt is not None and lt != rt:
            if _is_num(lt) and _is_num(rt):
                eq = _resolve(lhs).cast("double").eqNullSafe(
                    _resolve(rhs).cast("double")
                )
            elif isinstance(lt, T.NullType) or isinstance(rt, T.NullType):
                eq = _resolve(lhs).isNull() & _resolve(rhs).isNull()
            else:
                # cross-type equality is false in VRL -- statically
                if not (lhs.fallible or rhs.fallible):
                    return _lit(op == "!=", T.BooleanType())
                eq = F.lit(False)
        else:
            eq = _resolve(lhs).eqNullSafe(_resolve(rhs))
        fall = lhs.fallible or rhs.fallible
        if (lhs.pylit is not MISSING and rhs.pylit is not MISSING
                and not fall and lhs.vtype == rhs.vtype):
            res = lhs.pylit == rhs.pylit
            return _lit(res if op == "==" else not res, T.BooleanType())
        out = eq if op == "==" else ~eq
        return Val(out, T.BooleanType(), fallible=fall)

    def _or(self, lhs: Val, rhs: Val) -> Val:
        # null/false are falsy; result is lhs value if truthy else rhs value
        if lhs.pylit is not MISSING and isinstance(lhs.vtype, T.BooleanType):
            return _lit(True, T.BooleanType()) if lhs.pylit else rhs
        if isinstance(lhs.vtype, T.NullType):
            return rhs
        t = _unify(lhs.vtype, rhs.vtype)
        if t is None:
            out = F.when(self._truthy(lhs), _stringly(lhs)).otherwise(
                _stringly(rhs)
            )
            return Val(out, None, fallible=rhs.fallible)
        out = F.when(self._truthy(lhs), _cast_to(lhs, t)).otherwise(
            _cast_to(rhs, t)
        )
        return Val(out, t, fallible=rhs.fallible)

    def _and(self, lhs: Val, rhs: Val) -> Val:
        for side in (lhs, rhs):
            if side.vtype is not None and not isinstance(
                side.vtype, (T.BooleanType, T.NullType)
            ):
                # non-boolean operand: VRL runtime error when evaluated
                return Val(F.lit(None).cast("boolean"), T.BooleanType(),
                           fallible=True, always_err=True)
        out = F.coalesce(_resolve(lhs), F.lit(False)) & F.coalesce(
            _resolve(rhs), F.lit(False)
        )
        return Val(out, T.BooleanType())

    def _merge(self, lhs: Val, rhs: Val) -> Val:
        if isinstance(lhs.vtype, T.StructType) and isinstance(rhs.vtype, T.StructType):
            col = lhs.col
            fields = {f.name: f.dataType for f in lhs.vtype.fields}
            if not lhs.vtype.fields:
                # empty-object lhs: result is rhs
                return rhs
            for f in rhs.vtype.fields:
                col = col.withField(f.name, rhs.col.getField(f.name))
                fields[f.name] = f.dataType
            return Val(col, T.StructType(
                [T.StructField(k, v) for k, v in fields.items()]
            ))
        if isinstance(lhs.vtype, T.MapType) and isinstance(rhs.vtype, T.MapType):
            keep = F.map_filter(
                lhs.col, lambda k, _: ~F.array_contains(F.map_keys(rhs.col), k)
            )
            return Val(F.map_concat(keep, rhs.col), lhs.vtype)
        raise VrlUnsupported("merge on non-object operands")

    def _arith_err(self, lhs: Val, rhs: Val, op: str) -> Val:
        """Statically-impossible arithmetic: exact reference diagnostics
        (tests/expressions/arithmetic/*/invalid.vrl are the ground truth)."""
        ln, rn = _vrl_type_name(lhs.vtype), _vrl_type_name(rhs.vtype)
        msg = {
            "+": f"can't add type {rn} to {ln}",
            "-": f"can't subtract type {rn} from {ln}",
            "*": f"can't multiply type {ln} by {rn}",
            "/": f"can't divide type {ln} by {rn}",
        }[op]
        return Val(F.lit(None).cast("double"), T.DoubleType(),
                   fallible=True, always_err=True, err_msg=F.lit(msg))

    def _arith(self, lhs: Val, rhs: Val, op: str) -> Val:
        lt, rt = lhs.vtype, rhs.vtype
        lc, rc = _resolve(lhs), _resolve(rhs)
        fall = lhs.fallible or rhs.fallible
        if op == "+" and isinstance(lt, T.StringType) and isinstance(rt, T.StringType):
            if (lhs.pylit is not MISSING and rhs.pylit is not MISSING
                    and not fall and isinstance(lhs.pylit, str)
                    and isinstance(rhs.pylit, str)):
                return _lit(lhs.pylit + rhs.pylit, T.StringType())
            # concat_ws: a null (or VRL-null) operand contributes nothing
            # (tests/expressions/arithmetic/addition/null_string.vrl)
            return Val(F.concat_ws("", lc, rc), T.StringType(), fallible=fall)
        if op == "+" and isinstance(lt, T.NullType) and isinstance(rt, T.StringType):
            return Val(rc, T.StringType(), fallible=rhs.fallible)
        if op == "+" and isinstance(lt, T.StringType) and isinstance(rt, T.NullType):
            return Val(lc, T.StringType(), fallible=lhs.fallible)
        if op == "*":
            # string repetition (tests/expressions/arithmetic/multiplication)
            if isinstance(lt, T.StringType) and rt is not None and _is_int(rt):
                out = F.repeat(lc, F.greatest(rc.cast("int"), F.lit(0)))
                return Val(out, T.StringType(), fallible=fall)
            if lt is not None and _is_int(lt) and isinstance(rt, T.StringType):
                out = F.repeat(rc, F.greatest(lc.cast("int"), F.lit(0)))
                return Val(out, T.StringType(), fallible=fall)
        if lhs.always_err or rhs.always_err:
            bad = lhs if lhs.always_err else rhs
            return replace(bad, fallible=True, always_err=True)
        num_ok = (lt is None or _is_num(lt)) and (rt is None or _is_num(rt))
        if not num_ok:
            return self._arith_err(lhs, rhs, op)
        if op == "/":
            # ANSI-safe: division by zero is a VRL error -> NULL
            out = F.try_divide(lc.try_cast("double"), rc.try_cast("double"))
            return Val(out, T.DoubleType(), fallible=True,
                       err_msg=F.lit("can't divide by zero"))
        both_int = lt is not None and rt is not None and _is_int(lt) and _is_int(rt)
        t = T.LongType() if both_int else T.DoubleType()
        if lt is None or rt is None:
            t = None
        a = lc if t is None else lc.try_cast(t)
        b = rc if t is None else rc.try_cast(t)
        # try_add/subtract/multiply: integer overflow errors -> NULL
        out = {"+": F.try_add(a, b), "-": F.try_subtract(a, b),
               "*": F.try_multiply(a, b)}[op]
        return Val(out, t, fallible=fall)

    def _cmp(self, lhs: Val, rhs: Val, op: str) -> Val:
        lt, rt = lhs.vtype, rhs.vtype
        comparable = (
            lt is None or rt is None
            or (_is_num(lt) and _is_num(rt))
            or lt == rt
        )
        if not comparable:
            return Val(F.lit(None).cast("boolean"), T.BooleanType(),
                       fallible=True, always_err=True)
        lc, rc = _resolve(lhs), _resolve(rhs)
        if lt is not None and rt is not None and _is_num(lt) and _is_num(rt) and lt != rt:
            lc, rc = lc.cast("double"), rc.cast("double")
        out = {"<": lc < rc, "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc}[op]
        ae = lhs.always_err or rhs.always_err
        return Val(out, T.BooleanType(),
                   fallible=lhs.fallible or rhs.fallible or ae,
                   always_err=ae,
                   err_msg=lhs.err_msg if lhs.always_err else rhs.err_msg)

    def _not(self, node: Not) -> Val:
        v = self.expr(node.expr)
        if v.vtype is not None and not isinstance(v.vtype, (T.BooleanType, T.NullType)):
            return Val(F.lit(None).cast("boolean"), T.BooleanType(),
                       fallible=True, always_err=True)
        return Val(~_resolve(v).try_cast("boolean"), T.BooleanType(),
                   fallible=v.fallible)

    # -- if/else -----------------------------------------------------------
    def _if(self, node: If) -> Val:
        pred = self.expr(node.pred)
        if pred.vtype is not None and not isinstance(
            pred.vtype, (T.BooleanType, T.NullType)
        ):
            raise VrlCompileError("if-predicate must be boolean")
        if pred.fallible:
            raise VrlCompileError("if-predicate must be infallible (handle with ??)")
        if pred.pylit is not MISSING:
            # statically-decided condition (is_object(x) on a typed value,
            # cross-type equality, literal bools): compile only the taken
            # branch against the LIVE env — no branch merge, no type
            # unification of an arm that can never run
            if pred.pylit is True:
                return self.expr(node.then)
            if node.orelse is not None:
                return self.expr(node.orelse)
            return _NULL()
        predc = F.coalesce(_resolve(pred).try_cast("boolean"), F.lit(False))

        base = self.env
        env_t = base.clone()
        self.env = env_t
        then_val = self.expr(node.then)
        env_e = base.clone()
        self.env = env_e
        else_val = self.expr(node.orelse) if node.orelse is not None else _NULL()
        self.env = base
        self._merge_envs(predc, env_t, env_e)
        t = _unify_or_none(then_val.vtype, else_val.vtype)
        out = F.when(predc, _cast_to(then_val, t)).otherwise(_cast_to(else_val, t))
        return Val(out, t,
                   fallible=then_val.fallible or else_val.fallible)

    def _merge_envs(self, predc: Column, env_t: Env, env_e: Env) -> None:
        base = self.env

        def merged(tv: Val, ev: Val) -> Val:
            if tv is ev:
                return tv
            t = _unify_or_none(tv.vtype, ev.vtype)
            return Val(F.when(predc, _cast_to(tv, t)).otherwise(_cast_to(ev, t)), t)

        for name in set(env_t.fields) | set(env_e.fields) | (
            env_t.dropped | env_e.dropped
        ):
            if name in env_t.dropped and name in env_e.dropped:
                # dropped on BOTH paths — incl. drops inherited from
                # before the branch — stays dropped (resurrecting it
                # null-valued re-widened `. = parse(...)`-replaced
                # events with their pre-replacement columns)
                base.dropped.add(name)
                base.fields.pop(name, None)
                continue
            tv = env_t.get_field(name)
            ev = env_e.get_field(name)
            if name in (env_t.dropped | env_e.dropped):
                # conditional delete -> null out (divergence: null vs missing)
                base.dropped.discard(name)
            base.fields[name] = merged(tv, ev)
            if name not in base.order:
                base.order.append(name)
        for name in set(env_t.vars) | set(env_e.vars):
            tv = env_t.vars.get(name, base.vars.get(name, _NULL()))
            ev = env_e.vars.get(name, base.vars.get(name, _NULL()))
            base.vars[name] = merged(tv, ev)
        for name in [*env_t.meta_order,
                     *[n for n in env_e.meta_order if n not in env_t.meta_order]]:
            tv = env_t.meta.get(name, base.meta.get(name, _NULL()))
            ev = env_e.meta.get(name, base.meta.get(name, _NULL()))
            base.meta[name] = merged(tv, ev)
            if name not in base.meta_order:
                base.meta_order.append(name)
        if env_t.abort is not None or env_e.abort is not None:
            if env_t.abort is env_e.abort:
                base.abort = env_t.abort  # neither branch touched it
            else:
                ta = env_t.abort if env_t.abort is not None else F.lit(False)
                ea = env_e.abort if env_e.abort is not None else F.lit(False)
                base.abort = F.when(predc, ta).otherwise(ea)

    # -- function calls ----------------------------------------------------
    def _call(self, node: FnCall) -> Val:
        name = node.name
        if node.closure is not None:
            return self._closure_call(node)
        if name == "del":
            return self._del(node)
        if name == "exists":
            return self._exists(node)
        if name in ("assert", "assert_eq"):
            return self._assert(node)
        if name in _TYPE_ASSERTS:
            return self._type_assert(node)
        if name == "slice":
            return self._slice(node)
        if name == "merge":
            return self._merge_call(node)
        if name == "parse_regex":
            return self._parse_regex_call(node)
        if name in _IS_TESTS:
            v = self.expr(node.args[0][1])
            want = _IS_TESTS[name]
            res = isinstance(v.vtype, want) if want is not type(None) else (
                v.vtype is _REGEX
            )
            return _lit(bool(res), T.BooleanType())
        if name == "parse_json":
            arg_node = node.args[0][1]
            v = self.expr(arg_node)
            typed = self._json_schema_for(arg_node)
            if typed is not None:
                c = _resolve(v)
                # guard with try_parse_json: malformed input must yield
                # NULL (= VRL error), not a struct of nulls
                col = F.when(
                    F.try_parse_json(c).isNotNull(), F.from_json(c, typed)
                )
                return self._bangify(
                    node, Val(col, typed, fallible=True), v
                )
            out = Val(F.lit(None), None, fallible=True,
                      json=(_resolve(v), "$"))
            return self._bangify(node, out, v)
        if name in ("type_def", "get_env_var"):
            raise VrlUnsupported(f"{name}() has no DataFrame analogue")
        if name == "log":
            # log.rs: emits to the host's diagnostic log and returns
            # null. The side effect has no per-row DataFrame analogue
            # (observability belongs to df.observe/metrics); the
            # dataflow value — null, infallible — is preserved, so
            # programs that log-and-continue compile. Arguments still
            # compile (they may carry `!` aborts the program relies on).
            for _, e in node.args:
                self.expr(e)
            return _NULL()
        if name in ("push", "append"):
            return self._push_append(node)
        return self._registry_call(node)

    def _push_append(self, node: FnCall) -> Val:
        """push/append with element retyping.

        The registry forms return a dynamically-typed array; here the
        result element type is computed statically (unify of base element
        and pushed item), and a push onto the empty-array literal ADOPTS
        the item's type — rfcs/8381 accumulation idioms build typed
        arrays this way. Un-unifiable (heterogeneous) pushes fall back to
        the dynamic registry form.
        """
        a = self.expr(node.args[0][1])
        b = self.expr(node.args[1][1])
        if a.vtype is not None and not isinstance(a.vtype, T.ArrayType):
            # push/append on a statically non-array value (incl.
            # null/undefined) is a runtime ERROR whose success type is
            # still array — so `x, err = push(.x, v)` leaves x at the
            # array default [] and a following infallible push works
            # (issues/11287), and `push(s, v) ?? fallback` takes the
            # fallback (internal/progressive_type_checking)
            if node.name == "push":
                et = b.vtype or T.StringType()
            elif isinstance(b.vtype, T.ArrayType):
                et = b.vtype.elementType
            else:
                et = T.StringType()
            t = T.ArrayType(et)
            return Val(
                F.lit(None).cast(t), t, fallible=True, always_err=True,
                err_msg=F.lit(
                    f"expected array, got {_vrl_type_name(a.vtype)}"
                ),
            )
        if not isinstance(a.vtype, T.ArrayType):
            return self._registry_call(node)
        is_empty_lit = a.pylit is not MISSING and a.pylit == []
        if node.name == "push":
            if is_empty_lit:
                et = b.vtype or T.StringType()
                return Val(F.array(_resolve(b)), T.ArrayType(et))
            try:
                et = _unify(a.vtype.elementType, b.vtype)
            except VrlUnsupported:
                return self._registry_call(node)
            if et is None or isinstance(et, T.NullType):
                return self._registry_call(node)
            base = a.col
            if a.vtype.elementType != et:
                base = base.cast(T.ArrayType(et))
            return Val(F.array_append(base, _cast_to(b, et)),
                       T.ArrayType(et),
                       fallible=a.fallible or b.fallible)
        # append(a, b): b must itself be an array
        if not isinstance(b.vtype, T.ArrayType):
            return self._registry_call(node)
        if is_empty_lit:
            return b
        if b.pylit is not MISSING and b.pylit == []:
            return a
        try:
            et = _unify(a.vtype.elementType, b.vtype.elementType)
        except VrlUnsupported:
            return self._registry_call(node)
        if et is None or isinstance(et, T.NullType):
            return self._registry_call(node)
        at = T.ArrayType(et)
        ac = a.col if a.vtype == at else a.col.cast(at)
        bc = b.col if b.vtype == at else b.col.cast(at)
        return Val(F.concat(ac, bc), at,
                   fallible=a.fallible or b.fallible)

    def _closure_call(self, node: FnCall) -> Val:
        """VRL higher-order functions with closures, compiled to Spark
        lambda functions (filter/transform/map_* — JVM-side, no Python).

        VRL closure signatures (stdlib {filter,map_values,map_keys}.rs):
        arrays bind |index, value|, objects |key, value| for filter;
        map_values binds |value|, map_keys binds |key|. Closures here
        are pure expressions — VRL's outer-variable mutation
        (closure_scope_inheritance.vrl) is the province of for_each,
        which compiles it as an accumulator fold; in these mapping
        closures it is rejected at compile time.
        """
        name = node.name
        if name == "for_each":
            return self._for_each(node)
        if name not in ("filter", "map_values", "map_keys"):
            raise VrlUnsupported(f"closure argument to {name}")
        recursive = False
        for arg_name, e in node.args[1:]:
            v = self.expr(e)
            if arg_name == "recursive":
                if v.pylit is MISSING:
                    raise VrlUnsupported("recursive flag must be a literal")
                recursive = bool(v.pylit)
        target = self.expr(node.args[0][1])
        params, body = node.closure
        t = target.vtype

        def run_body(bindings: dict) -> Val:
            base = self.env
            env2 = base.clone()
            self.env = env2
            try:
                for k, v in bindings.items():
                    if k and k != "_":
                        env2.vars[k] = v
            finally:
                pass
            try:
                out = self.expr(body)
            finally:
                self.env = base
            changed = (
                set(env2.fields) != set(base.fields)
                or any(env2.fields[k] is not base.fields[k] for k in base.fields)
                or env2.abort is not base.abort
                or any(
                    k in base.vars and env2.vars[k] is not base.vars[k]
                    for k in env2.vars
                )
            )
            if changed:
                raise VrlUnsupported("closure mutates outer state")
            return out

        def p(i):
            return params[i] if i < len(params) else "_"

        if recursive and name in ("map_values", "map_keys"):
            return self._map_recursive(name, target, run_body, p)

        if isinstance(t, T.ArrayType):
            elem = t.elementType
            if name == "filter":
                # VRL binds |index, value| on arrays
                def pred(x, i):
                    out = run_body({p(0): Val(i, T.LongType()),
                                    p(1): Val(x, elem)})
                    return F.coalesce(
                        _resolve(out).try_cast("boolean"), F.lit(False)
                    )
                return Val(F.filter(target.col, pred), t)
            if name == "map_values":
                holder = {}

                def fn(x):
                    out = run_body({p(0): Val(x, elem)})
                    holder["t"] = out.vtype
                    return _resolve(out)
                col = F.transform(target.col, fn)
                return Val(col, T.ArrayType(holder.get("t") or T.StringType()))
            raise VrlUnsupported("map_keys on array")
        if isinstance(t, T.MapType):
            kt, vt = t.keyType, t.valueType
            if name == "filter":
                def pred2(k, v):
                    out = run_body({p(0): Val(k, kt), p(1): Val(v, vt)})
                    return F.coalesce(
                        _resolve(out).try_cast("boolean"), F.lit(False)
                    )
                return Val(F.map_filter(target.col, pred2), t)
            if name == "map_values":
                holder = {}

                def fnv(k, v):
                    out = run_body({p(0): Val(v, vt)})
                    holder["t"] = out.vtype
                    return _resolve(out)
                col = F.transform_values(target.col, fnv)
                return Val(col, T.MapType(kt, holder.get("t") or T.StringType()))
            holder = {}

            def fnk(k, v):
                out = run_body({p(0): Val(k, kt)})
                holder["t"] = out.vtype
                return _resolve(out)
            col = F.transform_keys(target.col, fnk)
            return Val(col, T.MapType(holder.get("t") or T.StringType(), vt))
        if isinstance(t, T.StructType):
            if name == "map_values":
                # static expansion: one body instance per field
                cols, fields = [], []
                for f in t.fields:
                    out = run_body({
                        p(0): Val(target.col.getField(f.name), f.dataType)
                    })
                    cols.append(_resolve(out).alias(f.name))
                    fields.append(
                        T.StructField(f.name, out.vtype or T.StringType())
                    )
                return Val(F.struct(*cols), T.StructType(fields))
            if name == "map_keys":
                # static rename: the key closure runs against each literal
                # field name and must constant-fold to the new name
                cols, fields = [], []
                for f in t.fields:
                    nn = self._fold_key(run_body, p, f.name)
                    cols.append(target.col.getField(f.name).alias(nn))
                    fields.append(T.StructField(nn, f.dataType))
                return Val(F.struct(*cols), T.StructType(fields))
            # filter changes the static field set per-row
            raise VrlUnsupported(f"{name} closure on object (static schema)")
        raise VrlUnsupported(f"{name} closure on {_vrl_type_name(t)}")

    def _fold_key(self, run_body, p, key: str) -> str:
        out = run_body({p(0): _lit(key, T.StringType())})
        if out.pylit is MISSING or not isinstance(out.pylit, str):
            raise VrlUnsupported(
                "map_keys closure on object (static schema) must "
                "constant-fold — string functions on the literal key")
        return out.pylit

    def _map_recursive(self, name: str, target: Val, run_body, p) -> Val:
        """recursive map_values / map_keys.

        Reference semantics (stdlib map_values.rs example + the
        rfcs/8381 corpus): the value closure applies to LEAF values,
        containers are descended into; map_keys maps every object key at
        every depth. Static structs expand at compile time (map_keys
        field names come from constant-folding the key closure); arrays
        and maps descend through JVM lambda transforms — no Python in
        the resulting plan.
        """

        def descend(col, dtype):
            if isinstance(dtype, T.StructType):
                if not dtype.fields:
                    return col, dtype
                cols, fields = [], []
                for f in dtype.fields:
                    fname = f.name
                    if name == "map_keys":
                        fname = self._fold_key(run_body, p, f.name)
                    c2, t2 = descend(col.getField(f.name), f.dataType)
                    cols.append(c2.alias(fname))
                    fields.append(T.StructField(fname, t2))
                return F.struct(*cols), T.StructType(fields)
            if isinstance(dtype, T.ArrayType):
                holder = {}

                def fn(x):
                    c2, t2 = descend(x, dtype.elementType)
                    holder["t"] = t2
                    return c2
                out = F.transform(col, fn)
                return out, T.ArrayType(holder.get("t") or dtype.elementType)
            if isinstance(dtype, T.MapType):
                mcol, kt = col, dtype.keyType
                if name == "map_keys":
                    mcol = F.transform_keys(mcol, lambda k, _v: _resolve(
                        run_body({p(0): Val(k, dtype.keyType)})))
                    kt = T.StringType()
                holder = {}

                def fnv(_k, v):
                    c2, t2 = descend(v, dtype.valueType)
                    holder["t"] = t2
                    return c2
                out = F.transform_values(mcol, fnv)
                return out, T.MapType(kt, holder.get("t") or dtype.valueType)
            if name == "map_keys":
                return col, dtype
            out = run_body({p(0): Val(col, dtype)})
            return _resolve(out), out.vtype or dtype

        if not isinstance(target.vtype,
                          (T.StructType, T.ArrayType, T.MapType)):
            raise VrlUnsupported(
                f"{name} closure on {_vrl_type_name(target.vtype)}")
        c, t2 = descend(target.col, target.vtype)
        return Val(c, t2)

    def _for_each(self, node: FnCall) -> Val:
        """for_each with outer-variable accumulation.

        VRL's for_each closure mutates enclosing variables
        (closure_scope_inheritance.vrl: closure PARAMS shadow outer
        variables and are discarded; other assigned outer variables
        persist). Two compilation strategies:

        - static objects: loop unrolling — the body executes once per
          field against the live env, params temporarily shadowing;
        - arrays/maps: the set of assigned outer variables becomes a
          packed accumulator struct folded with F.aggregate (a real
          JVM fold; the index/key is delivered through a
          struct-entries transform).
        """
        target = self.expr(node.args[0][1])
        params, body = node.closure
        t = target.vtype

        def p(i):
            return params[i] if i < len(params) else "_"

        def run_inline(kv0: Val, kv1: Val) -> None:
            saved = {}
            for pname, bound in ((p(0), kv0), (p(1), kv1)):
                if pname and pname != "_":
                    saved[pname] = self.env.vars.get(pname, MISSING)
                    self.env.vars[pname] = bound
            try:
                self.expr(body)
            finally:
                for pname, old in saved.items():
                    if old is MISSING:
                        self.env.vars.pop(pname, None)
                    else:
                        self.env.vars[pname] = old

        if isinstance(t, T.StructType):
            for f in t.fields:
                run_inline(
                    Val(F.lit(f.name), T.StringType(), pylit=f.name),
                    Val(target.col.getField(f.name), f.dataType),
                )
            return _NULL()
        if isinstance(t, (T.ArrayType, T.MapType)):
            if _assigns_event(body):
                # the fold path accumulates VARIABLES; a per-element event
                # write (`. = set!(., [k], v)`) has no static analogue
                raise VrlUnsupported(
                    "for_each closure assigning event paths (dynamic keys)")
            assigned = _assigned_var_names(body)
            base = self.env
            acc_names = sorted(
                n for n in assigned
                if n in base.vars and n not in (p(0), p(1))
            )
            if isinstance(t, T.ArrayType):
                entries = F.transform(
                    target.col,
                    lambda v, i: F.struct(i.alias("k"), v.alias("v")),
                )
                kt, vt = T.IntegerType(), t.elementType
            else:
                entries = F.map_entries(target.col)
                kt, vt = t.keyType, t.valueType
            acc_types = {n: base.vars[n].vtype for n in acc_names}
            # hidden accumulator slot: the runtime abort state threads
            # through the fold, so a per-element `f!()` abort
            # (find_match_against_list_of_regular_expressions.vrl uses
            # match!) propagates out instead of being dropped
            init_ab = (F.coalesce(base.abort, F.lit(False))
                       if base.abort is not None else F.lit(False))
            init = F.struct(*(
                [_resolve(base.vars[n]).alias(n) for n in acc_names]
                + [init_ab.alias("__ab")]
            ))
            ab_hit = {}

            def merge(acc, entry):
                env3 = base.clone()
                seeded = acc.getField("__ab")
                env3.abort = seeded
                self.env = env3
                try:
                    for n in acc_names:
                        env3.vars[n] = Val(acc.getField(n), acc_types[n])
                    for pname, bound in (
                        (p(0), Val(entry.getField("k" if isinstance(t, T.ArrayType) else "key"), kt)),
                        (p(1), Val(entry.getField("v" if isinstance(t, T.ArrayType) else "value"), vt)),
                    ):
                        if pname and pname != "_":
                            env3.vars[pname] = bound
                    self.expr(body)
                    if (set(env3.fields) != set(base.fields)
                            or any(env3.fields[k] is not base.fields.get(k)
                                   for k in env3.fields)
                            or env3.dropped != base.dropped):
                        # per-element event writes cannot ride the
                        # accumulator struct — refuse, don't drop them
                        raise VrlUnsupported(
                            "for_each closure mutating event state")
                    ab_hit["y"] = env3.abort is not seeded
                    return F.struct(*(
                        [_cast_to(env3.vars[n], acc_types[n]).alias(n)
                         for n in acc_names]
                        + [F.coalesce(env3.abort, F.lit(False)).alias("__ab")]
                    ))
                finally:
                    self.env = base
            if not acc_names and not _may_abort(body):
                return _NULL()  # body has no observable effect
            res = F.aggregate(entries, init, merge)
            for n in acc_names:
                base.vars[n] = Val(res.getField(n), acc_types[n])
            if ab_hit.get("y"):
                base.abort = res.getField("__ab")
            return _NULL()
        raise VrlUnsupported(f"for_each on {_vrl_type_name(t)}")

    def _json_schema_for(self, arg_node):
        """Look up a caller-provided schema for parse_json(<event path>)."""
        if not self.json_schemas:
            return None
        if isinstance(arg_node, Query) and arg_node.target[0] == "event":
            key = "." + ".".join(
                seg[1] for seg in arg_node.path if seg[0] == "field"
            )
            return self.json_schemas.get(key)
        return None

    def _bangify(self, node: FnCall, out: Val, first_arg: Val | None) -> Val:
        if not node.bang:
            return out
        res = _resolve(out)
        err = res.isNull()
        if first_arg is not None:
            err = err & _resolve(first_arg).isNotNull()
        self._note_abort(err)
        return replace(out, fallible=False, always_err=False)

    def _del(self, node: FnCall) -> Val:
        arg = node.args[0][1]
        if (isinstance(arg, Query) and arg.target[0] == "var"
                and arg.path and all(s[0] == "field" for s in arg.path)):
            # del on a variable's struct path (closure-param mutation in
            # rfcs/8381 delete_a_field...): rebuild the struct minus the
            # field and rebind the variable
            vname = arg.target[1]
            cur = self.env.vars.get(vname)
            if cur is None:
                raise VrlCompileError(f"undefined variable {vname}")
            if not isinstance(cur.vtype, T.StructType):
                raise VrlUnsupported("del() on non-object variable")
            names = [s[1] for s in arg.path]
            if names[0] not in cur.vtype.fieldNames():
                return _NULL()  # deleting a missing field yields null
            old = self._query(arg)
            newt = _drop_struct_field(cur.vtype, names)
            self.env.vars[vname] = Val(
                cur.col.dropFields(".".join(names)), newt
            )
            return old
        if (isinstance(arg, Query) and arg.target[0] == "meta"
                and len(arg.path) == 1 and arg.path[0][0] == "field"):
            name = arg.path[0][1]
            old = self._meta_get(arg.path)
            self.env.meta.pop(name, None)
            if name in self.env.meta_order:
                self.env.meta_order.remove(name)
            return old
        if not (isinstance(arg, Query) and arg.target[0] == "event"):
            raise VrlUnsupported("del() on non-event path")
        path = arg.path
        old = self._event_get(path)
        if len(path) == 1 and path[0][0] == "field":
            name = path[0][1]
            if self.env.abort is not None:
                self.env.fields[name] = Val(
                    self._guard(F.lit(None), _resolve(old)),
                    old.vtype,
                )
                self.env.cond_dropped.add(name)
            else:
                self.env.fields.pop(name, None)
                self.env.dropped.add(name)
        elif path and path[0][0] == "field" and all(s[0] == "field" for s in path):
            name = path[0][1]
            cur = self.env.get_field(name)
            if isinstance(cur.vtype, T.StructType):
                inner = ".".join(s[1] for s in path[1:])
                newt = _drop_struct_field(cur.vtype, [s[1] for s in path[1:]])
                self.env.fields[name] = Val(
                    self._guard(cur.col.dropFields(inner), _resolve(cur)), newt
                )
        else:
            raise VrlUnsupported("del() with index path")
        return old

    def _exists(self, node: FnCall) -> Val:
        arg = node.args[0][1]
        if isinstance(arg, Query) and arg.target[0] == "meta":
            if len(arg.path) == 1 and arg.path[0][0] == "field":
                return _lit(arg.path[0][1] in self.env.meta, T.BooleanType())
            v = self._meta_get(arg.path)
            if isinstance(v.vtype, T.NullType):
                return _lit(False, T.BooleanType())
            return Val(_resolve(v).isNotNull(), T.BooleanType())
        if not (isinstance(arg, Query) and arg.target[0] == "event"):
            raise VrlUnsupported("exists() on non-event path")
        path = arg.path
        if len(path) == 1 and path[0][0] == "field":
            return _lit(self.env.has_field(path[0][1]), T.BooleanType())
        v = self._event_get(path)
        if isinstance(v.vtype, T.NullType):
            return _lit(False, T.BooleanType())
        return Val(_resolve(v).isNotNull(), T.BooleanType())

    def _assert(self, node: FnCall) -> Val:
        if node.name == "assert_eq":
            a = self.expr(node.args[0][1])
            b = self.expr(node.args[1][1])
            cond = self._eq(a, b, "==")
        else:
            cond = self.expr(node.args[0][1])
        failed = ~F.coalesce(_resolve(cond).try_cast("boolean"), F.lit(False))
        if node.bang:
            self._note_abort(failed)
            return _lit(True, T.BooleanType())
        return Val(F.when(failed, F.lit(None)).otherwise(F.lit(True)),
                   T.BooleanType(), fallible=True)

    def _type_assert(self, node: FnCall) -> Val:
        want = _TYPE_ASSERTS[node.name]
        v = self.expr(node.args[0][1])
        matches = isinstance(v.vtype, want) or (
            want is T.DoubleType and _is_num(v.vtype or T.NullType())
        )
        if v.vtype is None:
            # dynamic (JSON proxy): cast on faith
            casts = {"int": "long", "float": "double", "string": "string",
                     "bool": "boolean"}
            if node.name in casts:
                out = Val(_resolve(v).try_cast(casts[node.name]),
                          _TYPE_ASSERTS[node.name](), fallible=True)
                return self._bangify(node, out, None)
            raise VrlUnsupported(f"{node.name}() on dynamic value")
        if matches:
            out = replace(v, fallible=True)  # null value = assertion error
            return self._bangify(node, out, None)
        # static type mismatch: always errors at runtime in VRL
        if node.bang:
            self._note_abort(F.lit(True))
            return replace(v, fallible=False)
        return Val(F.lit(None).cast("string"), T.StringType(),
                   fallible=True, always_err=True)

    def _named_args(self, node: FnCall, names: list):
        """Resolve a FnCall's args to the reference parameter order:
        positional args fill `names` left to right, keyword args match
        by name. Returns AST nodes (None where absent)."""
        kw = {n: e for n, e in node.args if n}
        pos = [e for n, e in node.args if not n]
        out = []
        for i, nm in enumerate(names):
            out.append(kw.get(nm, pos[i] if len(pos) > i else None))
        return out

    def _slice(self, node: FnCall) -> Val:
        """slice.rs:6-41: value is string|array; start inclusive, end
        exclusive, negatives count from the end, end defaults to len and
        clamps to len; adjusted start outside [0, len] or end<start is a
        per-row ERROR (null here, abort under slice!)."""
        vnode, snode, enode = self._named_args(node, ["value", "start", "end"])
        v = self.expr(vnode)
        s = self.expr(snode)
        is_arr = isinstance(v.vtype, T.ArrayType)
        is_str = isinstance(v.vtype, T.StringType)
        if not (is_arr or is_str):
            tn = _vrl_type_name(v.vtype)
            out = Val(
                F.lit(None).cast("string"), T.StringType(), fallible=True,
                always_err=True,
                err_msg=F.lit(f"expected string or array, got {tn}"),
            )
            return self._bangify(node, out, v)
        c, sc = _resolve(v), _resolve(s).cast("int")
        n = F.size(c) if is_arr else F.length(c)
        start = F.when(sc < 0, sc + n).otherwise(sc)
        if enode is None:
            end = n
        else:
            ec = _resolve(self.expr(enode)).cast("int")
            end = F.when(ec < 0, ec + n).otherwise(ec)
        err = (start < 0) | (start > n) | (end < start)
        eff_end = F.least(end, n)
        length = F.greatest(eff_end - start, F.lit(0))
        if is_arr:
            body = F.slice(c, F.greatest(start, F.lit(0)) + 1, length)
        else:
            body = c.substr(F.greatest(start, F.lit(0)) + 1, length)
        out = Val(F.when(~err, body), v.vtype, fallible=True)
        return self._bangify(node, out, v)

    def _merge_call(self, node: FnCall) -> Val:
        """merge.rs: shallow (default) or deep merge of two objects;
        non-object operands are an error. Static struct types make the
        deep recursion a compile-time fold."""
        tnode, fnode, dnode = self._named_args(node, ["to", "from", "deep"])
        to, frm = self.expr(tnode), self.expr(fnode)
        deep = False
        if dnode is not None:
            dv = self.expr(dnode)
            if dv.pylit is MISSING or not isinstance(dv.pylit, bool):
                raise VrlUnsupported("merge(deep:) must be a literal bool")
            deep = dv.pylit
        objs = (T.StructType, T.MapType)
        if not (isinstance(to.vtype, objs) and isinstance(frm.vtype, objs)):
            out = Val(
                F.from_json(F.lit(None), T.StructType([])), T.StructType([]),
                fallible=True, always_err=True,
                err_msg=F.lit("merge on non-object operands"),
            )
            return self._bangify(node, out, to)
        out = self._merge_deep(to, frm) if deep else self._merge(to, frm)
        return self._bangify(node, out, to)

    def _merge_deep(self, lhs: Val, rhs: Val) -> Val:
        if isinstance(lhs.vtype, T.StructType) and isinstance(
                rhs.vtype, T.StructType):
            col = lhs.col
            fields = {f.name: f.dataType for f in lhs.vtype.fields}
            if not lhs.vtype.fields:
                return rhs
            for f in rhs.vtype.fields:
                rv = Val(rhs.col.getField(f.name), f.dataType)
                if (f.name in fields
                        and isinstance(fields[f.name], T.StructType)
                        and isinstance(f.dataType, T.StructType)):
                    rv = self._merge_deep(
                        Val(col.getField(f.name), fields[f.name]), rv
                    )
                col = col.withField(f.name, rv.col)
                fields[f.name] = rv.vtype
            return Val(col, T.StructType(
                [T.StructField(k, v) for k, v in fields.items()]
            ))
        return self._merge(lhs, rhs)

    def _parse_regex_call(self, node: FnCall) -> Val:
        """parse_regex.rs: named captures -> object; numeric_groups adds
        '0' (whole match) and '1'..'N' (every capture by index). The
        pattern must be a regex literal — its group table is compiled
        here on the driver, the per-row work is one JVM regexp pass."""
        vnode, pnode, gnode = self._named_args(
            node, ["value", "pattern", "numeric_groups"]
        )
        v = self.expr(vnode)
        p = self.expr(pnode)
        if p.vtype is not _REGEX or not isinstance(p.pylit, str):
            raise VrlUnsupported("parse_regex pattern must be a regex literal")
        numeric = False
        if gnode is not None:
            gv = self.expr(gnode)
            if gv.pylit is MISSING or not isinstance(gv.pylit, bool):
                raise VrlUnsupported(
                    "parse_regex(numeric_groups:) must be a literal bool"
                )
            numeric = gv.pylit
        try:
            compiled = _re.compile(p.pylit)
        except _re.error as e:
            raise VrlUnsupported(f"parse_regex: bad pattern: {e}") from e
        groups = {nm: ix for nm, ix in compiled.groupindex.items()}
        if numeric:
            groups.update({str(i): i for i in range(compiled.groups + 1)})
        # JVM regex dialect: strip python's P from named groups
        java_rx = p.pylit.replace("(?P<", "(?<")
        from vector_spark.functions.parse import parse_regex as _pr

        stype = T.StructType(
            [T.StructField(nm, T.StringType()) for nm in groups]
        )
        c = _resolve(v)
        # no-match is a VRL ERROR ("could not find any pattern matches"):
        # NULL struct here so `!` aborts and `??` falls back, not a
        # struct of nulls
        out_col = F.when(c.rlike(java_rx), _pr(c, java_rx, groups))
        out = Val(out_col, stype, fallible=True)
        return self._bangify(node, out, v)

    # python null-substitute, cast target, result type (Columns are
    # built lazily: no SparkContext exists at import time)
    _NULL_COERCE = {
        "to_int": (0, "long", T.LongType()),
        "to_float": (0.0, "double", T.DoubleType()),
        "to_bool": (False, "boolean", T.BooleanType()),
        "to_string": ("", "string", T.StringType()),
    }

    def _registry_call(self, node: FnCall) -> Val:
        from vector_spark.functions.vrl_map import VRL

        name = node.name
        if name in self._NULL_COERCE:
            return self._to_coerce(node)
        ent = VRL.get(name)
        if ent is None or ent.fn is None:
            raise VrlUnsupported(f"function {name} has no Column builder")
        pos, kw = [], {}
        vals = []
        val_pos, val_kw = [], {}
        for arg_name, e in node.args:
            v = self.expr(e)
            vals.append(v)
            if arg_name == "value":
                val_pos.insert(0, v)
            elif arg_name:
                val_kw[arg_name] = v
            else:
                val_pos.append(v)
            # registry callables take (value_column, *python_literals); a
            # null literal must stay a Column (None would be a missing arg)
            # and a [] marker (empty-array literal) has no literal analogue
            if (v.pylit is not MISSING and v.pylit is not None
                    and not isinstance(v.pylit, list)):
                pyarg = v.pylit
            else:
                pyarg = _resolve(v)
            if arg_name == "value":
                # `value:` is VRL's name for the subject argument
                pos.insert(0, pyarg)
            elif arg_name:
                kw[arg_name] = pyarg
            else:
                pos.append(pyarg)
        if (name in _SCALAR_INPUT_FNS and val_pos
                and val_pos[0].vtype is not None
                and not isinstance(val_pos[0].vtype,
                                   (T.StringType, T.NullType))):
            # statically-known non-string into a string function: a
            # per-row runtime error in VRL (`upcase(arr) ?? fallback`
            # takes the fallback, upcase(3.2) doesn't stringify-then-
            # upcase), never a Spark AnalysisException or implicit cast
            ret = _RET.get(name) or T.StringType()
            out = Val(
                F.lit(None).cast(ret), ret, fallible=True, always_err=True,
                err_msg=F.lit(
                    f"expected string, got {_vrl_type_name(val_pos[0].vtype)}"
                ),
            )
            return self._bangify(node, out, val_pos[0])
        folded = _try_pyfold(name, val_pos, val_kw)
        if folded is not MISSING:
            return self._bangify(node, _lit(folded, T.StringType()),
                                 vals[0] if vals else None)
        if pos and isinstance(pos[0], (str, int, float, bool)):
            pos[0] = F.lit(pos[0])  # first arg is always the value column
        try:
            col = ent.fn(*pos, **kw)
        except TypeError as e:
            raise VrlUnsupported(f"{name}(): {e}") from e
        ret = _RET.get(name)
        if (name in ("parse_apache_log", "parse_common_log")
                and isinstance(kw.get("format"), str)):
            # the return shape depends on the format literal
            ret = _presets.PARSE_APACHE_LOG_TYPES.get(kw["format"], ret)
        if name == "parse_nginx_log" and isinstance(kw.get("format"), str):
            ret = _presets.PARSE_NGINX_LOG_TYPES.get(kw["format"], ret)
        out = Val(col, ret, fallible=_fallible_fn(name))
        return self._bangify(node, out, vals[0] if vals else None)

    def _to_coerce(self, node: FnCall) -> Val:
        name = node.name
        null_py, cast_t, vtype = self._NULL_COERCE[name]
        null_sub = F.lit(null_py)
        v = self.expr(node.args[0][1])
        c = _resolve(v)
        if isinstance(v.vtype, (T.ArrayType, T.StructType, T.MapType)) or (
            v.vtype is _REGEX
        ):
            # VRL cannot coerce collections/regexes to scalars
            tn = _vrl_type_name(v.vtype)
            return Val(
                F.lit(None).cast(cast_t), vtype, fallible=True,
                always_err=True,
                err_msg=F.lit(f"unable to coerce {tn} into {name[3:]}"),
            )
        if name == "to_bool" and isinstance(v.vtype, T.StringType):
            from vector_spark.functions import vrl_compat as V

            base = V.to_bool(c)
        elif name == "to_int" and isinstance(v.vtype, T.TimestampType):
            base = c.try_cast("long")
        elif name == "to_string" and isinstance(v.vtype, T.BooleanType):
            base = F.when(c, "true").otherwise("false")
        else:
            base = c.try_cast(cast_t)
        out = F.when(c.isNull(), null_sub).otherwise(base)
        # fallible only when a runtime parse can fail (string sources)
        fall = isinstance(v.vtype, (T.StringType,)) or v.vtype is None
        if name == "to_string":
            fall = False
        out_v = Val(out, vtype, fallible=fall)
        return self._bangify(node, out_v, v)


def _try_pyfold(name: str, vals: list, kw: dict):
    """Compile-time evaluation of pure string functions over literal
    arguments. map_keys on a static struct needs the mapped key as a
    Python value (struct field names are compile-time), so the common
    key closures — replace / upcase / downcase / string concat — fold
    here instead of producing Columns. Returns MISSING when not foldable
    (non-literal args, capture-group templates)."""
    import re as _re

    def pv(i):
        if i >= len(vals):
            return MISSING
        v = vals[i]
        return v.pylit if v.pylit is not MISSING and not v.fallible else MISSING

    if name in ("upcase", "downcase") and len(vals) == 1 and not kw:
        s = pv(0)
        if isinstance(s, str):
            return s.upper() if name == "upcase" else s.lower()
        return MISSING
    if name == "replace" and len(vals) + len(kw) >= 3:
        s, p = pv(0), pv(1)
        repv = kw.get("with") or (vals[2] if len(vals) > 2 else None)
        rep = repv.pylit if repv is not None and repv.pylit is not MISSING else MISSING
        cntv = kw.get("count") or (vals[3] if len(vals) > 3 else None)
        cnt = -1 if cntv is None else (
            cntv.pylit if cntv.pylit is not MISSING else MISSING
        )
        if not (isinstance(s, str) and isinstance(p, str)
                and isinstance(rep, str) and isinstance(cnt, int)):
            return MISSING
        if "$" in rep or "\\" in rep:
            return MISSING  # capture-group template: leave to the Column form
        if vals[1].vtype is _REGEX:
            try:
                return _re.sub(p, rep, s, count=0 if cnt < 0 else cnt)
            except _re.error:
                return MISSING
        return s.replace(p, rep) if cnt < 0 else s.replace(p, rep, cnt)
    return MISSING


def _assigned_var_names(body) -> set:
    """Variable names assigned anywhere in a closure body AST."""
    out: set = set()
    _walk_assigns(body, lambda t: out.add(t[1]) if t[0] == "var" else None)
    return out


def _may_abort(body) -> bool:
    """True if the closure body contains an abort or any `f!()` call."""
    import dataclasses

    hit = []

    def walk(n):
        if isinstance(n, Abort) or (
            isinstance(n, FnCall) and getattr(n, "bang", False)
        ):
            hit.append(1)
            return
        if dataclasses.is_dataclass(n):
            for f in dataclasses.fields(n):
                walk(getattr(n, f.name))
        elif isinstance(n, (list, tuple)):
            for x in n:
                walk(x)

    walk(body)
    return bool(hit)


def _assigns_event(body) -> bool:
    """True if any assignment in the closure body targets an event path."""
    hit = []
    _walk_assigns(body, lambda t: hit.append(1) if t[0] == "event" else None)
    return bool(hit)


def _walk_assigns(body, visit) -> None:
    import dataclasses

    def walk(n):
        if isinstance(n, Assign):
            for tgt in n.targets:
                visit(tgt)
        if dataclasses.is_dataclass(n):
            for f in dataclasses.fields(n):
                walk(getattr(n, f.name))
        elif isinstance(n, (list, tuple)):
            for x in n:
                walk(x)

    walk(body)


def _unify_or_none(a, b):
    try:
        return _unify(a, b)
    except VrlUnsupported:
        return None


def _drop_struct_field(t: T.StructType, names: list) -> T.StructType:
    if len(names) == 1:
        return T.StructType([f for f in t.fields if f.name != names[0]])
    return T.StructType([
        f if f.name != names[0] else T.StructField(
            f.name, _drop_struct_field(f.dataType, names[1:])
        )
        for f in t.fields
    ])


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


@dataclass
class CompiledVrl:
    source: str
    env: Env
    result: Val
    # when the program's final expression is an array literal whose items
    # cannot share one Spark type (VRL arrays are heterogeneous), the items
    # compile to individual result slots instead (golden-replay support)
    result_items: list | None = None

    def apply(self, df, drop_aborted: bool = True, result_col: str | None = None):
        """Run the program over a DataFrame.

        Returns the transformed frame; aborted rows are dropped (the
        remap drop-on-abort path) unless drop_aborted=False, in which
        case an `_aborted` boolean column is kept for routing.
        """
        env = self.env
        hidden = set(env.dropped)
        if drop_aborted:
            # aborted rows are not emitted, so conditionally-deleted
            # columns are simply gone
            hidden |= env.cond_dropped
        cols = []
        for n in env.order:
            if n in hidden:
                continue
            cols.append(_resolve(env.get_field(n)).alias(n))
        for n in env.fields:
            if n not in env.order and n not in hidden:
                cols.append(_resolve(env.fields[n]).alias(n))
        if result_col:
            if self.result_items is not None:
                for i, v in enumerate(self.result_items):
                    cols.append(_resolve(v).alias(f"{result_col}{i}"))
            else:
                cols.append(_resolve(self.result).alias(result_col))
        abort = env.abort
        if abort is not None:
            cols.append(F.coalesce(abort, F.lit(False)).alias("_aborted"))
        out = df.select(*cols)
        if abort is not None and drop_aborted:
            out = out.filter(~F.col("_aborted")).drop("_aborted")
        return out


def compile_vrl(
    source: str,
    schema: T.StructType | None = None,
    split_array_result: bool = False,
    json_schemas: dict | None = None,
) -> CompiledVrl:
    """Compile VRL source against a DataFrame schema.

    json_schemas: optional {".path": "ddl or DataType"} giving
    parse_json on that event path a typed result — the static-schema
    analogue of VRL's dynamic parse (enables `. = parse_json!(.msg)`).
    """
    prog = parse_vrl(source)
    comp = _Compiler(schema or T.StructType([]), json_schemas=json_schemas)
    if split_array_result and prog.stmts and isinstance(prog.stmts[-1], Arr):
        comp.run(Program(prog.stmts[:-1]))
        items = [comp.expr(e) for e in prog.stmts[-1].items]
        return CompiledVrl(source, comp.env, _NULL(), result_items=items)
    result = comp.run(prog)
    return CompiledVrl(source, comp.env, result)


def eval_vrl(spark, source: str, obj: dict | None = None):
    """Golden-replay harness: run a VRL program over one event.

    Returns (result_value, event_dict, aborted) as plain Python values.
    The event is built via the JSON reader so nested objects become
    structs (typed like real data), exactly one row.
    """
    import json as _json

    sdf = spark.read.json(
        spark.sparkContext.parallelize([_json.dumps(obj or {})])
    )
    if obj in (None, {}):
        sdf = spark.range(1).select()
    compiled = compile_vrl(source, sdf.schema, split_array_result=True)
    out = compiled.apply(sdf, drop_aborted=False, result_col="__r")
    row = out.collect()[0].asDict(recursive=True)
    aborted = bool(row.pop("_aborted", False))

    def _unproxy(v, val):
        # JSON-proxy and dynamic results are stringly typed; recover the
        # JSON value ("false" -> False, "5" -> 5; bare words stay strings).
        # A dynamic ARRAY (e.g. parse_json mapped over elements) decodes
        # element-wise.
        if val is not None and (val.json is not None or val.vtype is None):
            if isinstance(v, str):
                try:
                    return _json.loads(v)
                except _json.JSONDecodeError:
                    return v
            if isinstance(v, list):
                return [_unproxy(x, val) for x in v]
        return v

    if compiled.result_items is not None:
        result = [
            _unproxy(row.pop(f"__r{i}"), compiled.result_items[i])
            for i in range(len(compiled.result_items))
        ]
    else:
        result = _unproxy(row.pop("__r"), compiled.result)
    return result, row, aborted


def remap_vrl(df, source: str, drop_aborted: bool = True,
              json_schemas: dict | None = None):
    """vector's remap-with-VRL-source transform, compiled to Columns.

    Reference: src/transforms/remap.rs (VRL program over each event);
    here the program compiles once against df.schema and runs as native
    expressions inside whole-stage codegen.
    """
    return compile_vrl(source, df.schema, json_schemas=json_schemas).apply(
        df, drop_aborted=drop_aborted
    )
