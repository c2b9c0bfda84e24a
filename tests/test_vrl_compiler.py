"""VRL source -> Spark Column compiler: reference-corpus golden replay.

Runs the reference's own end-to-end VRL expression tests
(lib/vrl/tests/tests/expressions/**/*.vrl: `# object:` input event,
`# result:` expected value) through the full pipeline
parse_vrl -> compile_vrl -> one-row DataFrame -> collect, and compares
values exactly. Every in-scope file must PASS; out-of-scope files must
skip for one of a fixed set of documented reasons (dynamic-typing edges
a statically-typed engine cannot express, reference-internal
diagnostics, the type_def reflection function).

Plus direct unit tests of the remap_vrl operator over a multi-row frame
(the production path: transforms/remap.rs remap with VRL source).
"""

import glob
import json
import math

import pytest
from pyspark.errors import AnalysisException
from pyspark.sql import functions as F

from vector_spark.functions.vrl_lang import (
    VrlParseError,
    VrlUnsupported,
    parse_vrl,
)
from vector_spark.functions.vrl_codegen import (
    VrlCompileError,
    compile_vrl,
    eval_vrl,
    remap_vrl,
)

CORPUS = "/root/reference/lib/vrl/tests/tests/expressions"

# files whose expectations depend on reference-internal details that have
# no Spark analogue (position-exact runtime diagnostic text)
KNOWN_DIVERGENT = {
    "query/function_call_error.vrl",
}

# skip reasons a statically-typed engine legitimately produces; anything
# else is a hard failure of this test
ALLOWED_SKIP_MARKERS = (
    "type_def()",                # VRL type reflection == DataFrame schema
    "closure argument",          # HOF closures are per-function features
    "expected-error test",       # file asserts compiler diagnostics
    "non-JSON expected result",  # result is diagnostic text / regex literal
    "non-JSON input object",
    "static type coercion",      # heterogeneous value slots
    "cannot unify branch types",
    "merge on non-object operands",
    "event root write via index/coalesce",
    "object() on dynamic value",
    "position-exact runtime diagnostic",
)


def _parse_header(src: str):
    lines = src.splitlines()
    obj_txt, res_txt, cur = None, None, None
    for ln in lines:
        if not ln.startswith("#"):
            if ln.strip():
                break
            continue
        body = ln[1:].lstrip()
        if body.startswith("object:"):
            cur, obj_txt = "o", body[len("object:"):]
        elif body.startswith("result:"):
            cur, res_txt = "r", body[len("result:"):]
        elif cur == "o":
            obj_txt += "\n" + body
        elif cur == "r":
            res_txt += "\n" + body
    return obj_txt, res_txt


def _eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


def test_vrl_corpus_replay(spark):
    files = sorted(glob.glob(f"{CORPUS}/**/*.vrl", recursive=True))
    assert len(files) >= 130, "reference corpus moved?"
    passed, failed, skipped = [], [], []
    for f in files:
        rel = f.split("expressions/")[1]
        src = open(f).read()
        obj_txt, res_txt = _parse_header(src)
        if rel in KNOWN_DIVERGENT:
            skipped.append((rel, "position-exact runtime diagnostic"))
            continue
        if res_txt is None or res_txt.strip().startswith("~"):
            skipped.append((rel, "expected-error test"))
            continue
        try:
            expected = json.loads(res_txt)
        except json.JSONDecodeError:
            skipped.append((rel, "non-JSON expected result"))
            continue
        obj = {}
        if obj_txt:
            try:
                obj = json.loads(obj_txt)
            except json.JSONDecodeError:
                skipped.append((rel, "non-JSON input object"))
                continue
        try:
            got, event, aborted = eval_vrl(spark, src, obj)
        except (VrlUnsupported, VrlCompileError, VrlParseError) as e:
            skipped.append((rel, f"{type(e).__name__}: {e}"))
            continue
        except AnalysisException as e:
            skipped.append((rel, "static type coercion: "
                            + str(e).split(chr(10))[0][:110]))
            continue
        if aborted:
            # the reference harness reports event state for aborted runs;
            # a static schema cannot conditionally omit a column, so
            # treat null-valued extra keys as missing
            compare = {
                k: v for k, v in event.items()
                if v is not None
                or (isinstance(expected, dict) and k in expected)
            }
        else:
            compare = got
        if _eq(compare, expected):
            passed.append(rel)
        else:
            failed.append((rel, expected, compare))

    assert not failed, f"corpus mismatches: {failed[:5]}"
    bad_skips = [
        (rel, why) for rel, why in skipped
        if not any(m in why for m in ALLOWED_SKIP_MARKERS)
    ]
    assert not bad_skips, f"unexplained skips: {bad_skips[:5]}"
    # locked-in floor: 93 in-scope files replay exactly (never regress)
    # (r5 late: +2 — %metadata namespace support converted
    # function_call/metadata_argument and arithmetic/addition/metadata)
    assert len(passed) >= 93, f"only {len(passed)} corpus files passed"


def test_remap_vrl_operator(spark):
    df = spark.createDataFrame(
        [("c1", 0, "USER", "hello there", 120),
         ("c1", 1, "Assistant", "hi!", 15),
         ("c2", 0, "tool", "", 9000)],
        "conv_id string, turn_idx int, role string, text string, latency_ms int",
    )
    out = remap_vrl(
        df,
        '''
        .role = downcase(string!(.role))
        .is_tool = .role == "tool"
        .text_len = length(.text)
        if .latency_ms > 1000 { .slow = true } else { .slow = false }
        .note = del(.text)
        ''',
    )
    rows = {(r.conv_id, r.turn_idx): r for r in out.collect()}
    assert rows[("c1", 0)].role == "user"
    assert rows[("c2", 0)].is_tool is True
    assert rows[("c1", 1)].text_len == 3
    assert rows[("c2", 0)].slow is True and rows[("c1", 0)].slow is False
    assert "text" not in out.columns and rows[("c1", 1)].note == "hi!"


def test_remap_vrl_abort_routes_to_dropped(spark):
    df = spark.createDataFrame(
        [("a", "ok"), ("b", None)], "id string, payload string"
    )
    src = 'if !exists(.payload) || is_nullish(.payload) { abort }\n.kept = true'
    kept = remap_vrl(df, src)
    assert [r.id for r in kept.collect()] == ["a"]
    both = compile_vrl(src, df.schema).apply(df, drop_aborted=False)
    flags = {r.id: r._aborted for r in both.collect()}
    assert flags == {"a": False, "b": True}


def test_vrl_closures(spark):
    """HOF closures compile to Spark lambda functions (filter /
    transform / transform_values), with VRL's |index, value| binding
    on arrays and static per-field expansion on objects."""
    src = '''
    factor = 10
    .kept = filter(.nums) -> |i, v| { v * factor > 20 && i >= 0 }
    .doubled = map_values(.nums) -> |v| { v * 2 }
    .flags = map_values(.obj) -> |v| { v == "on" }
    .
    '''
    got, event, aborted = eval_vrl(
        spark, src, {"nums": [1, 2, 3, 4], "obj": {"a": "on", "b": "off"}}
    )
    assert got["kept"] == [3, 4]
    assert got["doubled"] == [2, 4, 6, 8]
    assert got["flags"] == {"a": True, "b": False}
    # outer mutation inside a closure has no Column analogue: rejected
    with pytest.raises(VrlUnsupported):
        eval_vrl(spark, 'x = 1\nmap_values(.n) -> |v| { x = v\nv }\n.x',
                 {"n": [1]})


def test_vrl_for_each(spark):
    """for_each: the one VRL closure whose POINT is outer mutation.

    Objects unroll statically against the live env (params shadow and
    are discarded after the loop, other assigned outer variables
    persist — closure_scope_inheritance.vrl); arrays and maps fold the
    assigned-variable set through a packed-struct F.aggregate, so the
    accumulation is a single JVM fold, not N re-evaluations.
    """
    # reference corpus semantics (closure_scope_inheritance.vrl)
    src = '''
    key = "yay"
    zoog = "yay"
    for_each({ "foo": "bar" }) -> |key, value| {
      key = "boo"
      zoog = "boo"
    }
    .out = [key, zoog]
    .
    '''
    got, _, _ = eval_vrl(spark, src, {"x": 1})
    assert got["out"] == ["yay", "boo"]

    # array fold: index + value both accumulate
    src = '''
    total = 0
    idxsum = 0
    for_each(.nums) -> |i, v| { total = total + v
    idxsum = idxsum + i }
    .total = total
    .idxsum = idxsum
    .
    '''
    got, _, _ = eval_vrl(spark, src, {"nums": [10, 20, 30]})
    assert (got["total"], got["idxsum"]) == (60, 3)

    # map fold: key and value delivered through map_entries
    src = '''
    keys = ""
    sum = 0
    for_each(.m) -> |k, v| { keys = keys + k
    sum = sum + v }
    .keys = keys
    .sum = sum
    .
    '''
    got, _, _ = eval_vrl(spark, src, {"m": {"a": 1, "b": 2}})
    assert (got["keys"], got["sum"]) == ("ab", 3)

    # the fold must stay JVM-side: no Python eval nodes
    df = spark.createDataFrame([([1, 2, 3],)], "nums array<bigint>")
    out = remap_vrl(df, 's = 0\nfor_each(.nums) -> |_i, v| { s = s + v }\n.s = s')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert out.collect()[0].s == 6

    # a bang failure on ANY element aborts the EVENT (reference remap
    # drop-on-abort semantics) — the abort state threads through the
    # fold's hidden accumulator slot instead of being dropped
    df = spark.createDataFrame(
        [("a", "2,3"), ("b", "2,x")], "id string, n string"
    )
    out = remap_vrl(df, '''
    vals = split!(.n, ",")
    s = 0
    for_each(vals) -> |_i, v| { s = s + to_int!(v) }
    .s = s
    ''')
    assert {r.id: r.s for r in out.collect()} == {"a": 5}


RFC_CORPUS = "/root/reference/lib/vrl/tests/tests/rfcs/8381"

# real-world closure idioms a statically-typed Column engine cannot
# express; anything not matching one of these must PASS
RFC_SKIP_MARKERS = (
    # dynamic field names: set()/remove() with a per-row key have no
    # static-schema analogue
    "should be a str, got Column",
    "Column is not iterable",
    "assigning event paths (dynamic keys)",
    # heterogeneous accumulation (bool+string+array in one array)
    "cannot unify branch types",
    "static type coercion",
    # Spark's JSON reader drops arrays-of-empty-objects, so the harness
    # cannot even construct this input
    "closure on null",
    # the reference marks the file itself as skipped
    "reference-marked SKIP",
)


def _rfc3339(v):
    """Normalize timestamps to the reference harness's RFC3339 display."""
    import datetime

    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%dT%H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        return s + "Z"
    if isinstance(v, list):
        return [_rfc3339(x) for x in v]
    if isinstance(v, dict):
        return {k: _rfc3339(x) for k, x in v.items()}
    return v


def test_vrl_rfc8381_replay(spark):
    """RFC 8381 corpus: the reference's real-world ITERATION idioms
    (rfcs/8381/*.vrl — de-dot keys for elasticsearch, unzip objects,
    regex-list matching, per-element del/extend, ...). Same contract as
    the expressions corpus: every file passes or skips for a documented
    static-typing reason, and the PASS floor is pinned so compiler
    regressions surface as failures here."""
    files = sorted(glob.glob(f"{RFC_CORPUS}/*.vrl"))
    assert len(files) == 21, "rfcs/8381 corpus moved?"
    passed, failed, skipped = [], [], []
    for f in files:
        rel = f.rsplit("/", 1)[1]
        src = open(f).read()
        obj_txt, res_txt = _parse_header(src)
        if src.startswith("# SKIP"):
            skipped.append((rel, "reference-marked SKIP"))
            continue
        expected = json.loads(res_txt)
        obj = json.loads(obj_txt) if obj_txt else {}
        try:
            got, _event, _ab = eval_vrl(spark, src, obj)
        except (VrlUnsupported, VrlCompileError, VrlParseError) as e:
            skipped.append((rel, f"{type(e).__name__}: {e}"))
            continue
        except AnalysisException as e:
            skipped.append((rel, "static type coercion: "
                            + str(e).split(chr(10))[0][:110]))
            continue
        if _eq(_rfc3339(got), expected):
            passed.append(rel)
        else:
            failed.append((rel, expected, got))

    assert not failed, f"rfc corpus mismatches: {failed}"
    bad_skips = [
        (rel, why) for rel, why in skipped
        if not any(m in why for m in RFC_SKIP_MARKERS)
    ]
    assert not bad_skips, f"undocumented rfc skips: {bad_skips}"
    # floor: the 13 idioms the compiler handles today; additions may only
    # raise this
    assert len(passed) >= 13, f"rfc pass floor regressed: {sorted(passed)}"


EXTRA_CORPORA_ROOT = "/root/reference/lib/vrl/tests/tests"

# real-semantics divergences, each with the reason it stays open
EXTRA_KNOWN_DIVERGENT = {
    # `(fallible || fallible) ?? x` propagation: the reference threads
    # per-operand error state through || / && chains; our Columns fold
    # the error to NULL before the ?? sees which side erred
    "internal/coalesced_fallible_op.vrl",
    # 18 `f!(parsed[i])` statements: every abort guard re-inlines all
    # prior token-array trees (no cross-lambda CSE), and the ~O(n^2)
    # expression blows up task serialization. Each building block
    # (parse_tokens grammar, to_timestamp auto-ladder, paren groups)
    # replays individually elsewhere.
    "examples/parse_nginx_access_log.vrl",
}

EXTRA_SKIP_MARKERS = ALLOWED_SKIP_MARKERS + (
    "del() with index path",  # del on coalesce/index paths — the one
                              # user is a type_def() reflection file
    "`. = <non-object>`",  # scalar event roots: a DataFrame row is an
                           # object by construction
    "known divergence",    # EXTRA_KNOWN_DIVERGENT, reasons at the table
)


def _drop_null_extras(got, expected):
    """Static-schema concession: a DataFrame column cannot be
    conditionally absent, so a null-valued key the expected object
    lacks counts as missing (same rule the aborted-row compare uses)."""
    if isinstance(got, dict) and isinstance(expected, dict):
        return {
            k: _drop_null_extras(v, expected.get(k))
            for k, v in got.items()
            if v is not None or k in expected
        }
    if isinstance(got, list) and isinstance(expected, list):
        return [_drop_null_extras(g, e) for g, e in zip(got, expected)] + (
            got[len(expected):]
        )
    return got


def test_vrl_extra_corpora_replay(spark):
    """examples/ (the public blog programs — `. = parse_common_log!`
    end-to-end), issues/ (regression corpus), internal/ — replayed with
    the expressions-corpus contract plus two static-schema concessions:
    timestamps compare in their RFC3339 rendering, and null-valued keys
    absent from the expected object count as missing."""
    files = []
    for d in ("examples", "issues", "internal", "functions"):
        files += sorted(
            glob.glob(f"{EXTRA_CORPORA_ROOT}/{d}/**/*.vrl", recursive=True)
        )
    assert len(files) >= 50, "extra corpora moved?"
    passed, failed, skipped = [], [], []
    for f in files:
        rel = f.split("tests/tests/")[1]
        src = open(f).read()
        obj_txt, res_txt = _parse_header(src)
        if rel in EXTRA_KNOWN_DIVERGENT:
            skipped.append((rel, "known divergence (see table above)"))
            continue
        if res_txt is None or res_txt.strip().startswith("~"):
            skipped.append((rel, "expected-error test"))
            continue
        try:
            # raw_decode: the header parser keeps consuming comment
            # lines past the result object when the program body opens
            # with its own comments (e.g. parse_nginx_access_log.vrl)
            expected, _ = json.JSONDecoder().raw_decode(res_txt.strip())
        except json.JSONDecodeError:
            skipped.append((rel, "non-JSON expected result"))
            continue
        obj = {}
        if obj_txt:
            try:
                obj, _ = json.JSONDecoder().raw_decode(obj_txt.strip())
            except json.JSONDecodeError:
                skipped.append((rel, "non-JSON input object"))
                continue
        try:
            got, event, aborted = eval_vrl(spark, src, obj)
        except (VrlUnsupported, VrlCompileError, VrlParseError) as e:
            skipped.append((rel, f"{type(e).__name__}: {e}"))
            continue
        except AnalysisException as e:
            skipped.append((rel, "static type coercion: "
                            + str(e).split(chr(10))[0][:110]))
            continue
        compare = got if not aborted else {
            k: v for k, v in event.items()
            if v is not None or (isinstance(expected, dict) and k in expected)
        }
        compare = _drop_null_extras(_rfc3339(compare), expected)
        if _eq(compare, expected):
            passed.append(rel)
        else:
            failed.append((rel, expected, compare))

    assert not failed, f"extra-corpora mismatches: {failed[:3]}"
    bad_skips = [
        (rel, why) for rel, why in skipped
        if not any(m in why for m in EXTRA_SKIP_MARKERS)
    ]
    assert not bad_skips, f"unexplained skips: {bad_skips[:5]}"
    # marquee files must replay: the reference's own announcement-blog
    # program and the typed parse_regex walkthrough
    for must in (
        "examples/blog_vector_remap_language.vrl",
        "examples/blog_vector_remap_language_raise_error.vrl",
        "examples/blog_vector_remap_language_handle_error.vrl",
        "examples/blog_vector_remap_language_specify_types.vrl",
        "examples/successful_parse_regex_type.vrl",
        "examples/successful_parse_syslog_type.vrl",
        "issues/6792_lost_type_defs.vrl",
        "issues/11287_http_pipelines_blackhole.vrl",
        "internal/ok_assignment_default_value.vrl",
        "internal/progressive_type_checking.vrl",
        "internal/inner_type_defs.vrl",
        "functions/array.vrl",
        "functions/object.vrl",
    ):
        assert must in passed, f"{must} no longer replays"
    assert len(passed) >= 28, f"extra-corpora pass floor: {len(passed)}"


def test_vrl_parse_apache_format_dispatch(spark):
    """parse_apache_log's format: literal selects the static return
    shape (parse_apache_log.rs:19-27) — error-format fields are typed
    (pid/port long) and addressable from VRL source."""
    src = '''p = parse_apache_log!(.line, format: "error")
{"mod": p.module, "pid": p.pid, "port": p.port}'''
    line = ("[01/Mar/2021:12:00:19 +0000] [ab:alert] [pid 4803:tid 3814] "
            "[client 1.2.3.4:24259] msg")
    got, _, _ = eval_vrl(spark, src, {"line": line})
    assert got == {"mod": "ab", "pid": 4803, "port": 24259}


def test_remap_source_two_ports(spark):
    """operators/remap.py remap_source: VRL-source program with the
    expression-form's (ok, dropped) port contract and annotation."""
    from vector_spark.operators.remap import remap_source

    df = spark.createDataFrame(
        [("a", "user"), ("b", "system"), ("c", "tool")], "id string, role string"
    )
    ok, dropped = remap_source(
        df, 'if .role == "system" { abort }\n.seen = true'
    )
    assert sorted(r.id for r in ok.collect()) == ["a", "c"]
    drows = dropped.collect()
    assert [r.id for r in drows] == ["b"]
    assert drows[0].metadata_dropped.reason == "abort"


def test_vrl_metadata_namespace(spark):
    """%metadata (the event's second namespace): scratch reads/writes,
    whole-namespace object reads in insertion order, branch merging,
    del()/exists(), and NOT leaking into the emitted event."""
    from vector_spark.functions.vrl_codegen import eval_vrl, remap_vrl

    # corpus semantics: arithmetic over metadata, whole-% read
    got, _, _ = eval_vrl(spark, '%foo = 1\n%bar = %foo + 5\n%', {})
    assert got == {"foo": 1, "bar": 6}
    # metadata as a function argument (function_call/metadata_argument)
    got, _, _ = eval_vrl(spark, '%foo = "foo"\nsha1(%foo)', {})
    assert got == "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33"
    # dynamic branch merge + del + exists; unread %key is null-safe
    got, _, _ = eval_vrl(
        spark,
        '% = {}\n'
        '%a = "x"\n'
        'if .n > 1 { %a = "y"; %b = 2 }\n'
        '[%, exists(%a), exists(%zz), del(%b), %, %never]',
        {"n": 5},
    )
    assert got == [{"a": "y", "b": 2}, True, False, 2, {"a": "y"}, None]
    # metadata never reaches the emitted event (encode-time behavior)
    df = spark.createDataFrame([("u", 3)], "role string, n int")
    out = remap_vrl(df, '%tmp = .n * 2\n.doubled = %tmp')
    row = out.collect()[0]
    assert row.doubled == 6
    assert set(out.columns) == {"role", "n", "doubled"}


def test_remap_vrl_stays_jvm_side(spark):
    """The compiled program must be pure Catalyst expressions: no
    BatchEvalPython / ArrowEvalPython nodes in the physical plan."""
    df = spark.createDataFrame([("x", "5")], "id string, n string")
    out = remap_vrl(df, '.v = (to_int(.n) ?? 0) * 10\n.tag = upcase(.id)')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    r = out.collect()[0]
    assert r.v == 50 and r.tag == "X"


def test_vrl_parse_json_proxy_pushes_to_get_json_object(spark):
    df = spark.createDataFrame(
        [('{"user": {"name": "ada", "age": 36}}',)], "payload string"
    )
    out = remap_vrl(
        df, '.name = parse_json(.payload).user.name ?? "unknown"'
    )
    assert out.collect()[0].name == "ada"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "get_json_object" in plan and "EvalPython" not in plan


def test_vrl_typed_parse_json_event_replacement(spark):
    """The dominant vector-config idiom `. = parse_json!(.message)`:
    with a caller-provided schema (the static-typing analogue of VRL's
    dynamic parse), parse_json returns a typed struct guarded by
    try_parse_json (malformed -> NULL = error), the ok/err assignment
    captures the failure, and `.` replacement swaps the event."""
    df = spark.createDataFrame(
        [("h1", '{"level":"INFO","msg":"ok","attempt":2}'),
         ("h2", "not json at all")],
        "host string, message string",
    )
    src = '''
    structured, err = parse_json(.message)
    if err != null { abort }
    . = structured
    .level = downcase(string!(.level))
    '''
    out = remap_vrl(
        df, src,
        json_schemas={".message": "level string, msg string, attempt bigint"},
    )
    rows = [r.asDict() for r in out.collect()]
    assert rows == [{"level": "info", "msg": "ok", "attempt": 2}]
