"""Datadog search query -> Column compiler, checked against the
reference's own pass/fail table (src/conditions/datadog_search.rs
get_checks(), :322-1020) plus parser-shape cases from
lib/datadog/search-syntax/src/parser.rs tests."""

from __future__ import annotations

import json

import pytest

from vector_spark.conditions import DdSchema, dd_query
from vector_spark.conditions.datadog_search import (
    Bool,
    MatchAll,
    Not,
    Phrase,
    Prefix,
    RangeN,
    Term,
    Wildcard,
    parse_dd,
)

# reference DEFAULT_FIELDS (field.rs:4-10) minus the literal
# "_default_" placeholder (unused in the check table)
SCHEMA = DdSchema(
    default_fields=(
        "message",
        "custom.error.message",
        "custom.error.stack",
        "custom.title",
    )
)

# (query, passing event, failing event) — from get_checks()
CHECKS = [
    ("_exists_:a", {"tags": ["a:foo"]}, {"tags": ["b:foo"]}),
    ("NOT _exists_:a", {"tags": ["b:foo"]}, {"tags": ["a:foo"]}),
    ("-_exists_:a", {"tags": ["b:foo"]}, {"tags": ["a:foo"]}),
    ("_exists_:@b", {"custom": {"b": "foo"}}, {"custom": {"a": "foo"}}),
    ("NOT _exists_:@b", {"custom": {"a": "foo"}}, {"custom": {"b": "foo"}}),
    ("-_exists_:@b", {"custom": {"a": "foo"}}, {"custom": {"b": "foo"}}),
    ("_missing_:a", {}, {"tags": ["a:foo"]}),
    ("NOT _missing_:a", {"tags": ["a:foo"]}, {}),
    ("-_missing_:a", {"tags": ["a:foo"]}, {}),
    ("_missing_:@b", {"custom": {"a": "foo"}}, {"custom": {"b": "foo"}}),
    ("NOT _missing_:@b", {"custom": {"b": "foo"}}, {"custom": {"a": "foo"}}),
    ("-_missing_:@b", {"custom": {"b": "foo"}}, {"custom": {"a": "foo"}}),
    # keywords (default fields, word-boundary)
    ("bla", {"message": "bla"}, {}),
    ("foo", {"message": '{"key": "foo"}'}, {}),
    ("bar", {"message": '{"nested": {"value": ["foo", "bar"]}}'}, {}),
    ("NOT bla", {"message": "nothing"}, {"message": "bla"}),
    ("NOT foo", {}, {"message": '{"key": "foo"}'}),
    ("-bla", {"message": "nothing"}, {"message": "bla"}),
    ('"bla"', {"message": "bla"}, {}),
    ('"foo"', {"message": '{"key": "foo"}'}, {}),
    ('NOT "bla"', {}, {"message": "bla"}),
    ('-"bla"', {}, {"message": "bla"}),
    # tag / reserved / facet terms
    ("a:bla", {"tags": ["a:bla"]}, {"tags": ["b:bla"]}),
    ("host:foo", {"host": "foo"}, {"tags": ["host:foo"]}),
    ("host:foo", {"host": "foo"}, {"host": "foobar"}),
    ("host:foo", {"host": "foo"}, {"host": '{"value": "foo"}'}),
    ("NOT a:bla", {"tags": ["b:bla"]}, {"tags": ["a:bla"]}),
    ("NOT host:foo", {"tags": ["host:fo  o"]}, {"host": "foo"}),
    ("-a:bla", {"tags": ["b:bla"]}, {"tags": ["a:bla"]}),
    ("-trace_id:foo", {}, {"trace_id": "foo"}),
    ('a:"bla"', {"tags": ["a:bla"]}, {"custom": {"a": "bla"}}),
    ('NOT a:"bla"', {"custom": {"a": "bla"}}, {"tags": ["a:bla"]}),
    ("@a:bla", {"custom": {"a": "bla"}}, {"tags": ["a:bla"]}),
    ("NOT @a:bla", {"tags": ["a:bla"]}, {"custom": {"a": "bla"}}),
    ('@a:"bla"', {"custom": {"a": "bla"}}, {"tags": ["a:bla"]}),
    # wildcards
    ("*bla", {"message": "foobla"}, {"message": "blafoo"}),
    ("NOT *bla", {"message": "blafoo"}, {"message": "foobla"}),
    ("bla*", {"message": "blafoo"}, {"message": "foobla"}),
    ("NOT bla*", {"message": "foobla"}, {"message": "blafoo"}),
    ("*b*la*", {"custom": {"title": "foobla"}}, {}),
    ("NOT *b*la*", {}, {"custom": {"title": "foobla"}}),
    ("a:*bla", {"tags": ["a:foobla"]}, {"tags": ["a:blafoo"]}),
    ("NOT a:*bla", {"tags": ["a:blafoo"]}, {"tags": ["a:foobla"]}),
    ("b:bla*", {"tags": ["b:blabop"]}, {"tags": ["b:bopbla"]}),
    ("NOT b:bla*", {"tags": ["b:bopbla"]}, {"tags": ["b:blabop"]}),
    ("c:*b*la*", {"tags": ["c:foobla"]}, {"custom": '{"title": "foobla"}'}),
    ("@a:*bla", {"custom": {"a": "foobla"}}, {"tags": ["a:foobla"]}),
    ("NOT @a:*bla", {"tags": ["a:foobla"]}, {"custom": {"a": "foobla"}}),
    ("@b:bla*", {"custom": {"b": "blabop"}}, {"tags": ["b:blabop"]}),
    ("@c:*b*la*", {"custom": {"c": "foobla"}}, {"tags": ["c:foobla"]}),
    # literal tags array
    ("tags:a", {"tags": ["a", "b", "c"]}, {"tags": ["d", "e", "f"]}),
    ("NOT tags:a", {"tags": ["d", "e", "f"]}, {"tags": ["a", "b", "c"]}),
    # ranges on the default field (string-lexicographic)
    ("[1 TO 10]", {"message": "1"}, {"message": "2"}),
    ("NOT [1 TO 10]", {"message": "2"}, {"message": "1"}),
    ("[50 TO *]", {"message": "6"}, {"message": "40"}),
    ("NOT [50 TO *]", {"message": "40"}, {"message": "6"}),
    ("[* TO 50]", {"message": "3"}, {"message": "6"}),
    ("NOT [* TO 50]", {"message": "6"}, {"message": "3"}),
    ("[* TO *]", {"message": "foo"}, {}),
    ("NOT [* TO *]", {}, {"message": "foo"}),
    # ranges on tags (string-lexicographic on the value part)
    ("a:[1 TO 10]", {"tags": ["a:1"]}, {"tags": ["a:2"]}),
    ("NOT a:[1 TO 10]", {"tags": ["a:2"]}, {"tags": ["a:1"]}),
    ("a:[50 TO *]", {"tags": ["a:6"]}, {"tags": ["a:40"]}),
    ("a:[* TO 50]", {"tags": ["a:400"]}, {"tags": ["a:600"]}),
    ("a:[* TO *]", {"tags": ["a:test"]}, {"tags": ["b:test"]}),
    ("NOT a:[* TO *]", {"tags": ["b:test"]}, {"tags": ["a:test"]}),
    # ranges on facets (numeric when typed numeric, else lexicographic)
    ("@b:[1 TO 10]", {"custom": {"b": 5}}, {"custom": {"b": 11}}),
    ("@b:[1 TO 100]", {"custom": {"b": "10"}}, {"custom": {"b": "2"}}),
    ("NOT @b:[1 TO 10]", {"custom": {"b": 11}}, {"custom": {"b": 5}}),
    ("@b:[a TO z]", {"custom": {"b": "c"}}, {"custom": {"b": 5}}),
    ('@b:["1" TO "100"]', {"custom": {"b": "10"}}, {"custom": {"b": "2"}}),
    ('NOT @b:["1" TO "100"]', {"custom": {"b": "2"}}, {"custom": {"b": "10"}}),
    # exclusive ranges
    ("f:{1 TO 100}", {"tags": ["f:10"]}, {"tags": ["f:1"]}),
    ("f:{1 TO 100}", {"tags": ["f:10"]}, {"tags": ["f:100"]}),
    ("NOT f:{1 TO 100}", {"tags": ["f:1"]}, {"tags": ["f:10"]}),
    ("@f:{1 TO 100}", {"custom": {"f": 50}}, {"custom": {"f": 1}}),
    ("@f:{1 TO 100}", {"custom": {"f": 50}}, {"custom": {"f": 100}}),
    ("NOT @f:{1 TO 100}", {"custom": {"f": 1}}, {"custom": {"f": 50}}),
]


_df_cache = {}


def _event_df(spark, event: dict):
    key = json.dumps(event, sort_keys=True)
    if key not in _df_cache:
        if not event:
            df = spark.createDataFrame([(None,)], "message string")
        else:
            df = spark.createDataFrame([event])
        _df_cache[key] = df
    return _df_cache[key]


def _matches(spark, query: str, event: dict) -> bool:
    df = _event_df(spark, event)
    col = dd_query(query, df, SCHEMA)
    row = df.select(col.alias("m")).first()
    return bool(row.m)


def test_reference_check_table(spark):
    failures = []
    for query, ok, bad in CHECKS:
        if _matches(spark, query, ok) is not True:
            failures.append((query, "expected PASS", ok))
        if _matches(spark, query, bad) is not False:
            failures.append((query, "expected FAIL", bad))
    assert not failures, "\n".join(repr(f) for f in failures)


# ---- parser shape (parser.rs test expectations) ----


def test_parse_shapes():
    assert isinstance(parse_dd("foo"), Term)
    p = parse_dd('"foo bar"')
    assert isinstance(p, Phrase) and p.phrase == "foo bar"
    p = parse_dd("foo bar")  # multiterm folding -> ONE default term
    assert isinstance(p, Term) and p.value == "foo bar"
    p = parse_dd("foo AND bar")
    assert isinstance(p, Bool) and p.op == "and" and len(p.nodes) == 2
    p = parse_dd("foo OR bar")
    assert isinstance(p, Bool) and p.op == "or"
    p = parse_dd("NOT foo")
    assert isinstance(p, Not)
    assert isinstance(parse_dd("*:*"), MatchAll)
    assert isinstance(parse_dd(""), MatchAll)
    p = parse_dd("a:val*")
    assert isinstance(p, Prefix) and p.prefix == "val"
    p = parse_dd("a:*v*l*")
    assert isinstance(p, Wildcard)
    p = parse_dd("a:[1 TO 2]")
    assert isinstance(p, RangeN) and p.lower == 1 and p.upper == 2
    p = parse_dd("a:{1 TO 2}")
    assert not p.lower_inc and not p.upper_inc
    # mixed brackets tokenize (grammar.pest) but the reference's semantic
    # layer (grammar.rs:241-245) panics on (Gte,Lt)/(Gt,Lte) — invalid.
    with pytest.raises(ValueError, match="mixed range brackets"):
        parse_dd("a:[1 TO 2}")
    with pytest.raises(ValueError, match="mixed range brackets"):
        parse_dd("a:{1 TO 2]")
    # field-scoped subquery
    p = parse_dd("a:(foo OR bar)")
    assert isinstance(p, Bool) and all(n.attr == "a" for n in p.nodes)
    # comparison values
    p = parse_dd("status:>=500")
    assert p.op == ">=" and p.value == 500
    p = parse_dd("v:>1.5")
    assert p.value == 1.5


def test_typed_column_compare(spark):
    """Fixed-schema adaptation: numeric columns compare numerically."""
    df = spark.createDataFrame([(500, "tool"), (200, "user")], "status int, role string")
    got = [r.status for r in df.filter(dd_query("status:>=500", df)).collect()]
    assert got == [500]
    got = [
        r.status
        for r in df.filter(dd_query("status:[200 TO 499] AND role:user", df)).collect()
    ]
    assert got == [200]
    # missing field -> false, NOT missing -> true
    assert df.filter(dd_query("nosuch:foo", df)).count() == 0
    assert df.filter(dd_query("NOT nosuch:foo", df)).count() == 2
