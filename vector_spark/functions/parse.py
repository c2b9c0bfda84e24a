"""Column-level parse helpers — the VRL parse_* family re-expressed as
native Spark expressions (JVM-side, codegen'd).

VRL counterparts (all in lib/vrl/stdlib/src/):
  parse_key_value.rs / parse_logfmt.rs -> parse_key_value
  parse_json.rs                        -> parse_json_col (from_json)
  parse_regex.rs                       -> parse_regex
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_key_value(
    col: Column, pair_sep: str = " ", kv_sep: str = "="
) -> Column:
    """'a=1 b=2' -> map<string,string>. Tokens without the kv separator
    are dropped (matches lenient logfmt-ish parsing)."""
    pairs = F.filter(
        F.split(col, pair_sep),
        lambda p: F.instr(p, kv_sep) > 0,
    )
    return F.map_from_arrays(
        F.transform(pairs, lambda p: F.substring_index(p, kv_sep, 1)),
        # value starts after the FULL kv separator (multi-char seps
        # like ': ' are valid — Datadog keyvalue filter args)
        F.transform(pairs, lambda p: F.substr(p, F.instr(p, kv_sep) + len(kv_sep))),
    )


def parse_json_col(col: Column, schema: str) -> Column:
    """from_json with a DDL schema; malformed input -> NULL struct
    (the caller routes those to the dropped channel)."""
    return F.from_json(col, schema)


def parse_regex(col: Column, regex: str, groups: dict[str, int]) -> Column:
    """Named extraction via numbered groups -> struct. Empty match
    (regexp_extract's '' on miss) normalized to NULL.

    One full regex execution PER GROUP — fine for user-supplied
    unanchored patterns (the VRL parse_regex surface), wrong for hot
    preset parsers: use parse_regex_onepass for ^-anchored patterns."""
    parts = []
    for name, idx in groups.items():
        v = F.regexp_extract(col, regex, idx)
        parts.append(F.when(v != "", v).alias(name))
    return F.struct(*parts)


def bind_once(value: Column, build) -> Column:
    """Evaluate `value` exactly ONCE per row and feed it to build(v).

    Binds the value as a higher-order-function lambda variable
    (transform over a one-element array), which is STRUCTURALLY
    single-evaluation — it does not depend on codegen subexpression
    elimination. That matters for expensive shared subtrees (a regex
    split array) referenced by many struct fields: when a query selects
    individual fields, SimplifyExtractValueOps inlines each field into
    its own expression tree, and any reference sitting inside a
    conditional branch (when/nullif/coalesce are all CaseWhen sugar)
    is skipped by Spark's subexpression elimination — the shared
    subtree then re-executes once PER FIELD per row (bench:
    op_parse_syslog 1.9 s -> 48 s at sf0.1 when every field re-ran the
    two-dialect alternation regex). Hiding the struct construction
    behind a lambda variable blocks the extract-value inlining at the
    transform boundary, so `value` is computed once and every field is
    a cheap bound-variable lookup."""
    return F.element_at(F.transform(F.array(value), build), 1)


def parse_regex_onepass(col: Column, regex: str, groups: dict[str, int]) -> Column:
    """parse_regex for ^-anchored patterns in ONE regex pass.

    Same trick as grok.grok_extract_native: one regexp_replace with a
    sentinel-joined $N template, split once, and every struct field
    indexes the shared array — bound via bind_once so the regex
    executes exactly once per row no matter how the caller projects
    the struct's fields (see bind_once's docstring for the CSE trap).

    The pattern MUST be anchored at '^' (every preset pattern is); a
    missing end anchor is handled by consuming the tail with a
    non-capturing `(?s:.*)` in the replace step only, so rlike keeps
    the original match semantics. Field-level parity with parse_regex:
    non-matching rows -> struct of NULLs, empty/non-participating
    captures -> NULL. A \\x01 byte inside a captured value would split
    a field early (control byte; not produced by these log formats)."""
    sep = "\x01"
    names = list(groups)
    repl = sep.join(f"${groups[n]}" for n in names)
    full = f"(?:{regex})(?s:.*)"
    arr = F.when(
        col.rlike(regex), F.split(F.regexp_replace(col, full, repl), sep, -1)
    )

    def build(a: Column) -> Column:
        return F.struct(*[
            F.nullif(F.try_element_at(a, F.lit(i + 1)), F.lit("")).alias(name)
            for i, name in enumerate(names)
        ])

    return bind_once(arr, build)
