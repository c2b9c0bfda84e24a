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
    (regexp_extract's '' on miss) normalized to NULL."""
    parts = []
    for name, idx in groups.items():
        v = F.regexp_extract(col, regex, idx)
        parts.append(F.when(v != "", v).alias(name))
    return F.struct(*parts)
