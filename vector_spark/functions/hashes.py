"""Portable deterministic hashes.

Vector's sample transform uses seahash for consistent keyed sampling
(src/transforms/sample.rs:116-124). The exact hash function is an
implementation detail (we do NOT reproduce seahash bit-for-bit; the
semantics that matter are "same key -> same decision, decisions
uniform"); production code should use Spark's codegen'd xxhash64.

For oracle-parity tests we additionally provide an arithmetic hash
expressible identically in Spark SQL and ANSI SQL (DuckDB), so the
sampling decision can be cross-checked engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth multiplicative constant, kept small enough that
# (key % M) * A + B stays far below 2^63 (no overflow under ANSI mode).
_M = 1_000_003
_A = 2_654_435_761
_B = 97


def consistent_keyed_hash(key: Column) -> Column:
    """Portable arithmetic hash of a BIGINT-castable key -> bigint."""
    k = F.pmod(key.cast("bigint"), F.lit(_M))
    return F.pmod(k * F.lit(_A) + F.lit(_B), F.lit(_M))


def consistent_keyed_hash_sql(key_expr: str) -> str:
    """The same hash as ANSI SQL text (for DuckDB oracles)."""
    return f"(((({key_expr}) % {_M} + {_M}) % {_M}) * {_A} + {_B}) % {_M}"


def hex_prefix_to_long(hex_col: Column, n: int = 15) -> Column:
    """First n hex chars (n<=15 so it fits in int64) -> bigint.

    Used to derive numeric shingle ids from md5(text) for MinHash;
    DuckDB mirrors it as CAST(concat('0x', substr(md5(x),1,n)) AS BIGINT).
    """
    if n > 15:
        raise ValueError("n>15 overflows int64")
    return F.conv(F.substring(hex_col, 1, n), 16, 10).cast("bigint")
