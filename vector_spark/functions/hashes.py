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


def salted_long(id_col: str, salt: str) -> Column:
    """Portable deterministic key of (id, salt) -> bigint — THE shared
    recipe behind split assignment, stratified sampling, and the
    pack-shuffle order. One definition so the Spark expression and its
    DuckDB oracle mirror (CAST(concat('0x', substr(md5(id || ':salt'),
    1, 15)) AS BIGINT)) cannot drift apart per call site. Different
    salts give independent decisions."""
    return hex_prefix_to_long(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    )


def salted_bucket(id_col: str, salt: str, buckets: int = 10_000) -> Column:
    """`salted_long` folded to [0, buckets) — the fraction-resolution
    bucket used by split_assign / stratified_sample."""
    return F.pmod(salted_long(id_col, salt), F.lit(buckets))
