"""reduce merge strategies — full merge_strategy.rs enum parity,
including the Retain null-coalescing nuance and concat_raw."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators.reduce import reduce_groups


def _run(spark, rows, schema, merge):
    df = spark.createDataFrame(rows, schema)
    return reduce_groups(
        df, group_by=["g"], merge=merge, order_by=F.col("seq"), count_field=None
    ).collect()[0]


def test_retain_skips_trailing_null(spark):
    """merge_strategy.rs Retain: last NON-null ('coalesce by not
    retaining null'); plain `last` keeps the trailing null."""
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, None)]
    r = _run(
        spark, rows, "g int, seq int, v string",
        {"retained": ("retain", "v"), "plain_last": ("last", "v")},
    )
    assert r.retained == "b"
    assert r.plain_last is None


def test_concat_family(spark):
    rows = [(1, 0, "x"), (1, 1, "y"), (1, 2, "z")]
    r = _run(
        spark, rows, "g int, seq int, v string",
        {
            "c": ("concat", "v"),
            "cn": ("concat_newline", "v"),
            "cr": ("concat_raw", "v"),
        },
    )
    assert r.c == "x y z"
    assert r.cn == "x\ny\nz"
    assert r.cr == "xyz"


def test_array_strategies(spark):
    rows = [(1, 0, [1, 2]), (1, 1, [3]), (1, 2, [4, 5, 6])]
    r = _run(
        spark, rows, "g int, seq int, v array<int>",
        {
            "arr": ("array", "v"),
            "longest": ("longest_array", "v"),
            "shortest": ("shortest_array", "v"),
            "flat": ("flat_unique", "v"),
        },
    )
    assert r.arr == [[1, 2], [3], [4, 5, 6]]
    assert r.longest == [4, 5, 6]
    assert r.shortest == [3]
    assert sorted(r.flat) == [1, 2, 3, 4, 5, 6]


def test_numeric_strategies(spark):
    rows = [(1, 0, 5.0), (1, 1, 2.0), (1, 2, 8.0)]
    r = _run(
        spark, rows, "g int, seq int, v double",
        {
            "s": ("sum", "v"),
            "mx": ("max", "v"),
            "mn": ("min", "v"),
            "first": ("first", "v"),
            "last": ("last", "v"),
        },
    )
    assert (r.s, r.mx, r.mn, r.first, r.last) == (15.0, 8.0, 2.0, 5.0, 8.0)
