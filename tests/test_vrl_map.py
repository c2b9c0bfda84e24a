"""The VRL stdlib -> Spark registry must cover every function in the
reference's stdlib, and its callables must produce working Columns."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.vrl_map import VRL, coverage_summary

STDLIB = "/root/reference/lib/vrl/stdlib/src"
_EXCLUDE = {"lib", "util", "log_util", "wasm_unsupported_function"}  # helpers, not functions


@pytest.mark.skipif(not os.path.isdir(STDLIB), reason="reference not present")
def test_every_stdlib_function_mapped():
    names = {
        f[:-3]
        for f in os.listdir(STDLIB)
        if f.endswith(".rs") and f[:-3] not in _EXCLUDE
    }
    missing = names - set(VRL)
    assert not missing, f"unmapped VRL functions: {sorted(missing)}"


def test_summary_sane():
    s = coverage_summary()
    assert s["total"] >= 130
    assert s["with_callable"] >= 40
    # out-of-scope entries must carry a reason, not silence
    for name, e in VRL.items():
        assert e.spark, name


def test_sampled_callables_work(spark):
    df = spark.createDataFrame(
        [("Hello World", "a=1 b=2", [3, 1, 3])], "s string, kv string, arr array<int>"
    )
    row = df.select(
        VRL["downcase"].fn(F.col("s")).alias("lower"),
        VRL["strlen"].fn(F.col("s")).alias("n"),
        VRL["truncate"].fn(F.col("s"), 5).alias("trunc"),
        VRL["parse_key_value"].fn(F.col("kv")).alias("kvmap"),
        VRL["unique"].fn(F.col("arr")).alias("uniq"),
        VRL["encode_base64"].fn(F.col("s")).alias("b64"),
        VRL["md5"].fn(F.col("s")).alias("h"),
        VRL["to_int"].fn(F.lit("42")).alias("i"),
        VRL["is_nullish"].fn(F.lit(" ")).alias("nullish"),
        VRL["match"].fn(F.col("s"), "^Hello").alias("m"),
    ).collect()[0]
    assert row.lower == "hello world"
    assert row.n == 11
    assert row.trunc == "Hello..."
    assert row.kvmap == {"a": "1", "b": "2"}
    assert row.uniq == [3, 1]
    assert row.b64 == "SGVsbG8gV29ybGQ="
    assert row.i == 42
    assert row.nullish is True
    assert row.m is True
