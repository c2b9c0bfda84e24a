"""Metric value-type merging (lib/vector-core/src/event/metric/value.rs
add rules, :206-300) — histogram layout guard, distribution concat,
set union, sketch-style quantiles."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vector_spark.operators.metric_value import (
    distribution_stats,
    make_histogram,
    merge_distributions,
    merge_histograms,
    merge_sets,
)

TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _hist_rows(spark, values, uppers, name="m"):
    df = spark.createDataFrame(
        [(name, float(v), TS) for v in values], "name string, value double, ts timestamp"
    )
    buckets, cnt, total = make_histogram(F.col("value"), uppers)
    return df.select(
        "name", buckets.alias("buckets"), cnt.alias("count"), total.alias("sum"), "ts"
    )


def test_histogram_merge_elementwise(spark):
    m = _hist_rows(spark, [10, 60, 60, 150, 999], [50.0, 100.0, 200.0])
    out = merge_histograms(m, "1 day", ["name"]).collect()
    assert len(out) == 1
    row = out[0]
    counts = [b["count"] for b in row.buckets]
    uppers = [b["upper"] for b in row.buckets]
    assert uppers == [50.0, 100.0, 200.0]
    # 10 -> b0; 60,60 -> b1; 150 -> b2; 999 -> implicit +Inf (count/sum only)
    assert counts == [1, 2, 1]
    assert row["count"] == 5
    assert row["sum"] == 10 + 60 + 60 + 150 + 999


def test_histogram_layout_guard(spark):
    """value.rs:244-247: differing bucket layouts must NOT merge —
    here they land in separate rows (layout is a grouping key)."""
    a = _hist_rows(spark, [10, 60], [50.0, 100.0])
    b = _hist_rows(spark, [10, 60], [25.0, 100.0])
    out = merge_histograms(a.unionByName(b), "1 day", ["name"]).collect()
    assert len(out) == 2
    layouts = sorted(tuple(x["upper"] for x in r.buckets) for r in out)
    assert layouts == [(25.0, 100.0), (50.0, 100.0)]
    for r in out:
        assert r["count"] == 2


def test_distribution_merge_and_stats(spark):
    rows = [
        ("m", [(1.0, 1)], "histogram", TS),
        ("m", [(3.0, 2)], "histogram", TS),
        ("m", [(5.0, 1)], "summary", TS),  # different statistic: no merge
    ]
    df = spark.createDataFrame(
        rows,
        "name string, samples array<struct<value:double,rate:bigint>>, "
        "statistic string, ts timestamp",
    )
    merged = merge_distributions(df, "1 day", ["name"])
    got = {r.statistic: r for r in merged.collect()}
    assert sorted(s.value for s in got["histogram"].samples) == [1.0, 3.0]
    assert len(got["summary"].samples) == 1
    stats = distribution_stats(
        merged.filter(F.col("statistic") == "histogram"), quantiles=[0.5]
    ).collect()[0]
    assert stats["count"] == 3  # rate-weighted: 1x1 + 3x2
    assert stats["sum"] == 7.0
    assert stats["min"] == 1.0 and stats["max"] == 3.0
    # weighted median of [1,3,3] under the DDSketch relative-error
    # contract ((gamma-1)/2); the percentile_approx method stays exact
    assert abs(stats["q50"] - 3.0) <= 3.0 * 2 * (1.0 / 128.0)
    exact = distribution_stats(
        merged.filter(F.col("statistic") == "histogram"),
        quantiles=[0.5],
        method="percentile_approx",
    ).collect()[0]
    assert exact["q50"] == 3.0


def test_distribution_zero_rate_sample_dropped(spark):
    """A rate-0 sample must contribute NOTHING to the quantiles —
    F.sequence(1, 0) is the descending [1, 0] trap that would
    duplicate it instead."""
    rows = [("m", [(100.0, 0), (1.0, 1), (3.0, 1)], "histogram", TS)]
    df = spark.createDataFrame(
        rows,
        "name string, samples array<struct<value:double,rate:bigint>>, "
        "statistic string, ts timestamp",
    )
    stats = distribution_stats(df, quantiles=[0.5, 1.0]).collect()[0]
    # q100 (max over the weighted expansion) excludes the rate-0 100.0
    assert stats["q100"] == 3.0
    assert stats["q50"] == 1.0
    # min/max agree with the quantiles (rate-0 excluded there too)
    assert stats["max"] == 3.0 and stats["min"] == 1.0
    assert stats["count"] == 2 and stats["sum"] == 4.0


def test_set_merge(spark):
    rows = [("m", ["a", "b"], TS), ("m", ["b", "c"], TS)]
    df = spark.createDataFrame(
        rows, "name string, set_values array<string>, ts timestamp"
    )
    out = merge_sets(df, "1 day", ["name"]).collect()[0]
    assert out.set_values == ["a", "b", "c"]


def test_stream_histogram_matches_batch(spark, tmp_path):
    """Streaming merge == batch merge on the same bounded input."""
    import pandas as pd

    from vector_spark.streaming.stream_ops import stream_histogram_merge

    src = tmp_path / "hist_in"
    m = _hist_rows(spark, [10, 60, 60, 150, 999], [50.0, 100.0, 200.0])
    m.write.mode("overwrite").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    sdf = spark.readStream.schema(schema).parquet(str(src))
    agg = stream_histogram_merge(sdf, "1 day", ["name"])
    q = (
        agg.writeStream.format("memory")
        .queryName("hist_stream_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hist_stream_t").collect()
    want = merge_histograms(
        spark.read.parquet(str(src)), "1 day", ["name"]
    ).collect()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert [b["count"] for b in g.buckets] == [b["count"] for b in w.buckets]
    assert g["count"] == w["count"] and g["sum"] == w["sum"]


def test_stream_set_and_distribution_match_batch(spark, tmp_path):
    from vector_spark.streaming.stream_ops import (
        stream_distribution_merge,
        stream_set_merge,
    )

    # sets
    src = tmp_path / "set_in"
    rows = [("m", ["a", "b"], TS), ("m", ["b", "c"], TS)]
    spark.createDataFrame(
        rows, "name string, set_values array<string>, ts timestamp"
    ).write.mode("overwrite").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    sdf = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stream_set_merge(sdf, "1 day", ["name"])
        .writeStream.format("memory")
        .queryName("set_stream_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("set_stream_t").collect()[0]
    assert got.set_values == ["a", "b", "c"]

    # distributions
    src2 = tmp_path / "dist_in"
    rows2 = [("m", [(1.0, 1)], "histogram", TS), ("m", [(3.0, 2)], "histogram", TS)]
    spark.createDataFrame(
        rows2,
        "name string, samples array<struct<value:double,rate:bigint>>, "
        "statistic string, ts timestamp",
    ).write.mode("overwrite").parquet(str(src2))
    schema2 = spark.read.parquet(str(src2)).schema
    sdf2 = spark.readStream.schema(schema2).parquet(str(src2))
    q2 = (
        stream_distribution_merge(sdf2, "1 day", ["name"])
        .writeStream.format("memory")
        .queryName("dist_stream_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.table("dist_stream_t").collect()[0]
    assert sorted(s.value for s in got2.samples) == [1.0, 3.0]
