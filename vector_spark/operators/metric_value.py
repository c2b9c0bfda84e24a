"""Metric value types beyond scalars: Distribution /
AggregatedHistogram / Set merging, and sketch-style quantiles.

Parity: lib/vector-core/src/event/metric/value.rs — the MetricValue
enum (:15-82) and its `add` merge rules (:206-300):

  Counter/Gauge      value += value2          (aggregate.py handles)
  Set                union of string values
  Distribution       samples concatenate (same statistic kind only)
  AggregatedHistogram element-wise bucket-count add, ONLY when the
                     two bucket layouts (upper limits) are identical;
                     count += count2, sum += sum2
  AggregatedSummary  does NOT merge (falls through to `_ => false`);
                     aggregation keeps the last write
  Sketch             DDSketch merge -> quantile queries with bounded
                     RELATIVE error; implemented for real by the
                     mergeable AgentDDSketch expressions in
                     operators/ddsketch.py (percentile_approx remains
                     as an opt-in rank-error alternative)

Spark shapes (all map-side combinable, one logical shuffle per merge):
  samples:  array<struct<value:double, rate:bigint>>
  buckets:  array<struct<upper:double, count:bigint>>

The layout-identity requirement is enforced STRUCTURALLY: the merge
groups by the upper-limit array itself, so histograms with different
layouts land in different output rows instead of merging wrongly —
same observable behavior as the reference's `false` return (no
cross-layout merge), expressed as a grouping key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def make_histogram(
    value: Column, uppers: list[float]
) -> tuple[Column, Column, Column]:
    """Render one observation as a single-observation
    AggregatedHistogram (buckets, count, sum) under a fixed layout.
    Bucket counts are NON-cumulative per-bucket (the reference's
    Bucket{upper_limit, count} shape, samples_to_buckets in
    lib/vector-core/src/event/metric/mod.rs): one indicator in the
    bucket whose (prev, upper] range contains the value; values above
    the last limit count only in total count/sum (the implicit +Inf
    bucket)."""
    bucket_structs = []
    prev = None
    for u in uppers:
        lo_ok = F.lit(True) if prev is None else (value > F.lit(prev))
        hit = (lo_ok & (value <= F.lit(u))).cast("bigint")
        bucket_structs.append(
            F.struct(F.lit(float(u)).alias("upper"), hit.alias("count"))
        )
        prev = u
    buckets = F.array(*bucket_structs)
    return buckets, F.lit(1).cast("bigint"), value.cast("double")


def merge_histograms(
    df: DataFrame,
    interval: str,
    series_cols: list[str],
    buckets_col: str = "buckets",
    count_col: str = "count",
    sum_col: str = "sum",
    ts_col: str = "ts",
) -> DataFrame:
    """AggregatedHistogram merge (value.rs:229-253): element-wise
    bucket-count add within (window, series, layout).

    Plan: posexplode(buckets) -> per-(pos,upper) partial sums (this is
    the big aggregation, map-side combinable) -> tiny re-collect of
    the per-bucket rows into an ordered array. Row-level count/sum ride
    along at pos==0 so no extra join/scan of the input is needed."""
    layout = F.transform(F.col(buckets_col), lambda b: b["upper"]).alias("__layout")
    w = F.window(F.col(ts_col), interval).alias("__w")
    exploded = df.select(
        w,
        *series_cols,
        layout,
        F.col(count_col).alias("__rc"),
        F.col(sum_col).alias("__rs"),
        F.posexplode(F.col(buckets_col)).alias("__pos", "__b"),
    )
    per_bucket = exploded.groupBy("__w", *series_cols, "__layout", "__pos").agg(
        F.first(F.col("__b.upper")).alias("__upper"),
        F.sum(F.col("__b.count")).alias("__cnt"),
        F.sum(F.when(F.col("__pos") == 0, F.col("__rc"))).alias("__c0"),
        F.sum(F.when(F.col("__pos") == 0, F.col("__rs"))).alias("__s0"),
    )
    return (
        per_bucket.groupBy("__w", *series_cols, "__layout")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__upper", "__cnt"))
                ),
                lambda s: F.struct(
                    s["__upper"].alias("upper"), s["__cnt"].alias("count")
                ),
            ).alias(buckets_col),
            F.max("__c0").alias(count_col),
            F.max("__s0").alias(sum_col),
        )
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w", "__layout")
    )


def merge_distributions(
    df: DataFrame,
    interval: str,
    series_cols: list[str],
    samples_col: str = "samples",
    statistic_col: str = "statistic",
    ts_col: str = "ts",
) -> DataFrame:
    """Distribution merge (value.rs:217-228): samples concatenate,
    same-statistic only (statistic is part of the grouping key, like
    the reference's equality guard)."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), interval).alias("__w"),
            *series_cols,
            F.col(statistic_col),
        )
        .agg(F.flatten(F.collect_list(F.col(samples_col))).alias(samples_col))
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def merge_sets(
    df: DataFrame,
    interval: str,
    series_cols: list[str],
    values_col: str = "set_values",
    ts_col: str = "ts",
) -> DataFrame:
    """Set merge (value.rs:213-216): union of unique string values."""
    return (
        df.groupBy(F.window(F.col(ts_col), interval).alias("__w"), *series_cols)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(F.col(values_col))))
            ).alias(values_col)
        )
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def distribution_stats(
    df: DataFrame,
    samples_col: str = "samples",
    quantiles: list[float] | None = None,
    method: str = "ddsketch",
) -> DataFrame:
    """Derive the sink-side statistics from merged distributions
    (StatisticKind::Summary rendering in the reference's sinks:
    min/max/avg/sum/count + quantiles).

    method="ddsketch" (default): the reference's actual Sketch path —
    distribution samples are inserted into an AgentDDSketch
    (value.rs:140-193 Sketch{AgentDDSketch}) and quantiles carry its
    relative-error contract ((gamma-1)/2 ~ 0.78%). Implemented by the
    mergeable native-expression sketch in operators/ddsketch.py.

    method="percentile_approx": the Greenwald-Khanna analogue kept
    from earlier rounds (rank-error rather than relative-error
    bounds)."""
    quantiles = quantiles or [0.5, 0.95, 0.99]
    if method not in ("ddsketch", "percentile_approx"):
        raise ValueError(f"unknown quantile method: {method!r}")
    s = F.col(samples_col)

    if method == "ddsketch":
        from vector_spark.operators.ddsketch import (
            sketch_agg,
            sketch_quantile,
        )

        orig = [c for c in df.columns if c != samples_col]
        samples = df.select(*orig, F.explode(s).alias("__sm")).select(
            *orig,
            F.col("__sm.value").alias("__v"),
            F.col("__sm.rate").alias("__r"),
        )
        # rate feeds the sketch as observation multiplicity
        # (insert_n): no per-rate row expansion, so a rate-10^9
        # sample costs one row, and count/min/max/sum/avg fall out
        # of the sketch itself (rate < 1 contributes nothing, the
        # same exclusion the expansion path applies)
        sk = sketch_agg(samples, orig, "__v", weight_col="__r")
        qcols = [
            sketch_quantile(q).alias(f"q{int(q * 100)}") for q in quantiles
        ]
        return sk.select(
            *orig, "count", "sum", "min", "max", "avg", *qcols
        )
    # min/max must see only samples that actually occur (rate >= 1) —
    # otherwise max could exceed q100 for the same distribution
    vals = F.transform(
        F.filter(s, lambda x: x["rate"] >= 1), lambda x: x["value"]
    )
    rates = F.transform(s, lambda x: x["rate"])
    cnt = F.aggregate(rates, F.lit(0).cast("bigint"), lambda a, x: a + x)
    total = F.aggregate(
        s, F.lit(0.0), lambda a, x: a + x["value"] * x["rate"].cast("double")
    )
    base = df.withColumn("count", cnt).withColumn("sum", total).withColumn(
        "min", F.array_min(vals)
    ).withColumn("max", F.array_max(vals)).withColumn(
        "avg", F.col("sum") / F.col("count")
    )
    other = [c for c in base.columns if c != samples_col]
    exploded = base.select(*other, F.explode(s).alias("__sm"))
    # rate-weighted quantiles: repeat value `rate` times via sequence
    # explode. Guarded for rate < 1: F.sequence(1, 0) would yield the
    # DESCENDING [1, 0] (duplicating a zero-rate sample); instead a
    # rate-0 sample contributes nothing.
    weighted = exploded.select(
        *other,
        F.explode(
            F.transform(
                F.when(
                    F.col("__sm.rate") >= 1,
                    F.sequence(F.lit(1).cast("bigint"), F.col("__sm.rate")),
                ).otherwise(F.array().cast("array<bigint>")),
                lambda _: F.col("__sm.value"),
            )
        ).alias("__v"),
    )
    qcols = [
        F.percentile_approx(F.col("__v"), q, F.lit(10_000)).alias(
            f"q{int(q * 100)}"
        )
        for q in quantiles
    ]
    return weighted.groupBy(*other).agg(*qcols)
