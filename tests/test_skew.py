"""salted_agg / salted_repartition: skew-safe plans, identical results
(SURVEY §4 'Skew/salting'; the hot-conversation scenario)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators.skew import salted_agg, salted_repartition


def _skewed(spark):
    # one hot key (k=0) carrying 90% of rows
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 100).alias("v"),
        F.col("id"),
    )


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            keys=["k"],
            partial={
                "n": F.count(F.lit(1)),
                "s": F.sum("v"),
                "mx": F.max("v"),
            },
            final={
                "n": lambda c: F.sum(c),
                "s": lambda c: F.sum(c),
                "mx": lambda c: F.max(c),
            },
            salt_n=8,
            salt_from=F.col("id"),
        ).collect()
    }
    assert plain == salted


def test_salted_agg_splits_hot_key(spark):
    # phase-1 output must contain multiple rows for the hot key
    df = _skewed(spark)
    phase1 = (
        df.withColumn("__salt", F.pmod(F.col("id"), F.lit(8)))
        .groupBy("k", "__salt")
        .count()
    )
    hot_rows = phase1.filter(F.col("k") == 0).count()
    assert hot_rows == 8


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed(spark)
    out = salted_repartition(df, keys=["k"], salt_n=8, salt_from=F.col("id"))
    # rows of the hot key should land in >1 partition
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("k") == 0)
        .select("pid")
        .distinct()
        .count()
    )
    assert parts > 1
    assert out.count() == df.count()
    assert "__salt" not in out.columns
