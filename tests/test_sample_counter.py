"""Counter-mode sample semantics (src/transforms/sample.rs:90-135):
exact every-Nth selection under a total order, and the exclude
bypass — excluded events pass through unsampled, do NOT advance the
counter, and carry no sample_rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators.sample import sample


def _events(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("tag")
    )


def test_every_nth_exact(spark):
    df = _events(spark, 100).repartition(8)  # scrambled input order
    out = sample(df, rate=10, order_by=[F.col("event_id")]).collect()
    ids = sorted(r.event_id for r in out)
    assert ids == list(range(0, 100, 10))
    assert all(r.sample_rate == 10 for r in out)


def test_exclude_bypasses_counter(spark):
    df = _events(spark, 30)
    excl = F.col("tag") == 0  # ids 0,7,14,21,28 are exempt
    out = sample(df, rate=5, order_by=[F.col("event_id")], exclude=excl).collect()
    sampled = sorted(r.event_id for r in out if r.sample_rate is not None)
    passed = sorted(r.event_id for r in out if r.sample_rate is None)
    # counter runs over NON-excluded ids only:
    # eligible = [1,2,3,4,5,6,8,9,...]; every 5th of those
    eligible = [i for i in range(30) if i % 7 != 0]
    assert sampled == eligible[::5]
    assert passed == [i for i in range(30) if i % 7 == 0]


def test_counter_plan_has_no_global_window(spark):
    """The scale guarantee: no single-partition exchange over event
    data (the only SinglePartition is the O(num_partitions) counts
    frame feeding the broadcast offsets)."""
    df = _events(spark, 1000).repartition(8)
    out = sample(df, rate=7, order_by=[F.col("event_id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE Window node — the prefix-sum over the per-partition
    # COUNTS frame (one row per partition, post-aggregate), never over
    # event rows: it sits above the __cnt aggregate, and no row_number
    # window exists anywhere
    assert plan.count("Window") == 1
    assert "row_number" not in plan
    assert "__cnt" in plan
    out.count()
    final = out._jdf.queryExecution().executedPlan().toString()
    # event data crosses range exchanges only (plus the tiny counts
    # SinglePartition feeding the broadcast offsets)
    assert final.count("rangepartitioning") >= 1


def test_filter_pushdown(spark):
    """filter_events must leave the predicate pushdown-eligible
    (coalesce-wrapping it was measured to empty PushedFilters)."""
    import contextlib
    import io
    import re

    from vector_spark.operators.filter import filter_events

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = filter_events(ev, (F.col("event_type") == "error") & (F.col("value") > 10))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", buf.getvalue())
    assert pushed and "EqualTo(event_type,error)" in pushed[0]
