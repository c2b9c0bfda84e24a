"""Resumability: partitions completed before a crash are skipped on
restart; lineage records per-partition row counts (ack-then-checkpoint,
cf. lib/vector-common/src/finalization.rs / file checkpointer)."""

import os

import pytest
from pyspark.sql import functions as F

from vector_spark.plans.checkpoint import CheckpointManager, run_resumable


def test_resume_skips_completed(spark, tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "manifest"))
    out_dir = str(tmp_path / "out")
    calls = []

    def load(key):
        return spark.range(100).withColumn("part", F.lit(key))

    def process(df):
        return df.filter(F.col("id") % 2 == 0)

    def write(key, df):
        calls.append(key)
        path = os.path.join(out_dir, key)
        df.write.mode("overwrite").parquet(path)
        return df.count()

    parts = ["day=2024-01-01", "day=2024-01-02", "day=2024-01-03"]
    ran = run_resumable(parts, load, process, write, ckpt)
    assert set(ran) == set(parts)
    assert all(v["rows_in"] == 100 and v["rows_out"] == 50 for v in ran.values())

    # "restart": nothing re-runs
    calls.clear()
    ran2 = run_resumable(parts, load, process, write, ckpt)
    assert ran2 == {} and calls == []

    # one new partition appears -> only it runs
    ran3 = run_resumable(parts + ["day=2024-01-04"], load, process, write, ckpt)
    assert set(ran3) == {"day=2024-01-04"} and calls == ["day=2024-01-04"]

    # lineage persisted
    done = ckpt.completed()
    assert len(done) == 4
    assert done["day=2024-01-01"]["rows_out"] == 50


def test_failed_write_not_committed(spark, tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "m2"))

    def bad_write(key, df):
        raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        run_resumable(
            ["p1"],
            lambda k: spark.range(10),
            lambda df: df,
            bad_write,
            ckpt,
        )
    assert not ckpt.is_done("p1")  # crash before ack -> partition re-runs
