"""Sinks (SURVEY.md §2.4): partition-templated object-store writes,
counting blackhole, console.

The reference's file/S3 sinks render a key template per event
(src/sinks/util/partitioner.rs:5-30, file sink template
src/sinks/file/mod.rs:44-51, e.g. /tmp/vector-%Y-%m-%d.log) and batch
by size/count/time. Spark mapping: the template's fields ARE partition
columns — `write.partitionBy` gives one directory per rendered key and
the file-size batching knob is maxRecordsPerFile.

The transcript table's production layout mirrors the Iceberg spec
`days(ts), bucket(16, conv_id)` (no Iceberg runtime in this sandbox;
the same layout is materialized as parquet partition dirs — swap
`.format("iceberg")` in when the catalog exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.plans.metrics import StageMetrics

N_CONV_BUCKETS = 16


def with_partition_keys(df: DataFrame, ts_col: str = "ts", conv_col: str = "conv_id") -> DataFrame:
    """days(ts), bucket(16, conv_id) — the Iceberg partition transform
    rendered as columns (bucket = xxhash, matching Spark's own
    clustering so joins/windows on conv_id align with storage)."""
    return df.withColumn("p_day", F.to_date(F.col(ts_col))).withColumn(
        "p_bucket", F.pmod(F.xxhash64(F.col(conv_col)), F.lit(N_CONV_BUCKETS))
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Templated-path sink: one directory per rendered partition key;
    file size targeted via maxRecordsPerFile (the batch.max_events
    analogue, src/sinks/util/batch.rs:104-131)."""
    partition_cols = partition_cols or ["p_day", "p_bucket"]
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def blackhole(df: DataFrame, metrics: StageMetrics | None = None, stage: str = "blackhole") -> int:
    """Counting null sink (src/sinks/blackhole/): materializes the
    frame, returns the event count; optionally records it as a stage
    metric."""
    if metrics is not None:
        df = metrics.observe(df, stage)
    return df.count()


def console(df: DataFrame, n: int = 20) -> None:
    """Debug print sink (console sink analogue)."""
    df.show(n, truncate=False)


def iceberg_available(spark) -> bool:
    """Probe for an Iceberg runtime (catalog impl on the classpath).
    False in this sandbox — callers fall back to the parquet layout
    that mirrors the same partition spec."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def iceberg_transcripts_ddl(table: str = "catalog.db.transcripts") -> str:
    """The production table DDL for the 10^12-turn transcript table —
    the north rule's explicit partitioning `days(ts),
    bucket(conv_id)`: day partitions give time-range pruning for the
    windowed aggregates; 16-way conv_id bucketing co-locates each
    conversation so the stable-order window and per-conversation
    joins read pre-clustered data (storage-partitioned joins skip the
    shuffle on matching bucket specs)."""
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  conv_id   STRING  NOT NULL,
  turn_idx  INT     NOT NULL,
  role      STRING,
  text      STRING,
  tool      STRING,
  ts        TIMESTAMP NOT NULL
)
USING iceberg
PARTITIONED BY (days(ts), bucket({N_CONV_BUCKETS}, conv_id))
TBLPROPERTIES (
  'write.target-file-size-bytes' = '536870912',
  'write.distribution-mode'      = 'hash',
  'write.parquet.compression-codec' = 'zstd',
  'commit.retry.num-retries'     = '10'
)
""".strip()


def write_transcripts(df: DataFrame, target: str, spark=None) -> None:
    """Unified sink: writeTo(...).append() against a real Iceberg
    catalog when the runtime is present, else the parquet rendering
    of the SAME partition spec (with_partition_keys + partitionBy).
    Identical layout either way — day dirs x conv buckets."""
    spark = spark or df.sparkSession
    if iceberg_available(spark):
        df.writeTo(target).append()
    else:
        write_partitioned(with_partition_keys(df), target)
