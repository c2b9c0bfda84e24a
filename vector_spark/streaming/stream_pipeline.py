"""The flagship parse -> enrich -> route -> aggregate pipeline as a
Structured Streaming job — the form closest to the reference's actual
runtime (Vector is a continuous stream processor; our batch plans are
its deterministic bounded replay).

Reuses the batch stages verbatim: parse_work / enrich_stage are
per-row (narrow), so the same Column expressions run unchanged on an
unbounded DataFrame; the tool lookup is a stream-static broadcast
join; route fan-out is the same explode-over-matching-sinks; the
per-sink aggregate becomes a watermarked tumbling window (aggregate.rs
interval flush, late data beyond the watermark discarded explicitly).

The stable-order turn_seq window is deliberately absent here:
row_number over (conv_id, turn_idx) is a bounded-replay construct
(batch materialization / per-turn golden equality); in the streaming
form ordering is event-time + watermark, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.plans.transcript_pipeline import (
    AGG_INTERVAL,
    enrich_stage,
    parse_work,
    route_conditions,
)


def stream_pipeline(
    spark: SparkSession,
    sdf: DataFrame,
    interval: str = AGG_INTERVAL,
    watermark: str = "30 minutes",
    use_pandas_grok: bool = True,
) -> DataFrame:
    """streaming transcripts -> per-(sink, window, role, category)
    aggregate counts. Run with .writeStream (append mode emits a
    window once the watermark passes it; complete mode for tests)."""
    work = enrich_stage(parse_work(sdf, use_pandas_grok=use_pandas_grok), spark)
    ok = work.filter(F.col("parse_ok"))
    conds = {n: F.coalesce(c, F.lit(False)) for n, c in route_conditions().items()}
    none_match = ~F.greatest(*conds.values())
    sinks = F.array_compact(
        F.array(
            *[F.when(c, F.lit(n)) for n, c in conds.items()],
            F.when(none_match, F.lit("_unmatched")),
        )
    )
    fanned = ok.withColumn("sink", F.explode(sinks))
    return (
        fanned.withWatermark("ts", watermark)
        .groupBy(
            F.col("sink"),
            F.window(F.col("ts"), interval).alias("w"),
            F.col("role_norm"),
            F.col("tool_category"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.coalesce(F.col("dur_ms"), F.lit(0))).alias("dur_ms_sum"),
        )
        .select(
            "sink",
            F.col("w.start").alias("window_start"),
            "role_norm",
            "tool_category",
            "events",
            "dur_ms_sum",
        )
    )
