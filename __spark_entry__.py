"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship parse->enrich->route->aggregate pipeline on
sf0.001 transcripts; queries()/oracle_sql(): one entry per implemented
operator (SURVEY.md §2 + training-data ops), DuckDB-verifiable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: run the full pipeline
    and return the per-sink windowed aggregates (union, tagged by
    sink) — the blackhole-equivalent observable output."""
    from vector_spark.deploy import ship_package
    from vector_spark.plans.transcript_pipeline import run_pipeline
    from vector_spark.queries import transcripts
    from vector_spark.session import tune_session

    tune_session(spark)
    ship_package(spark)
    df = transcripts(spark, "/root/testdata/sf0.001")
    out = run_pipeline(spark, df)
    parts = []
    for sink, agg in out.aggregates.items():
        parts.append(agg.select(F.lit(sink).alias("sink"), "*"))
    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return result


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vector_spark.queries import ORACLES

    return dict(ORACLES)
