"""SparkSession factory tuned for this engine.

Local-mode testing uses local[N]; the same configs (AQE, skew join,
UTC session TZ, Arrow) are what we'd set on a multi-executor cluster
via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "vector-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    cores defaults to $SPARK_GRAFT_CPUS (driver contract) or 32.
    shuffle_partitions defaults to cores — correct for local mode;
    on a real cluster this would be ~2-3x total executor cores.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from vector_spark.deploy import ship_package

    ship_package(spark)  # pandas-UDF closures resolve on workers anywhere
    return spark


def tune_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable configs to a session we did not create
    (e.g. the driver's). Only touches runtime-mutable keys."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    from vector_spark.deploy import ship_package

    ship_package(spark)
    return spark
