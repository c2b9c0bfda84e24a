"""Enrichment-table semantics (lib/enrichment/src/lib.rs):
exactly-one-match invariant, case-insensitive keys, BetweenDates."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.enrich import enrich_between, enrich_lookup


def test_non_unique_dim_raises(spark):
    """get_enrichment_table_record errors unless exactly 1 row matches
    (lib.rs:43-51); we enforce it at build time on the dim side."""
    fact = spark.createDataFrame([("a",)], "k string")
    dim = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v int")
    with pytest.raises(ValueError, match="not unique"):
        enrich_lookup(fact, dim, on=["k"])


def test_lookup_left_and_case_insensitive(spark):
    fact = spark.createDataFrame([("Bash",), ("nope",)], "tool string")
    dim = spark.createDataFrame([("bash", "shell")], "tool string, cat string")
    out = {
        r.tool: r.cat
        for r in enrich_lookup(fact, dim, on=["tool"], case_insensitive=True).collect()
    }
    assert out == {"Bash": "shell", "nope": None}


def test_between_dates(spark):
    fact = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5)), (2, datetime.datetime(2024, 2, 5))],
        "id int, ts timestamp",
    )
    dim = spark.createDataFrame(
        [("jan", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 31))],
        "campaign string, valid_from timestamp, valid_to timestamp",
    )
    out = {r.id: r.campaign for r in enrich_between(fact, dim, ts_col="ts").collect()}
    assert out == {1: "jan", 2: None}
