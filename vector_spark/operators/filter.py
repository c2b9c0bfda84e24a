"""filter — keep events matching a condition, drop the rest.

Parity: src/transforms/filter.rs:74-83. Conditions are Spark boolean
Columns (the Condition enum of src/conditions/mod.rs:22-47 all lower
to Column predicates in this engine). Trivial by design: the value is
that the predicate is declarative, so Catalyst pushes it into the
parquet scan (PushedFilters) instead of evaluating post-read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_events(df: DataFrame, condition: Column) -> DataFrame:
    # raw 3-valued condition: a NULL predicate drops the row exactly
    # like the reference's false, and — unlike coalesce(cond, false),
    # which is pushdown-opaque — the bare predicate reaches the scan
    # as PushedFilters (verified in PLANS.md / test_filter_pushdown)
    return df.filter(condition)
