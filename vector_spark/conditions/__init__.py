"""Condition surfaces for route/filter: Column/SQL predicates (see
plans.pipeline) plus the Datadog search query DSL compiler."""

from vector_spark.conditions.datadog_search import DdSchema, dd_query  # noqa: F401
