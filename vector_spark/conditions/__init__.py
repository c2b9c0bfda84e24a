"""Condition surfaces for route/filter: Column/SQL predicates (see
plans.pipeline), the Datadog search query DSL compiler, and VRL
boolean-expression conditions (the reference's full condition enum,
src/conditions/mod.rs: vrl / datadog_search / is_log / is_metric /
is_trace — the type tests live in operators/event_kind.py)."""

from vector_spark.conditions.datadog_search import DdSchema, dd_query  # noqa: F401
from vector_spark.conditions.vrl_condition import vrl_cond  # noqa: F401
