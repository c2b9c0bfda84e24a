"""Physical-plan shape regressions for the round-4 query paths.

Correctness tests elsewhere prove the VALUES; these pin the PLAN
properties that make each path safe at 100 TB, so a refactor that
silently reintroduces a scale-killer (cartesian pair join, global
single-partition sort, per-field UDF re-evaluation) fails CI even
though the small-SF values still match.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from vector_spark.queries import QUERIES

    return QUERIES


def test_dup_groups_no_cartesian(spark, queries):
    # Connected components over LSH candidate pairs: every iteration is
    # self-join + min-aggregate on ids — a cartesian/NL join anywhere
    # would be quadratic in docs at scale.
    plan = executed(queries["dp_dup_groups"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_keep_no_cartesian_no_global_sort(spark, queries):
    plan = executed(queries["dp_dedup_keep"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # canonical-doc pick is a per-group max_by/struct-max, not a global
    # order-by over all docs (rangepartitioning == global sort)
    assert "rangepartitioning" not in plan, plan


def test_sketch_agg_is_two_level_no_window(spark, queries):
    # DDSketch bins: explode-free native expressions, partial+final
    # HashAggregate, no window exec (a window would force a sort of all
    # events per group) and no Python crossing.
    plan = executed(queries["op_agg_sketch"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan, plan
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, plan


def test_sketch_merge_reaggregates_without_python(spark, queries):
    plan = executed(queries["op_agg_sketch_merge"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan, plan


def test_line_agg_modes_single_window_chain_no_python(spark, queries):
    # Mode enum is lag/sum window math over (source, ts) — must stay
    # JVM-side; one partitioning (by source) serves the whole chain, so
    # at most one exchange for the window tree.
    df = queries["op_line_agg_modes"](spark, SF_DIR)
    plan = executed(df)
    assert "ArrowEvalPython" not in plan, plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, f"{n_exchange} hash exchanges\n{plan}"


def test_tfidf_no_global_sort(spark, queries):
    # per-doc top-k terms: rank window partitioned by doc_id (high
    # cardinality) — a global Sort without partitioning would serialize
    # the corpus through one task.
    plan = executed(queries["dp_tfidf_terms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    # window sorts are fine — they follow a hashpartitioning exchange;
    # a rangepartitioning exchange would mean a global sort
    assert "rangepartitioning" not in plan, plan


def test_stratified_sample_zero_shuffle(spark, queries):
    # rate table compiles to a literal CASE over a portable hash —
    # pure projection, scan-parallel.
    plan = executed(queries["dp_stratified_sample"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def _bind_once_pinned(plan: str) -> None:
    # parse_syslog / parse_regex_onepass bind the sentinel-split array
    # ONCE per row via functions/parse.py::bind_once: every
    # regexp_replace in the optimized plan must sit inside the
    # element_at(transform(array(...))) wrapper. After extract-value
    # inlining each projected field carries its own TEXTUAL copy of
    # that wrapper, but the copies are unconditional top-level
    # subtrees, which codegen subexpression elimination collapses to
    # one runtime evaluation. The pre-fix shape — the array referenced
    # through nullif/coalesce conditionals WITHOUT the wrapper — is
    # skipped by subexpression elimination (conditional branches) and
    # re-ran the alternation once per field: 48-61 s vs 1.5 s at
    # sf0.1. Wrapper-count == regex-count pins the fixed shape.
    n_regex = plan.count("regexp_replace")
    n_wrap = plan.count("element_at(transform(array(")
    assert n_regex >= 1, plan
    assert n_regex == n_wrap, f"{n_regex} regexp_replace vs {n_wrap} bind_once wrappers\n{plan[:4000]}"


def test_parse_syslog_bind_once_shape(spark, queries):
    df = queries["op_parse_syslog"](spark, SF_DIR)
    _bind_once_pinned(df._jdf.queryExecution().optimizedPlan().toString())


def test_onepass_presets_bind_once_shape(spark):
    # Same pin for the parse_regex_onepass family (apache/nginx error,
    # glog, ALB presets): projecting every struct field individually —
    # the worst case for extract-value inlining.
    from pyspark.sql import functions as F

    from vector_spark.functions.presets import parse_nginx_log

    df = spark.createDataFrame(
        [("2024/01/01 00:00:00 [error] 1#1: *1 boom",)], "line string"
    )
    out = df.select(
        parse_nginx_log(F.col("line"), format="error").alias("s")
    ).select("s.*")
    _bind_once_pinned(out._jdf.queryExecution().optimizedPlan().toString())
