"""span_dedup: C4-style cross-document span dedup — keep-first
semantics checked against a hand-computed case, plus the plan
properties that make it scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.datapipe.dedup import span_dedup


def test_keep_first_and_reassembly(spark):
    # span size 2: doc 1 = [a b][c d], doc 2 repeats [a b] then own
    # [x y]; doc 3 is entirely doc-1 spans -> empty survivor.
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b x y"),
            (3, "a b c d"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: (r["text_dedup"], r["n_kept"])
        for r in span_dedup(df, "doc_id", "text", span_words=2).collect()
    }
    assert out[1] == ("a b c d", 2)
    assert out[2] == ("x y", 1)  # "a b" first seen in doc 1
    assert out[3] == ("", 0)  # fully duplicated -> empty, still a row
    assert out[4] == ("", 0)  # NULL text -> zero spans


def test_within_doc_duplicates_kept_once(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c d")], "doc_id bigint, text string"
    )
    row = span_dedup(df, "doc_id", "text", span_words=2).collect()[0]
    # second "a b" (seg_idx 1) loses to seg_idx 0 of the same doc
    assert row["text_dedup"] == "a b c d"
    assert row["n_kept"] == 2


def test_trailing_short_span(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    row = span_dedup(df, "doc_id", "text", span_words=2).collect()[0]
    assert row["text_dedup"] == "a b c"
    assert row["n_kept"] == 2  # [a b] + trailing [c]


def test_plan_no_cartesian_no_python(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    out = span_dedup(df, "doc_id", "text")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    # keep-first is the map-side-combinable min(struct) aggregate, not
    # a window over the span stream
    assert "Window" not in plan, plan
