"""Semantic (embedding-space) dedup — SemDeDup-style composition of
the bucketed cosine pair path with connected-components keep-best.

Value strategy: a tiny hand-built corpus where text-hash dedup sees
NOTHING (all texts distinct) but embeddings chain two docs through a
third — the kept set must respect the transitive semantic group. Plan
strategy: same no-cartesian/no-global-sort pins as the minhash-path
dedup (test_plan_shapes_r4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.datapipe.similarity import semantic_dedup_keep

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    # Vectors [1,0,0,0,tan(theta)] differ only in dim 5 — OUTSIDE
    # quantize_bucket's leading 4 dims, so 0/1/2 share one cell and
    # the bucketed pair join sees them all. cosine between two such
    # vectors is cos(theta_a - theta_b): theta = 0/10/20 degrees puts
    # the adjacent pairs at cos10 ~ 0.985 (>= 0.97) and the far pair
    # at cos20 ~ 0.940 (< 0.97) — the 0-1-2 group exists ONLY through
    # the transitive closure. 3 points the other way (own cell).
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0, 0.17632698]),  # tan 10deg
        (2, [1.0, 0.0, 0.0, 0.0, 0.36397023]),  # tan 20deg
        (3, [-1.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    docs = spark.createDataFrame(
        [
            (0, "alpha text"),
            (1, "a paraphrase, longer than the original"),
            (2, "yet another different wording"),
            (3, "unrelated document"),
        ],
        "doc_id bigint, text string",
    )
    return docs, emb


def test_transitive_semantic_group(spark):
    docs, emb = _corpus(spark)
    kept = semantic_dedup_keep(docs, emb, threshold=0.97)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    # cos(0,1) and cos(1,2) clear 0.97; cos(0,2) does not — only the
    # transitive closure groups all three. Keeper = longest text = 1.
    assert ids == [1, 3]


def test_quality_override_and_tiebreak(spark):
    docs, emb = _corpus(spark)
    # constant quality -> ties -> min doc_id wins within the group
    kept = semantic_dedup_keep(docs, emb, threshold=0.97, quality_col=F.lit(1))
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [0, 3]


def test_plan_no_cartesian_no_global_sort(spark):
    from vector_spark.queries import QUERIES

    df = QUERIES["dp_semantic_dedup"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
