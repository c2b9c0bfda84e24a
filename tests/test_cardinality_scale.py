"""tag_cardinality_limit scale plan + probabilistic (Bloom-analogue)
mode, and the similarity degenerate-cell cap.

The operator exists for tags whose distinct cardinality explodes
(UUID-valued tags), so its accept-set top-N must never serialize the
distinct table through one task: the plan must show
TakeOrderedAndProject (per-partition top-N + merge of <=limit rows)
and NO window exec."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators.cardinality import tag_cardinality_limit


def _tags(spark, n_vals=200):
    rows = [(i, f"v{i % n_vals}") for i in range(1000)]
    return spark.createDataFrame(rows, "seq long, tag string")


def test_plan_is_take_ordered_not_window(spark):
    df = _tags(spark)
    out = tag_cardinality_limit(df, "tag", limit=10, order_by=F.col("seq"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_drop_tag_semantics(spark):
    df = _tags(spark, n_vals=20)
    out = tag_cardinality_limit(df, "tag", limit=5, order_by=F.col("seq"))
    kept = {r.tag for r in out.collect() if r.tag is not None}
    # first-seen order is seq: v0..v4 accepted, the rest nulled
    assert kept == {f"v{i}" for i in range(5)}
    assert out.count() == 1000  # drop_tag never drops events


def test_drop_event_semantics(spark):
    df = _tags(spark, n_vals=20)
    out = tag_cardinality_limit(
        df, "tag", limit=5, order_by=F.col("seq"), action="drop_event"
    )
    assert out.count() == 250  # 5 of 20 values survive, uniform


def test_probabilistic_under_limit_is_identity(spark):
    """Bloom-mode analogue: when the sketch says the tag fits, the
    accept-set machinery is skipped entirely — result == input."""
    df = _tags(spark, n_vals=20)
    out = tag_cardinality_limit(
        df, "tag", limit=500, order_by=F.col("seq"), mode="probabilistic"
    )
    assert out is df  # short-circuit, no plan grown


def test_probabilistic_over_limit_falls_through(spark):
    df = _tags(spark, n_vals=200)
    exact = tag_cardinality_limit(df, "tag", limit=5, order_by=F.col("seq"))
    prob = tag_cardinality_limit(
        df, "tag", limit=5, order_by=F.col("seq"), mode="probabilistic"
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, prob.collect()))


import pytest


@pytest.mark.parametrize(
    "n_vals,limit",
    [(10, 40), (50, 200), (300, 100), (500, 120)],
)
def test_probabilistic_false_accept_bound(spark, n_vals, limit):
    """Bloom-analogue error envelope: the short-circuit fires only
    when approx_count_distinct * 1.1 <= limit. HLL++ default rsd is
    2%, so with a 2x margin between true cardinality and limit the
    sketch can never flip the decision — under-limit tags are
    accepted wholesale (zero false DROPS), over-limit tags fall
    through to the exact path (false ACCEPTS bounded by sketch error,
    here zero)."""
    df = _tags(spark, n_vals=n_vals)
    out = tag_cardinality_limit(
        df, "tag", limit=limit, order_by=F.col("seq"), mode="probabilistic"
    )
    if n_vals * 2 <= limit:
        assert out is df  # accept-all, no false drops possible
    else:
        kept = {r.tag for r in out.collect() if r.tag is not None}
        assert len(kept) == limit  # exact fallthrough: no false accepts


def test_cosine_bucket_cap(spark):
    """A degenerate quantization cell (here: identical near-zero
    embeddings) is dropped from pairing when over max_bucket; a
    genuine near-dup pair in a small cell survives."""
    from vector_spark.datapipe.similarity import cosine_near_dup_pairs

    rows = [(i, [0.001, 0.001, 0.001, 0.001]) for i in range(30)]
    rows += [(100, [0.9, 0.1, 0.2, 0.3]), (101, [0.9, 0.1, 0.2, 0.31])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = cosine_near_dup_pairs(df, threshold=0.9, max_bucket=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    assert not any(a < 100 and b < 100 for a, b in got)  # degenerate cell gone
    # uncapped finds the quadratic blowup pairs too
    full = cosine_near_dup_pairs(df, threshold=0.9, max_bucket=None)
    assert full.count() > len(got)


def test_ivf_exact_at_full_probes(spark):
    """probes == n_centroids degenerates IVF to exact brute force."""
    from vector_spark.datapipe.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(emb.vec_id < 5)
    full = sorted(map(tuple, ivf_topk(emb, q, probes=8).collect()))
    bf = sorted(map(tuple, cosine_topk(emb, q, k=5).collect()))
    assert full == bf


def test_ivf_recall_monotone_in_probes(spark):
    from vector_spark.datapipe.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(emb.vec_id < 5)
    truth = {(r.qid, r.vec_id) for r in cosine_topk(emb, q, k=5).collect()}

    def recall(p):
        got = {(r.qid, r.vec_id) for r in ivf_topk(emb, q, probes=p).collect()}
        return len(got & truth) / len(truth)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8 == 1.0
