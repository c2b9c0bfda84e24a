"""Bigram-LM perplexity scorer (datapipe/lm_quality.py): model math,
unk folding, decimal-sum determinism, plan shape.
"""

import math

import pytest
from pyspark.sql import functions as F

from vector_spark.datapipe.lm_quality import (
    UNK,
    bigram_pairs,
    lm_score,
    train_bigram_lm,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bigram_pairs_shapes(spark):
    out = (
        _docs(spark, ["a b c", "solo", "", None])
        .select(bigram_pairs(F.split(F.coalesce(F.trim("text"), F.lit("")), r"\s+")).alias("p"))
        .collect()
    )
    assert [tuple(x) for x in out[0]["p"]] == [("a", "b"), ("b", "c")]
    assert out[1]["p"] == []  # 1 token -> no pairs


def test_counts_and_null_xent_for_short_docs(spark):
    out = {
        r["doc_id"]: r
        for r in lm_score(_docs(spark, ["a b c d", "solo", "", None]), vocab_size=8).collect()
    }
    assert out[0]["n_tokens"] == 4 and out[0]["n_bigrams"] == 3
    assert out[0]["xent"] is not None and out[0]["xent"] > 0
    for short in (1, 2, 3):
        assert out[short]["n_bigrams"] == 0
        assert out[short]["xent"] is None and out[short]["logprob_sum"] is None
    assert out[1]["n_tokens"] == 1 and out[2]["n_tokens"] == 0


def test_unk_folding_and_vocab_cut(spark):
    # vocab_size=2 with counts a:4 > b:3 > c:1 -> vocab={a,b}, c->unk
    df = _docs(spark, ["a a b c", "a b a b"])
    vocab, contexts, bigrams, vsize = train_bigram_lm(df, vocab_size=2)
    assert {r["term"] for r in vocab.collect()} == {"a", "b"}
    bi = {(r["prev"], r["cur"]): r["c_bi"] for r in bigrams.collect()}
    assert bi == {("a", "a"): 1, ("a", "b"): 3, ("b", UNK): 1, ("b", "a"): 1}
    ctx = {r["prev"]: r["c_ctx"] for r in contexts.collect()}
    assert ctx == {"a": 4, "b": 2}
    assert vsize.first()["vsize"] == 3


def test_model_is_a_probability_distribution(spark):
    # add-1 over context counts: sum over all cur in vocab+unk of
    # P(cur|prev) == 1 exactly, for every prev (incl. unseen contexts,
    # where it degrades to the uniform 1/V).
    df = _docs(spark, ["a b a c a b b c a a b"])
    vocab, contexts, bigrams, vsize = train_bigram_lm(df, vocab_size=2)
    ctx = {r["prev"]: r["c_ctx"] for r in contexts.collect()}
    bi = {(r["prev"], r["cur"]): r["c_bi"] for r in bigrams.collect()}
    vs = vsize.first()["vsize"]
    terms = [r["term"] for r in vocab.collect()] + [UNK]
    for prev in terms + ["never-seen-context"]:
        total = sum(
            (bi.get((prev, cur), 0) + 1.0) / (ctx.get(prev, 0) + vs)
            for cur in terms
        )
        assert total == pytest.approx(1.0, abs=1e-12), prev


def test_hand_computed_logprob(spark):
    # One doc "a b a": vocab={a,b}, V=3. pairs: (a,b),(b,a)
    # ctx(a)=1, ctx(b)=1, c(a,b)=1, c(b,a)=1
    # lnP(b|a)=ln(2/4), lnP(a|b)=ln(2/4); each rounded to 6dp then summed.
    out = lm_score(_docs(spark, ["a b a"]), vocab_size=8).first()
    expect = 2 * round(math.log(2 / 4), 6)
    assert out["logprob_sum"] == pytest.approx(expect, abs=1e-9)
    assert out["xent"] == pytest.approx(round(-expect / 2, 6), abs=1e-9)


def test_heldout_unseen_context_falls_back_to_uniform(spark):
    # Train on a corpus whose vocab covers every train token (so the
    # model has NO <unk> mass), score a doc of entirely novel tokens:
    # every pair maps to (<unk>, <unk>), ctx(<unk>) = 0, and each
    # bigram scores exactly the uniform ln(1/V) = -ln(vocab+1).
    train = _docs(spark, ["a b a b c", "b c a a b"])
    score = spark.createDataFrame(
        [(0, "zz yy xx ww")], "doc_id long, text string"
    )
    out = lm_score(score, vocab_size=3, train_df=train).first()
    v = 4  # |{a,b,c}| + unk
    per_pair = round(math.log(1.0 / v), 6)
    assert out["n_bigrams"] == 3
    assert out["logprob_sum"] == pytest.approx(3 * per_pair, abs=1e-9)
    assert out["xent"] == pytest.approx(round(-per_pair, 6), abs=1e-9)


def test_partition_invariance_of_decimal_sum(spark):
    # The 6dp-round-then-DECIMAL-sum makes logprob_sum independent of
    # partitioning (double summation would not be).
    texts = [f"w{i % 7} w{(i * 3) % 7} w{(i * 5) % 7} w{i % 7}" for i in range(64)]
    base = _docs(spark, texts)
    a = {r["doc_id"]: r["logprob_sum"] for r in lm_score(base.repartition(1), vocab_size=4).collect()}
    b = {r["doc_id"]: r["logprob_sum"] for r in lm_score(base.repartition(16), vocab_size=4).collect()}
    assert a == b


def test_plan_shape(spark):
    df = lm_score(_docs(spark, ["a b c"] * 8), vocab_size=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan  # pure JVM
    # the only nested-loop join is the 1-row vsize broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_materialized_model_bit_equal_and_cache_released(spark, tmp_path):
    """The production lifecycle — train(materialize=path) ->
    load_bigram_lm -> lm_score(model=...) — must score bit-equal to
    the single-plan self-training form, and must leave NOTHING
    session-cached (the ADVICE cache-accumulation fix)."""
    from vector_spark.datapipe.lm_quality import (
        load_bigram_lm,
        unpersist_bigram_lm,
    )

    def persistent_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    spark.catalog.clearCache()  # drop caches earlier tests left behind
    # DELTA-based cache accounting: earlier tests' localCheckpoint RDDs
    # linger in the registry until GC (timing-dependent), so assert
    # that THIS lifecycle adds/releases its own entries, not that the
    # global registry is empty.
    base = persistent_ids()
    texts = [f"w{i % 5} w{(i * 2) % 5} w{(i * 3) % 5}" for i in range(48)]
    corpus = _docs(spark, texts)
    want = sorted(
        lm_score(corpus, vocab_size=4).collect(), key=lambda r: r["doc_id"]
    )

    path = str(tmp_path / "lm_model")
    model = train_bigram_lm(corpus, vocab_size=4, materialize=path)
    # materialize released the training caches
    leaked = persistent_ids() - base
    assert not leaked, f"materialize must unpersist the training caches: {leaked}"
    # reloaded tables are plain parquet scans
    reloaded = load_bigram_lm(spark, path)
    got = sorted(
        lm_score(corpus, vocab_size=999, model=reloaded).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # the non-materialized form exposes an unpersist handle
    cached = train_bigram_lm(corpus, vocab_size=4)
    cached[2].count()  # touch bigrams so the caches materialize
    assert persistent_ids() - base, "training caches should be registered"
    unpersist_bigram_lm(cached)
    assert not (persistent_ids() - base), "unpersist handle must release them"
