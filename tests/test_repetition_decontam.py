"""Gopher-style repetition signals and benchmark decontamination:
value semantics on hand-built corpora plus the scale-plan assertions
(repetition = zero exchanges; decontamination = broadcast join, no
shuffle of the corpus n-gram side before the hit filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.datapipe.dedup import decontaminate
from vector_spark.datapipe.textstats import repetition_signals


def test_repetition_values(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam eggs"),  # top word 4/5
            (2, "a b c d e f"),  # no repeats
            (3, "x y x y x y x y"),  # bigram 'x y' repeated
            (4, "solo"),  # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1.n_words == 5 and r1.top_word_count == 4
    assert abs(r1.top_word_frac - 0.8) < 1e-9
    assert r1.is_repetitive
    r2 = out[2]
    assert r2.top_word_count == 1 and r2.dup_2gram_frac == 0.0
    assert not r2.is_repetitive
    r3 = out[3]
    # 7 bigrams: 'x y' x4, 'y x' x3 -> 2 distinct -> 5/7 duplicates
    assert abs(r3.dup_2gram_frac - 5 / 7) < 1e-6
    assert r3.is_repetitive
    r4 = out[4]
    assert r4.n_words == 1 and r4.dup_2gram_frac == 0.0


def test_repetition_null_and_empty_text(spark):
    """NULL / '' / whitespace text: zeroed signals, never flagged,
    row preserved (parity with the oracle's LEFT JOIN shape)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r.n_words == 0 and r.top_word_count == 0
        assert r.top_word_frac == 0.0 and r.dup_2gram_frac == 0.0
        assert r.is_repetitive is False


def test_repetition_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decontaminate_hits(spark):
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "entirely different words appear here only"),
            (12, "quick brown fox runs fast and quick brown fox"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "a quick brown fox question")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_hits for r in decontaminate(corpus, bench, n=3).collect()}
    # 'quick brown fox' is the only shared 3-gram; distinct per doc
    assert out == {10: 1, 12: 1}


def test_decontaminate_broadcasts_bench(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(2, "c d e f g")], "doc_id long, text string")
    plan = (
        decontaminate(corpus, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_differential_random_corpus(spark):
    """Differential check against a pure-Python reference on 200
    seeded random word-soup docs (one Spark job): the sorted-array
    run-length fold must equal collections.Counter's most_common, and
    the dup-bigram fraction must match the set-based count."""
    import random
    from collections import Counter

    rng = random.Random(20240817)
    vocab = ["a", "bb", "ccc", "dd", "e", "spam", "x1", "y_2"]
    docs = []
    for i in range(200):
        n = rng.randint(0, 30)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    for i, text in docs:
        words = text.split() if text.strip() else []
        top = Counter(words).most_common(1)[0][1] if words else 0
        grams = [" ".join(words[j : j + 2]) for j in range(len(words) - 1)]
        dup = len(grams) - len(set(grams))
        r = got[i]
        assert r.n_words == len(words), (i, text)
        assert r.top_word_count == top, (i, text)
        assert abs(r.dup_2gram_frac - (dup / max(len(grams), 1))) < 1e-6, (i, text)


def test_split_assign_stable_and_proportional(spark):
    from vector_spark.datapipe.textstats import split_assign

    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in split_assign(df).select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in split_assign(df).select("doc_id", "split").collect()}
    assert a == b  # rerun never migrates a document
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.97 < c["train"] / 10_000 < 0.99
    assert c["val"] + c["test"] < 600
    # changing the salt reshuffles, changing nothing else
    s2 = {r.doc_id: r.split for r in split_assign(df, salt="v2").select("doc_id", "split").collect()}
    assert s2 != a


def test_top_words_plan_is_take_ordered(spark):
    """Heavy-hitter top-k must compile to TakeOrderedAndProject —
    never a global sort or single-partition window."""
    from vector_spark.datapipe.textstats import top_words

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c b a")], "doc_id long, text string"
    )
    out = top_words(df, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = [(r.word, r.n) for r in out.collect()]
    assert rows == [("a", 3), ("b", 3)]  # tie at 3 -> lexicographic


def test_full_ingest_chain_composition(spark):
    """The new ops compose with clean_corpus the way a pretraining
    ingest would: clean -> repetition filter -> decontaminate-drop ->
    split assignment, all one declarative plan; row accounting must
    be consistent at every stage."""
    from vector_spark.datapipe.corpus_pipeline import clean_corpus
    from vector_spark.datapipe.textstats import repetition_signals, split_assign

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = docs.count()

    cleaned = clean_corpus(docs)  # (id, n_words, tokens)
    kept = docs.join(
        cleaned.select(F.col("id").alias("doc_id")), "doc_id", "inner"
    )
    n_clean = kept.count()
    assert 0 < n_clean <= n_docs

    rep = repetition_signals(kept).filter(~F.col("is_repetitive"))
    non_rep = kept.join(rep.select("doc_id"), "doc_id", "inner")

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    hits = decontaminate(non_rep, bench, n=3)
    final = split_assign(
        non_rep.join(hits.select("doc_id"), "doc_id", "left_anti")
    )
    counts = {r.split: r.n for r in final.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) <= n_clean
    assert counts.get("train", 0) > 0
    # every surviving doc got exactly one split label
    assert final.filter(F.col("split").isNull()).count() == 0


def test_simhash_pairs_finds_near_dups(spark):
    from vector_spark.datapipe.dedup import simhash_near_dup_pairs

    base = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extraword"),  # tiny perturbation -> small hamming
            (3, " ".join(f"other{i}" for i in range(60))),  # unrelated
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(3 not in p for p in pairs)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_near_dup_pairs(docs, max_hamming=4)


def test_simhash_native_twin_bit_equal(spark):
    from vector_spark.datapipe.dedup import simhash64, simhash64_native

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, ""), (3, None), (4, "alpha beta")],
        "doc_id long, text string",
    )
    a = {r.id: r.simhash for r in simhash64(df, "doc_id", "text").collect()}
    b = {r.id: r.simhash for r in simhash64_native(df, "doc_id", "text").collect()}
    assert a == b
