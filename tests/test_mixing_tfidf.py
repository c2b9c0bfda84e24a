"""Dataset-mixing stratified sampler + tf-idf keyword extraction.

Semantics tests beyond the DuckDB oracle gate (which covers
engine-parity at sf0.01 via test_oracle_parity):
- stratified_sample: rates respected within hash tolerance, zero
  rows for rate 0, ALL rows for rate 1, rerun-stable, disjoint salt
  from split_assign, stratum column correct.
- tfidf_top_terms: hand-checked scores on a toy corpus, rank
  determinism, k bound, empty/NULL text yields no terms.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_spark.datapipe.textstats import stratified_sample, tfidf_top_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i % 7} common common word{i % 3}",
         ["en", "de"][i % 2], f"s{i % 3}")
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_stratified_rates(spark, docs):
    out = stratified_sample(
        docs, ("lang", "source"),
        rates={"en|s0": 1.0, "de|s1": 0.0},
        default_rate=0.5,
    )
    kept = {r["stratum"]: 0 for r in out.select("stratum").distinct().collect()}
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["stratum"]: r["n"] for r in
              docs.withColumn("stratum", F.concat_ws("|", "lang", "source"))
                  .groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    # rate 1.0: every row kept
    assert counts["en|s0"] == totals["en|s0"]
    # rate 0.0: stratum absent entirely
    assert "de|s1" not in counts and "de|s1" not in kept
    # default 0.5: within hash tolerance of half (binomial-ish bound)
    for s in totals:
        if s in ("en|s0", "de|s1"):
            continue
        frac = counts.get(s, 0) / totals[s]
        assert 0.35 < frac < 0.65, (s, frac)


def test_stratified_deterministic_and_split_independent(spark, docs):
    a = {r["doc_id"] for r in
         stratified_sample(docs, rates={}, default_rate=0.4).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs, rates={}, default_rate=0.4).select("doc_id").collect()}
    assert a == b  # rerun-stable
    # raising a rate only ADDS docs (nested samples: bucket < threshold)
    c = {r["doc_id"] for r in
         stratified_sample(docs, rates={}, default_rate=0.6).select("doc_id").collect()}
    assert a <= c
    # different salt => decisions decorrelated from split_assign's hash
    from vector_spark.datapipe.textstats import split_assign
    splits = split_assign(docs, fractions={"train": 0.4, "rest": 0.6})
    train = {r["doc_id"] for r in
             splits.filter(F.col("split") == "train").select("doc_id").collect()}
    overlap = len(a & train) / len(a)
    assert 0.2 < overlap < 0.6  # ~0.4 if independent; 1.0 if correlated


def test_stratified_rejects_bad_rate(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, rates={"en|s0": 1.5})


def test_tfidf_toy_scores(spark):
    toy = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(toy, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["apple", "banana"]
    assert d1[0]["score"] == pytest.approx(round(2 * math.log(3), 6))
    assert d1[0]["tf"] == 2 and d1[0]["df"] == 1
    # doc 3: cherry tf=3 df=2 -> 3*ln(1.5) ~ 1.216; date tf=1 df=1 -> ln(3) ~ 1.099
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert [r["term"] for r in d3] == ["cherry", "date"]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_tfidf_empty_and_null_text(spark):
    toy = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(toy, k=3)
    assert {r["doc_id"] for r in out.collect()} == {1}
    # n_docs counts ALL documents (4), not just non-empty ones
    row = out.filter(F.col("term") == "alpha").first()
    assert row["score"] == pytest.approx(round(math.log(4), 6))
