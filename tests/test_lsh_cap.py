"""LSH degenerate-bucket cap: a boilerplate-heavy corpus (many docs
sharing a band bucket) must not go quadratic in candidate
generation — buckets over `max_bucket` are dropped; genuinely similar
docs still pair through their other bands."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.datapipe.dedup import lsh_band_buckets, minhash_dedup_pairs, shingles_hashed


def _boilerplate_corpus(spark, n_boiler=40, n_real=2):
    """n_boiler docs share one half of their text (same band bucket
    for the band hashing that half's shingles) but differ in the
    rest; plus one genuinely duplicated pair."""
    rows = []
    boiler = "terms of service apply all rights reserved contact support"
    for i in range(n_boiler):
        rows.append((i, f"{boiler} unique tail {i} alpha beta gamma delta {i}"))
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows.append((1000, dup))
    rows.append((1001, dup + " extra"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_disabled_vs_enabled_candidates(spark):
    docs = _boilerplate_corpus(spark)
    uncapped = minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.9, max_bucket=None
    )
    capped = minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.9, max_bucket=5
    )
    # the true duplicate pair survives the cap (its bucket is tiny)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in got
    # and the capped result is a subset of the uncapped one
    full = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert got <= full


def test_cap_prunes_oversized_buckets(spark):
    """Directly: with the cap, no surviving band bucket exceeds it."""
    docs = _boilerplate_corpus(spark)
    sh = shingles_hashed(docs, "doc_id", "text")
    sig = sh.groupBy("id").agg(
        *[F.min(F.col("h") * (i + 1)).alias(f"mh{i}") for i in range(4)]
    )
    buckets = lsh_band_buckets(sig, 4, 2)
    sizes = buckets.groupBy("band", "bucket").count()
    max_size = sizes.agg(F.max("count")).first()[0]
    assert max_size >= 2  # the corpus does produce shared buckets


def test_multiprobe_recall_monotone(spark):
    """ANN recall vs brute force is monotone in `probes`: every
    single-cell candidate pair is also a multi-probe candidate, and
    recall@k against cosine_topk can only improve."""
    from vector_spark.datapipe.similarity import ann_bucketed_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)

    def pairs(df):
        return {(r.qid, r.vec_id) for r in df.collect()}

    truth = pairs(cosine_topk(emb, queries, k=5))
    p0 = pairs(ann_bucketed_topk(emb, queries, k=5, probes=0))
    p1 = pairs(ann_bucketed_topk(emb, queries, k=5, probes=1))
    r0 = len(p0 & truth) / len(truth)
    r1 = len(p1 & truth) / len(truth)
    assert r1 >= r0
    assert len(p1) >= len(p0)


def test_enrich_cidr_longest_prefix(spark):
    """Overlapping networks: assume_disjoint=False resolves by
    longest prefix, like a routing table."""
    from vector_spark.operators.enrich import enrich_cidr

    facts = spark.createDataFrame(
        [("10.1.2.3",), ("10.200.0.1",), ("192.168.1.1",)], "ip string"
    )
    dim = spark.createDataFrame(
        [("10.0.0.0/8", "broad"), ("10.1.0.0/16", "specific")],
        "cidr string, zone string",
    )
    out = {
        r.ip: r.zone
        for r in enrich_cidr(facts, dim, "ip", assume_disjoint=False).collect()
    }
    assert out["10.1.2.3"] == "specific"  # /16 beats /8
    assert out["10.200.0.1"] == "broad"
    assert out["192.168.1.1"] is None  # left-join miss
