"""Embedding similarity search (ANN) over array<float> columns.

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) query set, compute dot products with JVM higher-order
functions (zip_with + aggregate — stays in codegen, no Python), rank
per query. The scale path prunes with a coarse quantization bucket
(IVF-style): candidates are limited to vectors sharing the query's
bucket, turning the cross join into an equi-join on bucket — the
standard inverted-file trade (recall vs cost) with the probe count as
the knob.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force exact top-k: (qid, vec_id, rank, sim). Queries are
    broadcast (small by construction); similarity + rank run JVM-side."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("vec")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "sim")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    bucket_join: bool = True,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """All pairs (a<b) with cosine >= threshold. The DEFAULT is the
    bucketed scale path: comparison restricted to vectors sharing a
    quantization bucket — O(n^2) -> O(sum bucket^2), an equi-join on
    bucket instead of a cross join (recall < 1 by design: near-dups
    straddling a bucket boundary are missed; the knob is
    quantize_bucket's dims/scale). bucket_join=False is the exact
    quadratic ground-truth path for small scale / oracle use.

    `max_bucket` caps the degenerate-cell blowup (same mitigation as
    minhash_dedup_pairs): a quantization cell holding B vectors —
    e.g. near-zero embeddings all landing in one cell after
    truncation/padding — makes B^2/2 candidate pairs; cells larger
    than the cap are dropped from pairing (such a cell carries
    near-zero information per pair). None disables. The DuckDB oracle
    (queries.SQL_DP_COSINE_NEAR_DUP_BUCKETED) mirrors the cap so
    engine/oracle stay byte-identical when a cell overflows."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if bucket_join:
        v = v.withColumn("bucket", quantize_bucket(F.col("vec")))
        if max_bucket is not None:
            bw = Window.partitionBy("bucket")
            v = (
                v.withColumn("__bsz", F.count(F.lit(1)).over(bw))
                .filter(F.col("__bsz") <= max_bucket)
                .drop("__bsz")
            )
        a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
        b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def quantize_bucket(vec: Column, dims: int = 4, scale: float = 5.0) -> Column:
    """IVF-style coarse bucket: sign+magnitude quantization of the
    first `dims` components -> string key. Deterministic, SQL-portable."""
    parts = [
        F.floor(F.element_at(vec, i + 1).cast("double") * scale).cast("string")
        for i in range(dims)
    ]
    return F.concat_ws("_", *parts)


def _probe_buckets(vec: Column, probes: int, dims: int = 4, scale: float = 5.0) -> Column:
    """Array of probe bucket keys: the query's cell plus every
    neighbor within +-probes steps per dimension ((2p+1)^dims keys —
    QUERY-side only, the broadcast stays tiny). probes=0 is the
    single-cell key."""
    from itertools import product

    qs = [
        F.floor(F.element_at(vec, i + 1).cast("double") * scale).cast("bigint")
        for i in range(dims)
    ]
    offsets = range(-probes, probes + 1)
    keys = [
        F.concat_ws("_", *[(qs[d] + off[d]).cast("string") for d in range(dims)])
        for off in product(offsets, repeat=dims)
    ]
    return F.array(*keys)


def ann_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    probes: int = 0,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probe
    buckets (equi-join on bucket — shuffles by bucket, no cross
    join). `probes` is the IVF-style recall knob: 0 searches only the
    query's own quantization cell; p expands the QUERY side to all
    neighbor cells within +-p grid steps per dimension before the
    join (the vector side is never expanded, so the big table's scan
    and shuffle are unchanged). Returns (qid, vec_id, rank, sim);
    recall < 1 by design, monotone in `probes`. `max_bucket` drops
    degenerate quantization cells from the VECTOR side (same cap as
    cosine_near_dup_pairs) so one overloaded cell can't absorb every
    probe; None disables."""
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        quantize_bucket(F.col(vec_col)).alias("bucket"),
    )
    if max_bucket is not None:
        bw = Window.partitionBy("bucket")
        v = (
            v.withColumn("__bsz", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(_probe_buckets(F.col(vec_col), probes)).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("vec")), 6))
        # a candidate can surface via several probe cells: dedupe pairs
        .dropDuplicates(["qid", "vec_id"])
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "sim")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN with trained coarse centroids — the classic
# production path (FAISS IVF-Flat shape). Training here is ONE Lloyd
# iteration from deterministic seeds so the whole index build is
# RNG-free and SQL-replicable (the driver's DuckDB oracle verifies
# centroids, assignment AND search); swap in more iterations or
# pyspark.ml KMeans in production — the plan shape (broadcast
# centroids, argmin assignment, posexplode means, cluster equi-join)
# is unchanged.
# ---------------------------------------------------------------------------


def assign_nearest(
    v: DataFrame,
    centroids: DataFrame,
    probes: int = 1,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Rank clusters per vector by cosine to the (broadcast, small)
    centroid table; keep the nearest `probes` clusters. Sims rounded
    to 6 dp before ranking (cross-engine determinism), ties broken by
    cluster id."""
    scored = v.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", F.round(cosine(F.col(vec_col), F.col("cvec")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cluster"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= probes)
        .drop("__sim", "__rn", "cvec")
    )


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, cvec): the `n_centroids` lowest-id vectors as seeds,
    refined by one Lloyd step — assign every vector to its nearest
    seed, recompute element-wise means (rounded to 6 dp so both
    engines agree bit-for-bit). One broadcast + one shuffle
    (cluster,pos aggregation) regardless of input size."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    seeds = v.filter(F.col("id") < n_centroids).select(
        F.col("id").alias("cluster"), F.col("vec").alias("cvec")
    )
    members = assign_nearest(v, seeds, probes=1)
    comps = (
        members.select("cluster", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
    )
    return comps.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    probes: int = 2,
) -> DataFrame:
    """IVF-Flat search: vectors live in ONE cluster each (their
    nearest refined centroid — the inverted file); each query probes
    its `probes` nearest clusters; candidates meet in a cluster
    equi-join (shuffle on cluster id, queries broadcast — the big
    table never expands). probes == n_centroids degenerates to exact
    brute force (recall 1.0 — asserted in tests); smaller probes
    trade recall for candidate count, monotonically."""
    cent = ivf_centroids(vectors, n_centroids, id_col, vec_col)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    vassign = assign_nearest(
        v.withColumnRenamed("vec_id", "id"), cent, probes=1
    ).withColumnRenamed("id", "vec_id")
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    qassign = assign_nearest(
        q.withColumnRenamed("qid", "id").withColumnRenamed("qvec", "vec"),
        cent,
        probes=probes,
    ).select(F.col("id").alias("qid"), F.col("vec").alias("qvec"), "cluster")
    scored = (
        vassign.join(F.broadcast(qassign), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("vec")), 6))
        .dropDuplicates(["qid", "vec_id"])
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "sim")
    )
