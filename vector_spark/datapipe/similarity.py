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
    from vector_spark.datapipe.dedup import cap_buckets

    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if bucket_join:
        v = cap_buckets(
            v.withColumn("bucket", quantize_bucket(F.col("vec"))),
            ["bucket"],
            max_bucket,
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
    from vector_spark.datapipe.dedup import cap_buckets

    v = cap_buckets(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            quantize_bucket(F.col(vec_col)).alias("bucket"),
        ),
        ["bucket"],
        max_bucket,
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
# pyspark.ml KMeans in production — the plan shape is unchanged.
#
# Scale design: centroids are K tiny rows, so they are COLLECTED and
# re-entered as literal expressions — cluster assignment is then a
# pure projection (array_max over K struct sims, whole-stage codegen,
# ZERO shuffle on the vector table), the probe expansion lives on the
# query side only, and the search join broadcasts the queries. The
# only index-build shuffle is the (cluster, pos) element-wise-mean
# aggregation, whose map-side partial reduces each partition to at
# most K x dims rows before the exchange.
# ---------------------------------------------------------------------------


Centroids = list[tuple[int, list[float]]]


def _centroid_array(centroids: Centroids) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(int(c)).cast("long").alias("cluster"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
            )
            for c, vec in centroids
        ]
    )


def _ranked_sims(vec: Column, centroids: Centroids) -> Column:
    """array<struct<sim, negc, cluster>> — struct-comparison order is
    (sim, -cluster), so max/sort give highest similarity with ties to
    the LOWEST cluster id (cross-engine determinism)."""
    return F.transform(
        _centroid_array(centroids),
        lambda c: F.struct(
            F.round(cosine(vec, c["cvec"]), 6).alias("sim"),
            (-c["cluster"]).alias("negc"),
            c["cluster"].alias("cluster"),
        ),
    )


def nearest_cluster(vec: Column, centroids: Centroids) -> Column:
    """argmin assignment as ONE projection — no cross join, no window,
    no shuffle."""
    return F.array_max(_ranked_sims(vec, centroids))["cluster"]


def probe_clusters(vec: Column, centroids: Centroids, probes: int) -> Column:
    """The query's `probes` nearest cluster ids (query-side only)."""
    return F.transform(
        F.slice(F.sort_array(_ranked_sims(vec, centroids), asc=False), 1, probes),
        lambda s: s["cluster"],
    )


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Centroids:
    """Train the coarse quantizer: the `n_centroids` lowest-id vectors
    seed one Lloyd step (projection-only assignment, element-wise
    means rounded to 6 dp so both engines agree bit-for-bit). Returns
    the K centroids as plain Python data — they are the INDEX, tiny by
    construction, and re-enter every later plan as literals."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # genuinely the n lowest ids (TakeOrderedAndProject), not id < n —
    # id spaces need not start at 0
    seed_rows = v.orderBy("id").limit(n_centroids).collect()
    seeds: Centroids = [(int(r["id"]), list(r["vec"])) for r in seed_rows]
    if len(seeds) < n_centroids:
        raise ValueError(
            f"need >= {n_centroids} vectors to seed IVF, got {len(seeds)}"
        )
    comps = (
        v.withColumn("cluster", nearest_cluster(F.col("vec"), seeds))
        .select("cluster", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in comps:
        by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["m"])
    return [
        (c, [d[p] for p in sorted(d)]) for c, d in sorted(by_cluster.items())
    ]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    probes: int = 2,
    centroids: Centroids | None = None,
) -> DataFrame:
    """IVF-Flat search: vectors live in ONE cluster each (their
    nearest centroid — the inverted file); each query probes its
    `probes` nearest clusters; candidates meet in a broadcast join on
    cluster. The big table takes ONE scan, zero shuffles before the
    per-query top-k (which moves candidate rows only). probes ==
    n_centroids degenerates to exact brute force (recall 1.0 —
    asserted in tests); smaller probes trade recall for candidate
    count, monotonically. Pass a prebuilt `centroids` index to skip
    training (the production path: train once, search many)."""
    cent = centroids if centroids is not None else ivf_centroids(
        vectors, n_centroids, id_col, vec_col
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("cluster", nearest_cluster(F.col("vec"), cent))
    q = (
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).cast("array<double>").alias("qvec"),
        )
        .withColumn("cluster", F.explode(probe_clusters(F.col("qvec"), cent, probes)))
    )
    # no dedup needed: each vector lives in exactly ONE cluster and a
    # query's probe list is distinct, so (qid, vec_id) matches at most
    # once — a defensive dropDuplicates here would cost a full
    # exchange of the candidate set for nothing
    scored = (
        v.join(F.broadcast(q), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("vec")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "sim")
    )


def semantic_dedup_keep(
    docs: DataFrame,
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    quality_col: Column | None = None,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): documents whose EMBEDDINGS are near-identical
    count as duplicates even when their text differs (paraphrases,
    boilerplate rewrites, translations back-translated) — the dedup
    the text-hash family (exact/minhash/simhash) cannot see. Keeps
    one document per semantic group; returns the kept docs rows
    (left_semi, same contract as ``components.dedup_keep_best``).

    Composition of the certified scale paths, no new kernel:

      1. candidate pairs = ``cosine_near_dup_pairs`` (quantization-
         bucket equi-join — SemDeDup's k-means-cluster-then-compare
         shape with the coarse quantizer standing in for k-means; no
         cross join, degenerate cells capped at ``max_bucket``),
      2. groups = ``connected_components`` (large/small-star) over
         the pair set — SemDeDup keeps one per epsilon-ball; the
         transitive closure makes that rerun-stable when balls chain,
      3. keep = ``dedup_keep_best``: highest ``quality_col`` (default
         text length), ties to min id.

    100 TB shape: pair generation is the bucket equi-join (largest
    data movement: one exchange of (id, vec, bucket)); components run
    O(log n) rounds over the PAIR set only (near-dup pairs, orders of
    magnitude smaller than the corpus); the final keep is one
    combinable min_by shuffle plus a left_semi join back to docs.
    """
    from vector_spark.datapipe.components import dedup_keep_best

    pairs = cosine_near_dup_pairs(
        vectors, vec_id_col, vec_col, threshold, max_bucket=max_bucket
    ).select("id_a", "id_b")
    return dedup_keep_best(docs, pairs, id_col=id_col, quality_col=quality_col)
