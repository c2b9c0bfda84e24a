"""Connected components over near-duplicate pair graphs + group dedup.

Closes the last step of the dedup story: pair emitters
(`dedup.minhash_dedup_pairs`, `dedup.simhash_near_dup_pairs`,
`dedup.ngram_jaccard_pairs`) produce EDGES; a training-data pipeline
needs GROUPS (transitive closure — A~B, B~C puts A,C in one dup
cluster even if A!~C) and then one canonical document per group.

The reference has no such operator (vector is per-event streaming;
SURVEY.md section 2.7 scopes joins/grouping out of it) — this is part
of the LLM-data-pipeline surface the brief asks for beyond reference
parity.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the same
scheme GraphFrames uses. Converges in O(log^2 n) rounds on any graph
(O(log n) in practice), each round two shuffles, and — unlike
groupBy + collect_list formulations — never materializes a node's
neighbor list, so a 10M-member near-identical dup cluster (the 100 TB
hazard: boilerplate pages) costs a wide groupBy MIN, not an OOM.

Per-round dataflow (all joins are equi-joins on the node id; AQE
handles skewed hub nodes):

  large-star: every node u computes m = min(neighbors + u) and
  re-points its LARGER neighbors at m;
  small-star: edges directed large->small; u re-points its smaller
  neighbors (and itself) at m.

Fixpoint = the edge set is a star forest: every node points at its
component minimum. Labels are compared with plain column ordering, so
string doc_ids and numeric ids both work (lexicographic min for
strings — matched by the DuckDB oracle's min(varchar)).

Lineage is truncated with localCheckpoint every round (iterative
plans otherwise double in depth per round and overwhelm Catalyst);
convergence is detected with a count + hash-sum checksum (one action
per round, no exceptAll double-join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Direct each edge large->small, drop self-loops, distinct."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("src"),
            F.least(F.col(src), F.col(dst)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v of u with v > u, m = min(N(u) + u)."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nbr_min = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        sym.join(nbr_min, "src")
        .where(F.col("dst") > F.col("src"))
        .select(
            F.col("dst").alias("src"),
            F.least(F.col("src"), F.col("mn")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Edges large->small; u re-points smaller neighbors and itself at
    m = min(N_smaller(u) + u) (= min(N_smaller(u)), since all < u)."""
    e = _canon(edges, "src", "dst")
    nbr_min = e.groupBy("src").agg(F.min("dst").alias("mn"))
    repointed = e.join(nbr_min, "src").select(
        F.col("dst").alias("src"), F.col("mn").alias("dst")
    )
    self_edge = nbr_min.select("src", F.col("mn").alias("dst"))
    return (
        repointed.unionByName(self_edge)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int, int]:
    # bit_xor, not sum: order-independent and cannot overflow under
    # ANSI mode. A single 64-bit xor CAN collide across rounds
    # (~2^-64 per round — a collision would stop iteration one round
    # early with a same-size different-edge set), so the fixpoint test
    # compares TWO independent fingerprints: xxhash64 over (src, dst)
    # and over (dst, src, const) hash DIFFERENT byte streams, so a
    # simultaneous collision in both is ~2^-128 — below any practical
    # failure mode of the job itself.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h1"),
        F.coalesce(
            F.bit_xor(F.xxhash64("dst", "src", F.lit(0x9E3779B9))), F.lit(0)
        ).alias("h2"),
    ).first()
    return int(row["n"]), int(row["h1"]), int(row["h2"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 24,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns DataFrame[id, component] covering every node that appears
    in `pairs` (isolated docs never enter the edge list — union them
    in downstream, see `dup_groups`). `component` is the minimum node
    id in the component, a deterministic, join-able group key.

    max_iter is a guard, not tuning: large/small-star needs
    O(log^2 n) rounds worst-case, so 24 covers any graph that fits in
    storage; a non-converged exit raises rather than returning a
    silently-wrong grouping.
    """
    edges = _canon(pairs, src, dst).localCheckpoint(eager=True)
    prev = _checksum(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # star forest: edges point node -> component min; roots appear only
    # on the dst side, so add them as their own member.
    members = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.unionByName(roots).distinct()


def dup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every document's dup-group id: component min for paired docs,
    itself for singletons. One left broadcast-less join; the component
    table is small relative to the corpus (only paired docs)."""
    comp = connected_components(pairs, src, dst)
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("group_id"),
        )
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: Column | None = None,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep ONE document per dup group: highest quality_col (default
    text length), ties broken by min doc id — so reruns are stable.

    Implemented as max_by over a struct, one combinable shuffle on
    group_id (map-side partial agg), not a window sort: at 100 TB a
    window over group_id would sort every group; max_by keeps a single
    running best per group per partition.
    """
    if quality_col is None:
        quality_col = F.length("text")
    # NULL quality ranks WORST, not best: Spark's ascending struct
    # ordering puts a NULL first field before every number, so an
    # un-coalesced min_by(-__q, id) would crown a NULL-quality doc the
    # group's canonical survivor (and diverge from the SQL oracle's
    # ORDER BY ... DESC NULLS LAST).
    grouped = docs.join(
        dup_groups(docs, pairs, id_col, src, dst), id_col
    ).withColumn("__q", F.coalesce(quality_col.cast("double"), F.lit(float("-inf"))))
    # max_by on (quality asc, id desc) struct: higher quality wins,
    # then LOWER id (invert id ordering via a negated rank? strings
    # can't negate — use min_by on (-quality, id)).
    best = grouped.groupBy("group_id").agg(
        F.expr(f"min_by({id_col}, struct(-__q, {id_col}))").alias("keep_id")
    )
    return (
        docs.join(
            best.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
        )
    )
