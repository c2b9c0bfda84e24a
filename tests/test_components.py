"""Connected components + group dedup vs an independent union-find.

Golden strategy per SURVEY.md section 5: the Spark implementation
(alternating large/small-star) is checked against a pure-Python
union-find on the same edges — two independent derivations of the
same closure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vector_spark.datapipe.components import (
    connected_components,
    dedup_keep_best,
    dup_groups,
)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        lab = min(members)
        for m in members:
            out[m] = lab
    return out


GRAPHS = {
    # worst case for naive propagation: a long chain (diameter = n-1);
    # large/small-star must still converge inside the iteration guard
    "chain": [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(40)],
    "star": [("d000", f"d{i:03d}") for i in range(1, 30)],
    "two_cliques_bridge": (
        [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
        + [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
        + [("a4", "b0")]
    ),
    "disjoint_pairs": [(f"x{i}", f"y{i}") for i in range(20)],
    "dup_edges_and_loops": [("p", "q"), ("q", "p"), ("p", "p"), ("q", "r")],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_components_match_union_find(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = union_find(edges)
    # union-find keeps self-loop-only nodes; components drops pure
    # self-loops before iterating — normalize.
    want = {k: v for k, v in want.items() if any(a != b and k in (a, b) for a, b in edges)}
    assert got == want


def test_dup_groups_covers_singletons(spark):
    docs = spark.createDataFrame(
        [("d1", "x"), ("d2", "x"), ("d3", "y"), ("d4", "z")],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame([("d1", "d2")], "id_a string, id_b string")
    got = {r["doc_id"]: r["group_id"] for r in dup_groups(docs, pairs).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d3", "d4": "d4"}


def test_dedup_keep_best_quality_then_id(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "short"),
            ("d2", "the longest text wins"),
            ("d3", "the longest text ties"),  # same length as d2 -> d2 by id
            ("d4", "singleton kept"),
        ],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3")], "id_a string, id_b string"
    )
    kept = sorted(r["doc_id"] for r in dedup_keep_best(docs, pairs).collect())
    assert kept == ["d2", "d4"]


def test_dedup_keep_best_null_quality_ranks_worst(spark):
    # A NULL quality must never be crowned the survivor (Spark's
    # struct ordering would otherwise sort NULL before every number).
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("d1", None), ("d2", 5.0), ("d3", 3.0)],
        "doc_id string, score double",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3")], "id_a string, id_b string"
    )
    kept = [
        r["doc_id"]
        for r in dedup_keep_best(docs, pairs, quality_col=F.col("score")).collect()
    ]
    assert kept == ["d2"]
    # all-NULL group: falls back to min id, still exactly one survivor
    docs2 = spark.createDataFrame(
        [("d1", None), ("d2", None)], "doc_id string, score double"
    )
    pairs2 = spark.createDataFrame([("d1", "d2")], "id_a string, id_b string")
    kept2 = [
        r["doc_id"]
        for r in dedup_keep_best(docs2, pairs2, quality_col=F.col("score")).collect()
    ]
    assert kept2 == ["d1"]


def test_transitive_closure_beyond_direct_pairs(spark):
    # a~b and b~c but never a~c: one group of three
    docs = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "doc_id string, text string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    groups = dup_groups(docs, pairs)
    assert groups.where(F.col("group_id") == "a").count() == 3
