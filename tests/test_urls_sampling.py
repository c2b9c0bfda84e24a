"""URL canonicalization/dedup + exact fixed-N per-stratum sampling
(round 5). Values are also oracle-checked end-to-end by
test_oracle_parity (dp_url_dedup, dp_sample_n); these pin the edge
cases and the 100 TB plan properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.datapipe.textstats import sample_n_per_stratum
from vector_spark.datapipe.urls import canonicalize_url, url_dedup_keys


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]


def test_canonicalize_url_cases(spark):
    cases = {
        # scheme + www + default port + trailing slash + fragment
        "http://www.Example.COM:80/a/b/": "example.com/a/b",
        "https://Example.com:443/a/b#frag": "example.com/a/b",
        "https://example.com/a/b": "example.com/a/b",
        # schemeless, default :80 stripped (http assumed)
        "example.com:80/a/b": "example.com/a/b",
        # NON-default port survives
        "http://example.com:8080/a": "example.com:8080/a",
        # :443 is only default for https
        "http://example.com:443/a": "example.com:443/a",
        # root path collapses to bare host
        "https://example.com/": "example.com",
        "https://example.com": "example.com",
        # query: sort, drop empties and utm_* params
        "http://h.io/p?b=2&a=1": "h.io/p?a=1&b=2",
        "http://h.io/p?utm_source=x&b=2&&a=1": "h.io/p?a=1&b=2",
        "http://h.io/p?utm_only=1": "h.io/p",
        "http://h.io/p?": "h.io/p",
        # path case is PRESERVED (only host lowers)
        "http://H.io/CaseSensitive": "h.io/CaseSensitive",
        # whitespace trim; fragment with query
        "  http://h.io/p?a=1#sec  ": "h.io/p?a=1",
        # www only strips as a label prefix
        "http://wwwx.io/p": "wwwx.io/p",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values()), dict(zip(cases, got))


def test_url_dedup_keys(spark):
    df = spark.createDataFrame(
        [
            (1, "http://www.site.io/x/"),
            (2, "https://site.io/x"),
            (3, "site.io/x?utm_c=1"),
            (4, "https://site.io/y?b=2&a=1"),
            (5, "site.io/y?a=1&b=2"),
        ],
        "doc_id bigint, url string",
    )
    rows = {
        r["canon_url"]: (r["keep_id"], r["n_dups"])
        for r in url_dedup_keys(df, "doc_id", "url").collect()
    }
    assert rows == {"site.io/x": (1, 3), "site.io/y?a=1&b=2": (4, 2)}


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.elt(F.pmod(F.col("id"), F.lit(3)) + 1, F.lit("en"), F.lit("de"), F.lit("fr")).alias("lang"),
    )


def test_sample_n_per_stratum_exact_counts_and_determinism(spark):
    docs = _docs(spark)
    out = sample_n_per_stratum(docs, ("lang",), n=10)
    counts = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 10, "de": 10, "fr": 10}
    # rn is a 1..n permutation per stratum and the pick is stable
    a = sorted((r["stratum"], r["rn"], r["doc_id"]) for r in out.collect())
    b = sorted((r["stratum"], r["rn"], r["doc_id"]) for r in sample_n_per_stratum(docs, ("lang",), n=10).collect())
    assert a == b
    assert [t[1] for t in a if t[0] == "en"] == list(range(1, 11))


def test_sample_n_nested_prefix(spark):
    # n=5 must be EXACTLY the first five of n=10 (quota growth never
    # reshuffles an already-published eval set)
    docs = _docs(spark)
    small = {(r["stratum"], r["doc_id"]) for r in sample_n_per_stratum(docs, ("lang",), n=5).collect()}
    big = {(r["stratum"], r["doc_id"]) for r in sample_n_per_stratum(docs, ("lang",), n=10).filter(F.col("rn") <= 5).collect()}
    assert small == big


def test_sample_n_small_stratum_keeps_all(spark):
    docs = _docs(spark, n=9)  # 3 docs per lang < n
    out = sample_n_per_stratum(docs, ("lang",), n=10)
    assert out.count() == 9


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_sample_n_plan_window_group_limit(spark):
    # the rank<=N predicate must push into WindowGroupLimit
    # (partial+final) so map tasks forward at most N rows per stratum
    plan = _executed(sample_n_per_stratum(_docs(spark), ("lang",), n=10))
    assert "WindowGroupLimit" in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_url_dedup_plan_single_exchange_no_python(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h"), F.pmod(F.col("id"), F.lit(7)), F.lit(".io/p?b=2&a=1")).alias("url"),
    )
    plan = _executed(url_dedup_keys(df, "doc_id", "url"))
    # AQE toString prints the final AND the initial plan — count the
    # exchange in the final section only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_canonicalize_cross_engine_grid(spark):
    """Exhaustive component-grid parity: every combination of scheme x
    www-prefix x host x port x path x query x fragment through BOTH
    derivations — Spark `canonicalize_url` and the DuckDB CTE chain
    (`canonical_cte_chain_sql`) — must agree byte-for-byte. This is
    the drift alarm for the two-implementations-in-one-module design:
    any future edit to one recipe that misses the other fails here,
    not just on whatever URLs the oracle corpus happens to contain."""
    import itertools

    import duckdb

    from vector_spark.datapipe.urls import canonical_cte_chain_sql

    grid = itertools.product(
        ["", "http://", "https://"],
        ["", "www.", "WWW."],
        ["Example.COM", "h.io"],
        ["", ":80", ":443", ":8080"],
        ["", "/", "/a/b", "/a/b/", "/A//"],
        ["", "?", "?b=2&a=1", "?utm_s=1&a=1&&", "?utm_only=1"],
        ["", "#frag"],
    )
    urls = ["".join(parts) for parts in grid]
    rows = list(enumerate(urls))

    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {
        r.doc_id: r.canon
        for r in df.select(
            "doc_id", canonicalize_url(F.col("url")).alias("canon")
        ).collect()
    }

    values = ", ".join(f"({i}, '{u}')" for i, u in rows)
    sql = (
        f"WITH u AS (SELECT * FROM (VALUES {values}) AS t(doc_id, url)),"
        + canonical_cte_chain_sql(src="u", keep="doc_id")
        + " SELECT doc_id, canon_url FROM _canon"
    )
    want = dict(duckdb.sql(sql).fetchall())

    diffs = {
        urls[i]: (got[i], want[i]) for i in range(len(urls)) if got[i] != want[i]
    }
    assert not diffs, f"{len(diffs)} divergent URLs, first: {list(diffs.items())[:5]}"
