"""URL canonicalization + URL-level dedup — the web-corpus intake
step that runs BEFORE text dedup: a crawl frontier or WARC listing
carries the same page under many spellings (scheme, www, default
port, trailing slash, fragment, tracker params, query order), and
collapsing those is a pure projection, so it belongs at scan speed
ahead of any content hashing.

Canonical recipe (the common subset of the public conventions used by
crawl pipelines — RFC 3986 §6 normalization plus the de-facto
tracker-param strip):

  * scheme dropped from the canonical key (http/https treated equal)
  * host lowercased, leading ``www.`` stripped, default port
    (``:80`` for http/schemeless, ``:443`` for https) stripped
  * path: trailing slashes stripped (``/a/`` == ``/a``; root ``/``
    collapses to the bare host)
  * fragment dropped
  * query: params split on ``&``, empties and ``utm_*`` tracker
    params dropped, remainder sorted, re-joined

Every step is a native JVM expression (regexp over character classes
only — no lookarounds — so the same pattern means the same thing to
Java regex and RE2/DuckDB, which the oracle exploits by
re-implementing the whole recipe independently in SQL).

100 TB design: canonicalization is a zero-shuffle projection;
`url_dedup_keys` is one hash-groupBy on the canonical key with
map-side partial aggregation (same shape as
``dedup.exact_dedup_keys``) — the canonical-key groupBy is the ONLY
exchange, and its payload is (key, id, 1), not the document text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL-ish string column (see module doc).

    Returns host[+path][?query] with no scheme; malformed inputs
    degrade gracefully (the regexes are total: worst case the whole
    trimmed string is treated as a host)."""
    u = F.trim(url)
    scheme = (
        F.when(F.startswith(u, F.lit("https://")), F.lit("https"))
        .when(F.startswith(u, F.lit("http://")), F.lit("http"))
        .otherwise(F.lit(""))
    )
    rest = F.regexp_replace(u, r"^https?://", "")
    # fragment off first: everything up to the first '#'
    nofrag = F.regexp_extract(rest, r"^([^#]*)", 1)
    hostport = F.regexp_extract(nofrag, r"^([^/?]*)", 1)
    after_host = F.substring(nofrag, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.regexp_extract(after_host, r"^([^?]*)", 1)
    has_q = F.length(after_host) > F.length(path)
    rawq = F.substring(after_host, F.length(path) + 2, F.lit(1 << 30))

    host = F.lower(hostport)
    host = F.regexp_replace(host, r"^www\.", "")
    default_port = F.when(scheme == "https", F.lit(":443")).otherwise(F.lit(":80"))
    host = F.when(
        F.endswith(host, default_port),
        F.substring(host, F.lit(1), F.length(host) - F.length(default_port)),
    ).otherwise(host)

    path = F.regexp_replace(path, r"/+$", "")

    params = F.filter(
        F.split(rawq, "&"),
        lambda x: (x != "") & (F.substring(x, 1, 4) != "utm_"),
    )
    q = F.array_join(F.array_sort(params), "&")
    qpart = F.when(has_q & (q != ""), F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    return F.concat(host, path, qpart)


def url_dedup_keys(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """One row per canonical URL: (canon_url, keep_id = min id,
    n_dups). Single combinable shuffle on the canonical key."""
    return (
        df.select(canonicalize_url(F.col(url_col)).alias("canon_url"), F.col(id_col))
        .groupBy("canon_url")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# The same recipe as ANSI SQL (DuckDB) — kept NEXT TO the Spark
# implementation so the two cannot drift apart silently. Returns a
# staged CTE chain over a source relation `src(keep_cols..., url)`;
# embed as  WITH u AS (<synthesize url>), {canonical_cte_chain_sql()}
# SELECT ... FROM _canon. The final stage exposes keep_cols plus
# `canon_url`.
def canonical_cte_chain_sql(src: str = "u", keep: str = "doc_id") -> str:
    return f"""
    _p AS (SELECT {keep},
        CASE WHEN starts_with(trim(url), 'https://') THEN 'https'
             WHEN starts_with(trim(url), 'http://')  THEN 'http'
             ELSE '' END AS scheme,
        regexp_extract(regexp_replace(trim(url), '^https?://', ''),
                       '^([^#]*)', 1) AS nofrag
        FROM {src}),
    _h AS (SELECT {keep}, scheme, nofrag,
        regexp_extract(nofrag, '^([^/?]*)', 1) AS hostport FROM _p),
    _s AS (SELECT {keep}, scheme, hostport,
        substr(nofrag, length(hostport) + 1) AS after_host FROM _h),
    _t AS (SELECT {keep}, scheme, hostport, after_host,
        regexp_extract(after_host, '^([^?]*)', 1) AS rawpath FROM _s),
    _canon AS (SELECT {keep},
        CASE WHEN ends_with(lower(hostport),
                            CASE WHEN scheme = 'https' THEN ':443' ELSE ':80' END)
             THEN regexp_replace(regexp_replace(lower(hostport), ':[0-9]+$', ''),
                                 '^www\\.', '')
             ELSE regexp_replace(lower(hostport), '^www\\.', '')
        END
        || regexp_replace(rawpath, '/+$', '')
        || CASE WHEN length(after_host) > length(rawpath)
                 AND array_to_string(list_sort(list_filter(
                      string_split(substr(after_host, length(rawpath) + 2), '&'),
                      x -> x <> '' AND substr(x, 1, 4) <> 'utm_')), '&') <> ''
           THEN '?' || array_to_string(list_sort(list_filter(
                      string_split(substr(after_host, length(rawpath) + 2), '&'),
                      x -> x <> '' AND substr(x, 1, 4) <> 'utm_')), '&')
           ELSE '' END AS canon_url
        FROM _t)"""
