"""Replicates the driver's correctness gate locally: for every query
with an oracle, run the Spark callable AND the DuckDB SQL on the same
scale dir, then compare row count + column names + order-insensitive
values (columns sorted by name, rows sorted by everything).

Run at sf0.001 in CI (fast); set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01
to mirror the driver exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
        # decimals (duckdb round() returns Decimal sometimes)
        elif pdf[c].dtype == object and len(pdf) and isinstance(pdf[c].dropna().iloc[0] if pdf[c].notna().any() else None, float):
            pdf[c] = pdf[c].astype(float).round(9)
    pdf = pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)
    return pdf


def to_comparable(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime"):
            out[c] = out[c].astype("datetime64[us]")
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: float(v) if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, bool)) else v)
    return out


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(spark, ddb, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    sql = oracles[name]
    # transcripts-based oracles embed the absolute path of the
    # materialized sf0.01 single file (the driver's contract runs
    # oracles at sf0.01 only); when this suite runs at another sf,
    # point them at the sf-matched materialization instead
    from vector_spark.queries import ORACLE_TRANSCRIPTS
    from vector_spark.sources.synth import ensure_transcripts_file

    if ORACLE_TRANSCRIPTS in sql:
        sql = sql.replace(ORACLE_TRANSCRIPTS, ensure_transcripts_file(SF_DIR))
    want = ddb.execute(sql).df()
    got_n, want_n = normalize(to_comparable(got)), normalize(to_comparable(want))
    assert list(got_n.columns) == list(want_n.columns), (
        f"{name}: columns {list(got_n.columns)} != {list(want_n.columns)}"
    )
    assert len(got_n) == len(want_n), f"{name}: rows {len(got_n)} != {len(want_n)}"
    pd.testing.assert_frame_equal(got_n, want_n, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
