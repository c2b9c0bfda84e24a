"""Codecs (§2.6), sinks (§2.4), lua-analogue escape hatch, and VRL
compat helpers."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark.functions import vrl_compat as V
from vector_spark.operators.udf import map_batches, map_groups
from vector_spark.plans.metrics import StageMetrics
from vector_spark.sinks import blackhole, with_partition_keys, write_partitioned
from vector_spark.sources.codecs import (
    decode_syslog_line,
    encode_json,
    encode_kv_map,
    encode_logfmt,
    read_ndjson,
)


def test_ndjson_roundtrip(spark, tmp_path):
    p = str(tmp_path / "in.ndjson")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\nnot json\n')
    df = read_ndjson(spark, p, "a int, b string")
    rows = df.collect()
    assert len(rows) == 3
    ok = [r for r in rows if r.event is not None and r.event.a is not None]
    bad = [r for r in rows if r.event is None or r.event.a is None]
    assert len(ok) == 2 and len(bad) == 1
    assert bad[0].raw == "not json"


def test_syslog_decode(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[2842]: 'su root' failed"
    df = spark.createDataFrame([(line,)], "raw string").select(
        decode_syslog_line(F.col("raw")).alias("s")
    )
    s = df.collect()[0].s
    assert s.pri == 34 and s.facility == 4 and s.severity == 2
    assert s.host == "mymachine" and s.appname == "su" and s.procid == "2842"
    assert s.message == "'su root' failed"


def test_encoders(spark):
    df = spark.createDataFrame([(1, "x", None)], "a int, b string, c string")
    row = df.select(
        encode_json(["a", "b"]).alias("j"),
        encode_logfmt(["a", "b", "c"]).alias("lf"),
        encode_kv_map(F.create_map(F.lit("k2"), F.lit("v2"), F.lit("k1"), F.lit("v1"))).alias("kv"),
    ).collect()[0]
    assert row.j == '{"a":1,"b":"x"}'
    assert row.lf == "a=1 b=x"  # null c skipped
    assert row.kv == "k1=v1 k2=v2"  # sorted deterministic


def test_partitioned_sink_layout(spark, tmp_path):
    import numpy as np

    from vector_spark.sources.synth import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

    df = spark.createDataFrame(gen_transcripts_pdf(np.arange(10)), TRANSCRIPT_SCHEMA)
    out = str(tmp_path / "table")
    write_partitioned(with_partition_keys(df), out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition pruning works on the rendered keys
    pruned = back.filter((F.col("p_day") == "2024-01-01") & (F.col("p_bucket") == 3))
    plan = pruned.explain(True)  # noqa: F841  (smoke: no error)
    assert pruned.count() >= 0
    # layout on disk: day/bucket directories
    import os

    days = [d for d in os.listdir(out) if d.startswith("p_day=")]
    assert days, "expected p_day= partition dirs"


def test_blackhole_metrics(spark):
    m = StageMetrics()
    n = blackhole(spark.range(100), metrics=m)
    assert n == 100
    assert m.collect()["blackhole"]["rows"] == 100


def test_map_batches_expand(spark):
    df = spark.range(5)

    def dup(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([pdf, pdf], ignore_index=True)

    out = map_batches(df, dup, "id long")
    assert out.count() == 10


def test_map_groups_stateful(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v long"
    )

    def cumsum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("v")
        pdf["cum"] = pdf["v"].cumsum()
        return pdf

    out = map_groups(df, ["k"], cumsum, "k string, v long, cum long").toPandas()
    assert out.set_index(["k", "v"])["cum"].to_dict() == {("a", 1): 1, ("a", 2): 3, ("b", 5): 5}


@pytest.mark.parametrize(
    "expr,expected",
    [
        (lambda: V.parse_duration(F.lit("250ms"), "s"), 0.25),
        (lambda: V.parse_duration(F.lit("3m"), "s"), 180.0),
        (lambda: V.parse_int(F.lit("0x1f")), 31),
        (lambda: V.parse_int(F.lit("42")), 42),
        (lambda: V.truncate(F.lit("abcdef"), 3), "abc..."),
        (lambda: V.truncate(F.lit("ab"), 3), "ab"),
        (lambda: V.redact(F.lit("card 1234-5678"), [r"\d{4}-\d{4}"]), "card [REDACTED]"),
        (lambda: V.snakecase(F.lit("MyCool-Name x")), "my_cool_name_x"),
        (lambda: V.encode_base64(F.lit("hi")), "aGk="),
        (lambda: V.decode_base64(F.lit("aGk=")), "hi"),
        (lambda: V.is_nullish(F.lit("  ")), True),
        (lambda: V.is_nullish(F.lit("x")), False),
        (lambda: V.to_syslog_level(F.lit(3)), "err"),
        (lambda: V.to_syslog_severity(F.lit("WARNING")), 4),
    ],
)
def test_vrl_compat(spark, expr, expected):
    got = spark.range(1).select(expr().alias("v")).collect()[0].v
    assert got == expected


def test_parse_url(spark):
    u = spark.range(1).select(
        V.parse_url(F.lit("https://ex.com:8080/p/q?x=1&y=2")).alias("u")
    ).collect()[0].u
    assert u.scheme == "https" and u.path == "/p/q" and u.query == "x=1&y=2"


def test_dedupe_lru_replay_readmits_after_eviction(spark):
    """The property exact dedupe cannot have (dedupe.rs LRU): a key
    evicted by cache_size newer distinct keys is admitted AGAIN."""
    from pyspark.sql import functions as F

    from vector_spark.operators.dedupe import dedupe, dedupe_lru_replay

    # stream: A, B, C, D, A  with cache_size=2 -> by the time A returns
    # it has been evicted (B,C then C,D in cache) -> A re-admitted
    rows = [(i, k) for i, k in enumerate(["A", "B", "C", "D", "A", "B"])]
    df = spark.createDataFrame(rows, "seq int, k string")
    got = (
        dedupe_lru_replay(df, match=["k"], order_by=[F.col("seq")], cache_size=2)
        .orderBy("seq")
        .collect()
    )
    assert [(r.seq, r.k) for r in got] == [(0, "A"), (1, "B"), (2, "C"), (3, "D"), (4, "A"), (5, "B")]
    # exact dedupe keeps only the first A/B — the documented divergence
    exact = dedupe(df, match=["k"], order_by=[F.col("seq")]).orderBy("seq").collect()
    assert [(r.seq, r.k) for r in exact] == [(0, "A"), (1, "B"), (2, "C"), (3, "D")]


def test_dedupe_lru_replay_within_capacity_equals_exact(spark):
    from pyspark.sql import functions as F

    from vector_spark.operators.dedupe import dedupe, dedupe_lru_replay

    rows = [(i, f"k{i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "seq int, k string")
    lru = dedupe_lru_replay(df, match=["k"], order_by=[F.col("seq")], cache_size=5000)
    exact = dedupe(df, match=["k"], order_by=[F.col("seq")])
    assert sorted((r.seq, r.k) for r in lru.collect()) == sorted(
        (r.seq, r.k) for r in exact.collect()
    )


def test_iceberg_ddl_and_fallback(spark, tmp_path):
    """No Iceberg runtime in this sandbox: the probe must say so, the
    DDL must carry the north-rule partition spec, and the unified
    sink must fall back to the identical parquet layout."""
    import os

    from vector_spark.sinks import (
        iceberg_available,
        iceberg_transcripts_ddl,
        write_transcripts,
    )
    from vector_spark.sources.synth import transcripts_df

    assert iceberg_available(spark) is False
    ddl = iceberg_transcripts_ddl()
    assert "PARTITIONED BY (days(ts), bucket(16, conv_id))" in ddl
    assert "USING iceberg" in ddl
    out = str(tmp_path / "tx")
    write_transcripts(transcripts_df(spark, n_convs=20), out)
    days = [d for d in os.listdir(out) if d.startswith("p_day=")]
    assert days
    buckets = os.listdir(os.path.join(out, days[0]))
    assert any(b.startswith("p_bucket=") for b in buckets)


def test_dedupe_dotted_column_names(spark):
    """Exact-name resolution: a column literally named 'a.b' must not
    parse as struct access anywhere in the dedupe plan."""
    from vector_spark.operators.dedupe import dedupe

    df = spark.createDataFrame([(1, 2, 3), (1, 9, 1)], ["k", "a.b", "v"])
    out = dedupe(df, match=["k"], order_by=[df.v]).collect()
    assert len(out) == 1 and out[0]["a.b"] == 9
