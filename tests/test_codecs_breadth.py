"""Codec breadth: gelf / native_json deserializers and
length-delimited / octet-counting framings (round-trips)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from vector_spark.sources.codecs import (
    decode_gelf,
    read_gelf,
    read_length_delimited,
    read_native_json,
    read_octet_counting,
)


def test_gelf_decode(spark, tmp_path):
    lines = [
        json.dumps(
            {
                "version": "1.1",
                "host": "example.org",
                "short_message": "A short message",
                "full_message": "Backtrace here\n\nmore stuff",
                "timestamp": 1385053862.3072,
                "level": 1,
                "facility": "payments",
                "line": 42.0,
                "file": "server.rb",
                "_user_id": "9001",
                "_id": "S3creTz",  # dropped per spec (gelf.rs:135-137)
                "bad key": "x",  # not underscore-prefixed: not additional
            }
        ),
        "not json at all",
    ]
    p = tmp_path / "gelf.log"
    p.write_text("\n".join(lines))
    out = read_gelf(spark, str(p)).orderBy("raw").collect()
    good = [r for r in out if r.event and r.event.message is not None][0].event
    assert good.message == "A short message"
    assert good.host == "example.org"
    assert good.level == 1
    assert good.facility == "payments"
    assert good.file == "server.rb"
    assert int(good.timestamp.timestamp()) == 1385053862
    assert good.additional == {"_user_id": "9001"}
    bad = [r for r in out if r.raw == "not json at all"][0]
    assert bad.event.message is None  # decode error channel


def test_native_json_decode(spark, tmp_path):
    lines = [
        json.dumps({"log": {"message": "hello", "host": "a"}}),
        json.dumps(
            [
                {"log": {"message": "one"}},
                {
                    "metric": {
                        "name": "ctr",
                        "kind": "incremental",
                        "counter": {"value": 2.5},
                    }
                },
            ]
        ),
        "",
    ]
    p = tmp_path / "native.ndjson"
    p.write_text("\n".join(lines))
    out = read_native_json(spark, str(p)).select("event.*").collect()
    logs = [r.log for r in out if r.log is not None]
    metrics = [r.metric for r in out if r.metric is not None]
    assert sorted(l["message"] for l in logs) == ["hello", "one"]
    assert len(metrics) == 1 and metrics[0].counter.value == 2.5
    assert metrics[0].kind == "incremental"


def _frames_payloads(rows):
    return [r.payload for r in sorted(rows, key=lambda r: (r.path, r.frame_idx))]


def test_length_delimited_roundtrip(spark, tmp_path):
    frames = ["first frame", "second", "third ñ frame"]
    buf = b"".join(
        len(f.encode()).to_bytes(4, "big") + f.encode() for f in frames
    )
    d = tmp_path / "ld"
    os.makedirs(d)
    (d / "a.bin").write_bytes(buf + b"\x00\x00")  # truncated tail dropped
    out = read_length_delimited(spark, str(d)).collect()
    assert _frames_payloads(out) == frames


def test_octet_counting_roundtrip(spark, tmp_path):
    frames = ["<34>Oct 11 22:14:15 host app: one", "<13>two"]
    buf = b"".join(f"{len(f.encode())} {f}".encode() for f in frames)
    d = tmp_path / "oc"
    os.makedirs(d)
    (d / "a.bin").write_bytes(buf)
    out = read_octet_counting(spark, str(d)).collect()
    assert _frames_payloads(out) == frames


def test_gelf_encode_decode_identity(spark):
    """decode(encode(x)) == projection of x — same identity the
    oracled op_decode_gelf query certifies at sf scale."""
    df = spark.createDataFrame(
        [("h1", "boot", 1700000000.25, 3, "77")],
        "host string, short_message string, timestamp double, level int, uid string",
    )
    line = F.to_json(
        F.struct(
            F.lit("1.1").alias("version"),
            "host",
            "short_message",
            "timestamp",
            "level",
            F.col("uid").alias("_uid"),
        )
    )
    ev = df.select(decode_gelf(line).alias("e")).select("e.*").collect()[0]
    assert (ev.message, ev.host, ev.level) == ("boot", "h1", 3)
    assert ev.additional == {"_uid": "77"}


def test_enrichment_csv_loader(spark, tmp_path):
    """CSV enrichment table with the schema coercion map
    (src/enrichment_tables/file.rs) feeding a broadcast lookup."""
    from vector_spark.operators.enrich import enrich_lookup, load_enrichment_csv

    p = tmp_path / "dim.csv"
    p.write_text(
        "tool,category,weight,since,active\n"
        "shell,system,1.5,2023-01-10,yes\n"
        "browser,web,2.0,2023-06-01,no\n"
    )
    dim = load_enrichment_csv(
        spark,
        str(p),
        schema={
            "weight": "float",
            "since": "date",
            "active": "boolean",
        },
    )
    row = {r.tool: r for r in dim.collect()}
    assert row["shell"].weight == 1.5
    assert str(row["shell"].since) == "2023-01-10"
    assert row["shell"].active is True and row["browser"].active is False
    facts = spark.createDataFrame([("shell",), ("nope",)], "tool string")
    out = {r.tool: r for r in enrich_lookup(facts, dim, on=["tool"]).collect()}
    assert out["shell"].category == "system"
    assert out["nope"].category is None


def test_enrichment_csv_headerless_and_bad_schema(spark, tmp_path):
    from vector_spark.operators.enrich import load_enrichment_csv

    p = tmp_path / "nh.csv"
    p.write_text("a;1\nb;2\n")
    dim = load_enrichment_csv(spark, str(p), delimiter=";", include_headers=False)
    assert dim.columns == ["col_0", "col_1"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_enrichment_csv(spark, str(p), include_headers=False, schema={"zz": "integer"})


def test_encode_csv_decode_roundtrip(spark):
    from vector_spark.sources.codecs import encode_csv

    df = spark.createDataFrame(
        [("a", 'with "quote', 1)], "x string, y string, n int"
    )
    line = df.select(encode_csv(["x", "y", "n"]).alias("l")).first().l
    back = spark.createDataFrame([(line,)], "l string").select(
        F.from_csv(F.col("l"), "x string, y string, n int", {"escape": '"'}).alias("e")
    ).first().e
    assert (back.x, back.y, back.n) == ("a", 'with "quote', 1)


def test_encode_gelf_decode_roundtrip(spark):
    from vector_spark.sources.codecs import decode_gelf, encode_gelf

    df = spark.createDataFrame(
        [("boot ok", "h1", 3, "77")], "msg string, host string, lvl int, uid string"
    )
    line = encode_gelf(
        F.col("msg"), F.col("host"), level=F.col("lvl"), additional={"uid": F.col("uid")}
    )
    ev = df.select(decode_gelf(line).alias("e")).select("e.*").first()
    assert (ev.message, ev.host, ev.level) == ("boot ok", "h1", 3)
    assert ev.additional == {"_uid": "77"}


def test_encode_text_and_raw_message(spark):
    from vector_spark.sources.codecs import encode_raw_message, encode_text

    df = spark.createDataFrame([("hello", 42)], "message string, n int")
    row = df.select(
        encode_text().alias("t"),
        encode_raw_message().alias("r"),
        encode_text("n").alias("tn"),
    ).collect()[0]
    assert row.t == "hello"
    assert bytes(row.r) == b"hello"
    assert row.tn == "42"


def test_encode_native_json_roundtrip(spark):
    """encode_native_json -> decode_native_json recovers the fields
    map; log events carry no 'metric' key (native_json.rs envelope)."""
    from vector_spark.sources.codecs import decode_native_json, encode_native_json

    df = spark.createDataFrame(
        [({"msg": "hi", "lvl": "info"},)], "fields map<string,string>"
    )
    enc = df.select(encode_native_json(F.col("fields")).alias("line"))
    line = enc.first().line
    assert '"log"' in line and "metric" not in line
    back = enc.select(decode_native_json(F.col("line")).alias("ev")).first().ev
    assert back.log["msg"] == "hi" and back.log["lvl"] == "info"
    assert back.metric is None


def test_encode_native_json_null_input_is_null(spark):
    from vector_spark.sources.codecs import encode_native_json

    df = spark.createDataFrame([(None,)], "fields map<string,string>")
    assert df.select(encode_native_json(F.col("fields")).alias("l")).first().l is None
