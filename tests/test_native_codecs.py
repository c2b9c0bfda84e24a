"""Avro binary + protobuf `native` codecs: golden wire bytes
(hand-derived from the public specs) + Spark round-trips."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vector_spark.sources.native_codecs import (
    _avro_decode_value,
    _avro_encode_value,
    _decode_log_event,
    _encode_log_event,
    decode_avro,
    decode_native_log,
    encode_avro,
    encode_native_log,
)

AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "double"]},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
        ],
    }
)


def test_avro_golden_bytes():
    # Avro spec: long = zigzag varint; string = long length + utf8
    buf = bytearray()
    _avro_encode_value(3, "long", buf)
    _avro_encode_value("hi", "string", buf)
    assert bytes(buf) == b"\x06\x04hi"
    v, pos = _avro_decode_value(bytes(buf), 0, "long")
    assert v == 3
    s, pos = _avro_decode_value(bytes(buf), pos, "string")
    assert s == "hi" and pos == len(buf)


def test_avro_union_null():
    buf = bytearray()
    _avro_encode_value(None, ["null", "double"], buf)
    assert bytes(buf) == b"\x00"  # union index 0, no payload
    buf = bytearray()
    _avro_encode_value(1.5, ["null", "double"], buf)
    assert bytes(buf)[0] == 0x02  # union index 1 zigzagged
    v, _ = _avro_decode_value(bytes(buf), 0, ["null", "double"])
    assert v == 1.5


def test_avro_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (1, "x", 2.5, {"k": "v"}, [1, 2]),
            (2, "y", None, {}, []),
        ],
        "a long, b string, c double, tags map<string,string>, xs array<long>",
    )
    enc = df.select(
        "a",
        encode_avro(
            AVRO_SCHEMA, F.col("a"), F.col("b"), F.col("c"), F.col("tags"), F.col("xs")
        ).alias("payload"),
    )
    dec = enc.select("a", decode_avro(F.col("payload"), AVRO_SCHEMA).alias("rec"))
    rows = {r.a: r.rec for r in dec.collect()}
    assert rows[1].b == "x" and rows[1].c == 2.5
    assert rows[1].tags == {"k": "v"} and rows[1].xs == [1, 2]
    assert rows[2].c is None and rows[2].xs == []


def test_avro_malformed_is_null(spark):
    df = spark.createDataFrame([(bytearray(b"\xff\xff\xff"),)], "payload binary")
    out = df.select(decode_avro(F.col("payload"), AVRO_SCHEMA).alias("rec")).collect()
    assert out[0].rec.b is None


def test_avro_oversized_varint_is_null_not_job_failure(spark):
    """A corrupt 15-byte varint chain decodes to a >64-bit int in pure
    Python; without the 64-bit bound it would pass the per-record
    try/except and blow up Arrow serialization of the whole batch."""
    df = spark.createDataFrame(
        [(bytearray(b"\xff" * 15 + b"\x01"),)], "payload binary"
    )
    out = df.select(decode_avro(F.col("payload"), AVRO_SCHEMA).alias("rec")).collect()
    assert out[0].rec.a is None


def test_proto_golden_bytes():
    # EventWrapper{log{fields{"k": raw_bytes "v"}}} hand-assembled:
    # Value: 0A 01 76 | entry: 0A 01 6B 12 03 <value> |
    # Log: 0A 08 <entry> | wrapper: 0A 0A <log>
    wire = _encode_log_event({"k": "v"})
    assert wire == bytes.fromhex("0a0a0a080a016b12030a0176")
    assert _decode_log_event(wire) == {"k": "v"}


def test_proto_typed_values_roundtrip():
    fields = {"s": "txt", "i": 42, "neg": -7, "f": 1.25, "t": True, "n": None}
    assert _decode_log_event(_encode_log_event(fields)) == fields


def test_proto_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [({"msg": "hello", "lvl": "info"},), ({"msg": "bye"},)],
        "fields map<string,string>",
    )
    enc = df.select(encode_native_log(F.col("fields")).alias("payload"), "fields")
    dec = enc.select("fields", decode_native_log(F.col("payload")).alias("back"))
    for r in dec.collect():
        assert r.back == r.fields


def test_ocf_roundtrip_bytes():
    from vector_spark.sources.native_codecs import (
        ocf_decode,
        ocf_encode,
    )

    payload = bytearray()
    _avro_encode_value(7, "long", payload)
    _avro_encode_value("x", "string", payload)
    blob = ocf_encode(bytes(payload), 1, AVRO_SCHEMA[:0] + '{"type":"record","name":"R","fields":[{"name":"a","type":"long"},{"name":"b","type":"string"}]}')
    schema_json, blocks = ocf_decode(blob)
    assert '"name":"R"' in schema_json.replace(" ", "")
    assert blocks == [bytes(payload)]


def test_ocf_spark_files_roundtrip(spark, tmp_path):
    """Partition-parallel OCF write -> binaryFile read: files are
    self-describing (schema in metadata), rows round-trip."""
    import json as _json

    from vector_spark.sources.native_codecs import (
        read_avro_files,
        write_avro_files,
    )

    schema = _json.dumps(
        {
            "type": "record",
            "name": "Ev",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
                {"name": "c", "type": ["null", "double"]},
            ],
        }
    )
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i) if i % 3 else None) for i in range(100)],
        "a long, b string, c double",
    ).repartition(4)
    out = str(tmp_path / "avro_out")
    n_files = write_avro_files(df, out, schema, ["a", "b", "c"])
    assert n_files >= 1
    back = read_avro_files(spark, out)
    rows = {r.a: r for r in back.collect()}
    assert len(rows) == 100
    assert rows[5].b == "s5" and rows[5].c == 5.0
    assert rows[3].c is None
