"""Avro + protobuf `native` codecs (SURVEY.md §2.6 — the reference's
remaining serializers: lib/codecs/src/encoding/mod.rs:191-245 lists
`avro` and `native`; native decode is the protobuf event wire format
of lib/vector-core/src/event/proto.rs over
lib/vector-core/proto/event.proto).

No avro/protobuf libraries ship in this environment (no fastavro, no
python-protobuf, no spark-avro jar), so both codecs are implemented
directly against their PUBLIC wire specifications — Avro's binary
encoding (zigzag varints + length-prefixed bytes, from the Apache
Avro spec) and proto3's tag/varint/length-delimited wire format — in
pure Python behind Arrow-vectorized pandas UDFs. The per-value work
is byte twiddling that has no JVM/vectorized equivalent in Spark
without the jars, so a pandas_udf batch loop is the honest hot path:
one Arrow crossing per batch, no per-row Python UDF overhead.

Scale note: both codecs are row-local (no state, no shuffle) — they
scan-parallelize perfectly; at 100 TB the cost is one pass over the
binary column per partition.
"""

from __future__ import annotations

import json
import struct as _struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# Avro binary encoding primitives (Apache Avro 1.11 spec, "Binary
# Encoding"): long/int = zigzag varint; string/bytes = long-prefixed;
# float/double = little-endian IEEE; boolean = 1 byte; null = empty;
# union = long index + value; array/map = blocked sequences.
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if shift > 63:
            # a valid avro long is at most 10 varint bytes; anything
            # longer is corrupt — raise so decode_avro's error channel
            # yields NULL instead of overflowing Arrow int64 later
            raise ValueError("varint exceeds 64 bits (corrupt avro)")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _normalize_type(t) -> dict | str | list:
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        return [_normalize_type(x) for x in t]
    if isinstance(t, dict):
        return t
    raise ValueError(f"unsupported avro type {t!r}")


def _avro_encode_value(v, t, out: bytearray) -> None:
    t = _normalize_type(t)
    if isinstance(t, list):  # union — index then value
        if v is None and "null" in t:
            idx = t.index("null")
            out += _zigzag_encode(idx)
            return
        for i, branch in enumerate(t):
            if branch != "null":
                out += _zigzag_encode(i)
                _avro_encode_value(v, branch, out)
                return
        raise ValueError(f"no union branch for value {v!r} in {t!r}")
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "array":
            # v may be a numpy array (Arrow batch) — no truthiness
            items = [] if v is None else list(v)
            if items:
                out += _zigzag_encode(len(items))
                for item in items:
                    _avro_encode_value(item, t["items"], out)
            out += _zigzag_encode(0)
            return
        if kind == "map":
            entries = {} if v is None else dict(v)
            if entries:
                out += _zigzag_encode(len(entries))
                for k, item in entries.items():
                    _avro_encode_value(k, "string", out)
                    _avro_encode_value(item, t["values"], out)
            out += _zigzag_encode(0)
            return
        if kind == "record":
            for f in t["fields"]:
                _avro_encode_value(
                    v.get(f["name"]) if isinstance(v, dict) else v[f["name"]],
                    f["type"],
                    out,
                )
            return
        raise ValueError(f"unsupported avro complex type {kind!r}")
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
        return
    if t in ("int", "long"):
        out += _zigzag_encode(int(v))
        return
    if t == "float":
        out += _struct.pack("<f", float(v))
        return
    if t == "double":
        out += _struct.pack("<d", float(v))
        return
    if t in ("bytes", "string"):
        raw = v.encode("utf-8") if t == "string" else bytes(v)
        out += _zigzag_encode(len(raw))
        out += raw
        return
    raise ValueError(f"unsupported avro type {t!r}")


def _avro_decode_value(buf: bytes, pos: int, t) -> tuple[object, int]:
    t = _normalize_type(t)
    if isinstance(t, list):
        idx, pos = _zigzag_decode(buf, pos)
        return _avro_decode_value(buf, pos, t[idx])
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "array":
            items = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # blocked encoding with byte size prefix
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = _avro_decode_value(buf, pos, t["items"])
                    items.append(v)
        if kind == "map":
            entries = {}
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    return entries, pos
                if n < 0:
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    k, pos = _avro_decode_value(buf, pos, "string")
                    v, pos = _avro_decode_value(buf, pos, t["values"])
                    entries[k] = v
        if kind == "record":
            rec = {}
            for f in t["fields"]:
                rec[f["name"]], pos = _avro_decode_value(buf, pos, f["type"])
            return rec, pos
        raise ValueError(f"unsupported avro complex type {kind!r}")
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("corrupt avro length prefix")
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported avro type {t!r}")


def _avro_to_spark_type(t) -> T.DataType:
    t = _normalize_type(t)
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise ValueError("only ['null', X] unions supported")
        return _avro_to_spark_type(branches[0])
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "array":
            return T.ArrayType(_avro_to_spark_type(t["items"]))
        if kind == "map":
            return T.MapType(T.StringType(), _avro_to_spark_type(t["values"]))
        if kind == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], _avro_to_spark_type(f["type"]))
                    for f in t["fields"]
                ]
            )
        raise ValueError(f"unsupported avro complex type {kind!r}")
    return {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }[t]


def encode_avro(schema_json: str, *cols: Column) -> Column:
    """Avro binary-encode a record per row: the schema's fields map
    positionally onto `cols`. Returns a binary column (the reference's
    avro serializer, lib/codecs/src/encoding/format/avro.rs, minus the
    container-file header — record-level framing like Vector's sink
    payloads)."""
    schema = json.loads(schema_json)
    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    fields = schema["fields"]
    if len(fields) != len(cols):
        raise ValueError("column count must match avro record fields")

    @pandas_udf("binary")
    def enc(*series: pd.Series) -> pd.Series:
        n = len(series[0])
        out = []
        for i in range(n):
            buf = bytearray()
            for f, s in zip(fields, series):
                v = s.iloc[i]
                if v is not None and pd.api.types.is_scalar(v) and pd.isna(v):
                    v = None
                _avro_encode_value(v, f["type"], buf)
            out.append(bytes(buf))
        return pd.Series(out)

    return enc(*cols)


def decode_avro(col: Column, schema_json: str) -> Column:
    """Decode an avro-binary record column into a typed struct
    (reference: avro deserializer,
    lib/codecs/src/decoding/format/avro.rs). Malformed payloads yield
    NULL (the decode error channel — never errors the stream)."""
    schema = json.loads(schema_json)
    spark_type = _avro_to_spark_type(schema)
    fields = schema["fields"]

    @pandas_udf(returnType=spark_type)
    def dec(s: pd.Series) -> pd.DataFrame:
        recs = []
        for buf in s:
            if buf is None:
                recs.append({f["name"]: None for f in fields})
                continue
            try:
                rec = {}
                pos = 0
                for f in fields:
                    rec[f["name"]], pos = _avro_decode_value(bytes(buf), pos, f["type"])
                recs.append(rec)
            except Exception:
                recs.append({f["name"]: None for f in fields})
        return pd.DataFrame.from_records(recs)

    return dec(col)


# ---------------------------------------------------------------------------
# protobuf `native` wire format: EventWrapper{ log: Log{ fields:
# map<string, Value> } } per lib/vector-core/proto/event.proto.
# proto3 wire format: tag = (field_number << 3) | wire_type; wire
# types 0 = varint, 1 = 64-bit, 2 = length-delimited, 5 = 32-bit.
# Value kinds: raw_bytes=1, timestamp=2, integer=4, float=5,
# boolean=6, null=9.
# ---------------------------------------------------------------------------


def _pb_varint(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF  # proto3 int64 two's-complement wrap
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return acc, pos


def _pb_tag(field: int, wire: int) -> bytes:
    return _pb_varint((field << 3) | wire)


def _pb_len_delim(field: int, payload: bytes) -> bytes:
    return _pb_tag(field, 2) + _pb_varint(len(payload)) + payload


def _encode_value_msg(v) -> bytes:
    """event.Value: typed oneof — int -> integer(4), float ->
    float(5), bool -> boolean(6), None -> null(9), str/bytes ->
    raw_bytes(1)."""
    if v is None:
        return _pb_tag(9, 0) + _pb_varint(0)
    if isinstance(v, bool):
        return _pb_tag(6, 0) + _pb_varint(1 if v else 0)
    if isinstance(v, int):
        return _pb_tag(4, 0) + _pb_varint(v)
    if isinstance(v, float):
        return _pb_tag(5, 1) + _struct.pack("<d", v)
    raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    return _pb_len_delim(1, raw)


def _decode_value_msg(buf: bytes):
    pos = 0
    val = None
    while pos < len(buf):
        tag, pos = _pb_read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # raw_bytes
            n, pos = _pb_read_varint(buf, pos)
            val = buf[pos : pos + n].decode("utf-8", errors="replace")
            pos += n
        elif field == 4 and wire == 0:  # integer (int64)
            n, pos = _pb_read_varint(buf, pos)
            val = n - (1 << 64) if n >= 1 << 63 else n
        elif field == 5 and wire == 1:  # float (double)
            val = _struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif field == 6 and wire == 0:  # boolean
            n, pos = _pb_read_varint(buf, pos)
            val = bool(n)
        elif field == 9 and wire == 0:  # null
            _, pos = _pb_read_varint(buf, pos)
            val = None
        else:  # skip unknown (timestamp/map/array kinds out of subset)
            if wire == 0:
                _, pos = _pb_read_varint(buf, pos)
            elif wire == 1:
                pos += 8
            elif wire == 2:
                n, pos = _pb_read_varint(buf, pos)
                pos += n
            elif wire == 5:
                pos += 4
            else:
                raise ValueError(f"bad wire type {wire}")
    return val


def _encode_log_event(fields: dict) -> bytes:
    """EventWrapper{ log(1): Log{ fields(1): map<string, Value> } }.
    proto3 maps are repeated map-entry messages (key=1, value=2)."""
    log_body = bytearray()
    for k, v in sorted(fields.items()):
        entry = _pb_len_delim(1, k.encode("utf-8")) + _pb_len_delim(
            2, _encode_value_msg(v)
        )
        log_body += _pb_len_delim(1, entry)
    return _pb_len_delim(1, bytes(log_body))


def _decode_log_event(buf: bytes) -> dict | None:
    pos = 0
    buf = bytes(buf)
    # EventWrapper
    log_payload = None
    while pos < len(buf):
        tag, pos = _pb_read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            n, pos = _pb_read_varint(buf, pos)
            log_payload = buf[pos : pos + n]
            pos += n
        else:
            if wire == 0:
                _, pos = _pb_read_varint(buf, pos)
            elif wire == 2:
                n, pos = _pb_read_varint(buf, pos)
                pos += n
            else:
                raise ValueError(f"unexpected wire type {wire} in EventWrapper")
    if log_payload is None:
        return None
    fields: dict = {}
    pos = 0
    while pos < len(log_payload):
        tag, pos = _pb_read_varint(log_payload, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # map entry
            n, pos = _pb_read_varint(log_payload, pos)
            entry = log_payload[pos : pos + n]
            pos += n
            epos = 0
            k, v = None, None
            while epos < len(entry):
                etag, epos = _pb_read_varint(entry, epos)
                ef, ew = etag >> 3, etag & 7
                if ef == 1 and ew == 2:
                    m, epos = _pb_read_varint(entry, epos)
                    k = entry[epos : epos + m].decode("utf-8")
                    epos += m
                elif ef == 2 and ew == 2:
                    m, epos = _pb_read_varint(entry, epos)
                    v = _decode_value_msg(entry[epos : epos + m])
                    epos += m
                else:
                    raise ValueError("bad map entry")
            if k is not None:
                fields[k] = v
        else:
            if wire == 0:
                _, pos = _pb_read_varint(log_payload, pos)
            elif wire == 2:
                n, pos = _pb_read_varint(log_payload, pos)
                pos += n
            else:
                raise ValueError(f"unexpected wire type {wire} in Log")
    return fields


def encode_native_log(map_col: Column) -> Column:
    """map<string,string> -> protobuf-native EventWrapper bytes (the
    reference's `native` encoder writes the same EventWrapper message,
    lib/vector-core/src/event/proto.rs). String values encode as
    Value.raw_bytes — the reference's representation for log text
    fields."""

    @pandas_udf("binary")
    def enc(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if m is None else _encode_log_event(dict(m)) for m in s]
        )

    return enc(map_col)


def decode_native_log(col: Column) -> Column:
    """protobuf-native EventWrapper bytes -> map<string,string> of the
    log's fields (integers/floats/bools rendered canonically;
    malformed payloads -> NULL map, the decode error channel)."""

    @pandas_udf("map<string,string>")
    def dec(s: pd.Series) -> pd.Series:
        out = []
        for buf in s:
            if buf is None:
                out.append(None)
                continue
            try:
                fields = _decode_log_event(buf)
                out.append(
                    None
                    if fields is None
                    else {
                        k: (
                            None
                            if v is None
                            else (
                                str(v).lower()
                                if isinstance(v, bool)
                                else repr(v) if isinstance(v, float) else str(v)
                            )
                        )
                        for k, v in fields.items()
                    }
                )
            except Exception:
                out.append(None)
        return pd.Series(out)

    return dec(col)


# ---------------------------------------------------------------------------
# Avro Object Container Files (OCF): magic 'Obj\x01', file metadata
# map (avro.schema / avro.codec), 16-byte sync marker, then blocks of
# [record count, byte size, records..., sync]. Null codec only (the
# spec's required baseline). Gives the record codec above file-level
# interop: any avro tool can read what write_avro_files produces.
# ---------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"


def _ocf_sync(schema_json: str) -> bytes:
    """Deterministic 16-byte sync marker (a hash of the schema —
    randomness is not required by the spec, only uniqueness within
    the file's block stream)."""
    import hashlib

    return hashlib.md5(schema_json.encode("utf-8")).digest()


def ocf_encode(records_payload: bytes, n_records: int, schema_json: str) -> bytes:
    """One complete OCF file: header + a single block holding
    `n_records` already-avro-encoded records."""
    sync = _ocf_sync(schema_json)
    meta = {"avro.schema": schema_json.encode("utf-8"), "avro.codec": b"null"}
    buf = bytearray(_OCF_MAGIC)
    buf += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kk = k.encode("utf-8")
        buf += _zigzag_encode(len(kk)) + kk
        buf += _zigzag_encode(len(v)) + v
    buf += _zigzag_encode(0)  # end of metadata blocks
    buf += sync
    buf += _zigzag_encode(n_records)
    buf += _zigzag_encode(len(records_payload))
    buf += records_payload
    buf += sync
    return bytes(buf)


def ocf_decode(blob: bytes) -> tuple[str, list[bytes]]:
    """(schema_json, [raw record payload per block]) from an OCF
    file. Caller decodes records with _avro_decode_value."""
    if blob[:4] != _OCF_MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(blob, pos)
        if n == 0:
            break
        if n < 0:  # blocked map form: byte-size prefix follows
            _, pos = _zigzag_decode(blob, pos)
            n = -n
        for _ in range(n):
            klen, pos = _zigzag_decode(blob, pos)
            k = blob[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _zigzag_decode(blob, pos)
            meta[k] = blob[pos : pos + vlen]
            pos += vlen
    schema_json = meta["avro.schema"].decode("utf-8")
    if meta.get("avro.codec", b"null") != b"null":
        raise ValueError("only the null codec is supported")
    sync = blob[pos : pos + 16]
    pos += 16
    blocks: list[bytes] = []
    while pos < len(blob):
        _count, pos = _zigzag_decode(blob, pos)
        size, pos = _zigzag_decode(blob, pos)
        blocks.append(blob[pos : pos + size])
        pos += size
        if blob[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return schema_json, blocks


def write_avro_files(df, path: str, schema_json: str, cols: list[str]) -> int:
    """Partition-parallel OCF sink: each Spark partition writes one
    part-<pid>.avro under `path` (the reference's avro serializer +
    a file sink). Payloads are encoded executor-side; nothing rides
    through the driver. Returns the file count.

    SCOPE: `path` must be a POSIX path visible to every executor
    (local mode, NFS, or a fuse mount) — executors write with plain
    open(). An object-store variant would route the same ocf_encode
    bytes through the Hadoop FileSystem API instead."""
    import os

    schema = json.loads(schema_json)
    fields = schema["fields"]
    os.makedirs(path, exist_ok=True)
    sel = df.select(*cols)

    def write_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        payload = bytearray()
        n = 0
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                for f, v in zip(fields, row):
                    if v is not None and pd.api.types.is_scalar(v) and pd.isna(v):
                        v = None
                    _avro_encode_value(v, f["type"], payload)
                n += 1
        if n:
            with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as fh:
                fh.write(ocf_encode(bytes(payload), n, schema_json))
        yield pd.DataFrame({"files": [1 if n else 0]})

    out = sel.mapInPandas(write_partition, "files int")
    return int(out.agg({"files": "sum"}).collect()[0][0] or 0)


def read_avro_files(spark, path: str):
    """OCF source: binaryFile scan + per-file block decode, schema
    taken from each file's own metadata (files are self-describing).
    Scan-parallel: one task per file split, rows never visit the
    driver (only ONE file header is peeked driver-side for the output
    schema). Same SCOPE as write_avro_files: POSIX paths — the
    driver-side header peek uses glob/open."""
    raw = spark.read.format("binaryFile").load(path + "/*.avro")

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                schema_json, blocks = ocf_decode(bytes(blob))
                schema = json.loads(schema_json)
                fields = schema["fields"]
                recs = []
                for block in blocks:
                    pos = 0
                    while pos < len(block):
                        rec = {}
                        for f in fields:
                            rec[f["name"]], pos = _avro_decode_value(
                                block, pos, f["type"]
                            )
                        recs.append(rec)
                if recs:
                    yield pd.DataFrame.from_records(recs)

    # infer output schema from the first file's metadata (driver-side
    # peek at ONE file header, not its data)
    import glob as _glob
    import os as _os

    matches = sorted(_glob.glob(_os.path.join(path, "*.avro")))
    if not matches:
        raise ValueError(
            f"no *.avro files under {path!r} (read_avro_files takes a "
            "local/POSIX directory — see docstring scope)"
        )
    first = matches[0]
    with open(first, "rb") as fh:
        head = fh.read()
    schema_json, _ = ocf_decode(head)
    spark_type = _avro_to_spark_type(json.loads(schema_json))
    return raw.select("content").mapInPandas(decode, spark_type)
