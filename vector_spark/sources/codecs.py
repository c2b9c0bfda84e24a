"""Decode/encode codecs (SURVEY.md §2.6).

The reference decodes framing x deserializer
(lib/codecs/src/decoding/mod.rs:82-117): framings Bytes /
NewlineDelimited / CharacterDelimited / LengthDelimited /
OctetCounting; deserializers bytes, json, syslog, native...; encoders
json, logfmt, text... (lib/codecs/src/encoding/mod.rs:191-245).

Spark mapping: newline framing IS the text reader's contract;
character-delimited framing is a split; the deserializers are column
expressions. Length/octet framing over binary blobs uses a
mapInPandas splitter (binaryFile + per-batch slicing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ndjson(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """NewlineDelimited framing + json deserializer. Malformed lines
    surface with a NULL struct + the raw line retained (the decode
    error channel)."""
    raw = spark.read.text(path)
    return raw.select(
        F.col("value").alias("raw"),
        F.from_json(F.col("value"), schema).alias("event"),
    )


def read_delimited(
    spark: SparkSession, path: str, delimiter: str, schema_cols: list[str]
) -> DataFrame:
    """CharacterDelimited framing + positional fields (csv-ish)."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), F.lit(delimiter).cast("string"))
    cols = [parts.getItem(i).alias(name) for i, name in enumerate(schema_cols)]
    return raw.select(F.col("value").alias("raw"), *cols)


def decode_syslog_line(col: Column) -> Column:
    """RFC3164-ish syslog deserializer as a struct column
    (<pri>MMM dd HH:mm:ss host tag: message)."""
    rx = r"^<(\d+)>(\w{3} +\d+ \d{2}:\d{2}:\d{2}) (\S+) ([^:\[]+)(?:\[(\d+)\])?: (.*)$"
    pri = F.regexp_extract(col, rx, 1)
    return F.struct(
        F.nullif(pri, F.lit("")).cast("int").alias("pri"),
        (F.nullif(pri, F.lit("")).cast("int") / 8).cast("int").alias("facility"),
        F.pmod(F.nullif(pri, F.lit("")).cast("int"), F.lit(8)).alias("severity"),
        F.nullif(F.regexp_extract(col, rx, 2), F.lit("")).alias("timestamp_raw"),
        F.nullif(F.regexp_extract(col, rx, 3), F.lit("")).alias("host"),
        F.nullif(F.regexp_extract(col, rx, 4), F.lit("")).alias("appname"),
        F.nullif(F.regexp_extract(col, rx, 5), F.lit("")).alias("procid"),
        F.nullif(F.regexp_extract(col, rx, 6), F.lit("")).alias("message"),
    )


GELF_KNOWN_SCHEMA = (
    "version string, host string, short_message string, full_message string, "
    "timestamp double, level int, facility string, line double, file string"
)

# lib/codecs/src/gelf.rs:46 — additional-field name validity
_GELF_FIELD_RX = r"^[\w\.\-]*$"


def decode_gelf(col: Column) -> Column:
    """GELF deserializer (lib/codecs/src/decoding/format/gelf.rs):
    JSON line -> struct(message, host, timestamp, level, facility,
    line, file, additional:map<string,string>). Mapping mirrors the
    reference: short_message becomes the message body (:83), the
    float epoch timestamp converts at second+fraction precision
    (:101-108), `_id` is dropped and only underscore-prefixed keys
    matching the validity regex survive into `additional`
    (:133-152). Values are coerced to strings (GELF restricts them
    to strings and numbers, :154-156)."""
    known = F.from_json(col, GELF_KNOWN_SCHEMA)
    allm = F.from_json(col, "map<string,string>")
    additional = F.map_filter(
        allm,
        lambda k, v: k.startswith("_") & (k != "_id") & k.rlike(_GELF_FIELD_RX),
    )
    return F.struct(
        known["short_message"].alias("message"),
        known["full_message"].alias("full_message"),
        known["host"].alias("host"),
        F.timestamp_seconds(known["timestamp"]).alias("timestamp"),
        known["level"].alias("level"),
        known["facility"].alias("facility"),
        known["line"].alias("line"),
        known["file"].alias("file"),
        additional.alias("additional"),
    )


def read_gelf(spark: SparkSession, path: str) -> DataFrame:
    """NewlineDelimited framing + GELF deserializer."""
    raw = spark.read.text(path)
    return raw.select(
        F.col("value").alias("raw"), decode_gelf(F.col("value")).alias("event")
    )


NATIVE_METRIC_SCHEMA = (
    "name string, namespace string, tags map<string,string>, kind string, "
    "counter struct<value:double>, gauge struct<value:double>"
)


def decode_native_json(col: Column, log_schema: str = "map<string,string>") -> Column:
    """native_json deserializer
    (lib/codecs/src/decoding/format/native_json.rs): Vector's own
    event envelope {"log": {...}} | {"metric": {...}} -> struct(log,
    metric); exactly one side is non-null per event."""
    return F.from_json(
        col, f"log {log_schema}, metric struct<{NATIVE_METRIC_SCHEMA}>"
    )


def read_native_json(
    spark: SparkSession, path: str, log_schema: str = "map<string,string>"
) -> DataFrame:
    """Newline framing + native_json deserializer. Top-level JSON
    arrays fan out to one event per element (native_json.rs:63-67);
    single objects normalize through a one-element array so both
    shapes share one from_json+explode plan."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    as_array = F.when(
        F.startswith(F.trim(F.col("value")), F.lit("[")), F.col("value")
    ).otherwise(F.concat(F.lit("["), F.col("value"), F.lit("]")))
    events = F.from_json(
        as_array, f"array<struct<log {log_schema}, metric struct<{NATIVE_METRIC_SCHEMA}>>>"
    )
    return raw.select(
        F.col("value").alias("raw"), F.explode(events).alias("event")
    )


def read_length_delimited(
    spark: SparkSession, path: str, encoding: str = "utf-8"
) -> DataFrame:
    """LengthDelimited framing (decoding/mod.rs:93-94): frames
    prefixed by an unsigned big-endian u32 length, over arbitrary
    binary files. binaryFile scan + an Arrow mapInPandas slicer —
    payload bytes never hit the driver; each file slices inside its
    partition. Returns (path, frame_idx, payload)."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def slice_frames(batches):
        for pdf in batches:
            out = {"path": [], "frame_idx": [], "payload": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                i, idx = 0, 0
                while i + 4 <= len(buf):
                    n = int.from_bytes(buf[i : i + 4], "big")
                    frame = buf[i + 4 : i + 4 + n]
                    if len(frame) < n:
                        break  # truncated trailing frame: drop (framing error)
                    out["path"].append(p)
                    out["frame_idx"].append(idx)
                    out["payload"].append(frame.decode(encoding, errors="replace"))
                    i += 4 + n
                    idx += 1
            yield pd.DataFrame(out)

    return raw.mapInPandas(
        slice_frames, "path string, frame_idx long, payload string"
    )


def read_octet_counting(
    spark: SparkSession, path: str, encoding: str = "utf-8"
) -> DataFrame:
    """OctetCounting framing (RFC 6587 §3.4.1; decoding/mod.rs:105-115):
    ASCII decimal length, one space, then that many payload bytes.
    Same binaryFile + mapInPandas shape as length-delimited."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def slice_frames(batches):
        for pdf in batches:
            out = {"path": [], "frame_idx": [], "payload": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                i, idx = 0, 0
                while i < len(buf):
                    j = i
                    while j < len(buf) and buf[j : j + 1].isdigit():
                        j += 1
                    if j == i or j >= len(buf) or buf[j : j + 1] != b" ":
                        break  # not a valid octet-counting prefix
                    n = int(buf[i:j])
                    frame = buf[j + 1 : j + 1 + n]
                    if len(frame) < n:
                        break
                    out["path"].append(p)
                    out["frame_idx"].append(idx)
                    out["payload"].append(frame.decode(encoding, errors="replace"))
                    i = j + 1 + n
                    idx += 1
            yield pd.DataFrame(out)

    return raw.mapInPandas(
        slice_frames, "path string, frame_idx long, payload string"
    )


def decode_statsd(col: Column) -> Column:
    """statsd/dogstatsd line deserializer
    (src/sources/statsd/parser.rs:15-109):

      name:value|type[|@sample_rate][|#tag1:v1,tag2]

    -> struct(name, mtype, kind, value:double, sample_rate:double,
    tags:map<string,string>). Faithful semantics: the name is
    sanitized ('/' -> "'-", whitespace -> '_', other non-alphanum
    dropped, :160-165); counters multiply by 1/sample_rate (:38,62);
    '+n'/'-n' gauges are incremental deltas, plain gauges absolute
    (:73-97); 'ms' timers convert to base seconds (:176-180); type
    maps c->counter, g->gauge, s->set, h/ms->distribution(histogram),
    d->distribution(summary). Bare tags get value 'true'
    (parse_tags:126-146). Malformed lines -> all-NULL struct."""
    key = F.substring_index(col, ":", 1)
    body = F.substr(col, F.length(key) + 2)
    parts = F.split(body, r"\|")
    nparts = F.size(parts)
    ok = (F.instr(col, ":") > 0) & (nparts >= 2)

    name = F.regexp_replace(key, "/", "'-")
    name = F.regexp_replace(name, r"\s+", "_")
    name = F.regexp_replace(name, r"[^a-zA-Z_\-0-9\.]", "")

    raw_val = F.try_element_at(parts, F.lit(1))
    mtype_c = F.try_element_at(parts, F.lit(2))
    p3 = F.try_element_at(parts, F.lit(3))
    p4 = F.try_element_at(parts, F.lit(4))
    sampling = F.when(p3.startswith("@"), p3)
    tags_part = F.coalesce(
        F.when(sampling.isNull() & p3.startswith("#"), p3),
        F.when(p4.startswith("#"), p4),
    )
    rate_raw = F.substr(sampling, F.lit(2)).try_cast("double")
    # sanitize_sampling: 0 -> 1; effective multiplier is 1/rate
    sample_rate = F.coalesce(
        1.0 / F.when(rate_raw != 0.0, rate_raw), F.lit(1.0)
    )

    tag_entries = F.transform(
        F.split(F.substr(tags_part, F.lit(2)), ","),
        lambda p: F.struct(
            F.substring_index(p, ":", 1).alias("key"),
            F.when(F.instr(p, ":") > 0, F.substr(p, F.instr(p, ":") + 1))
            .otherwise("true")
            .alias("value"),
        ),
    )
    tags = F.when(tags_part.isNotNull(), F.map_from_entries(tag_entries))

    num = raw_val.try_cast("double")
    signed = raw_val.rlike(r"^[+-]")
    value = (
        F.when(mtype_c == "c", num * sample_rate)
        .when(mtype_c == "ms", num / 1000.0)
        .otherwise(num)
    )
    mtype = (
        F.when(mtype_c == "c", "counter")
        .when(mtype_c == "g", "gauge")
        .when(mtype_c == "s", "set")
        .when(mtype_c.isin("h", "ms"), "distribution_histogram")
        .when(mtype_c == "d", "distribution_summary")
    )
    kind = F.when(
        (mtype_c == "g") & ~signed, "absolute"
    ).otherwise("incremental")

    return F.struct(
        F.when(ok, name).alias("name"),
        F.when(ok, mtype).alias("mtype"),
        F.when(ok & mtype.isNotNull(), kind).alias("kind"),
        F.when(ok, value).alias("value"),
        F.when(ok, sample_rate).alias("sample_rate"),
        F.when(ok, tags).alias("tags"),
    )


_PROM_LINE_RX = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+(\S+)(?:\s+(\d+))?\s*$"


def decode_prometheus_line(col: Column) -> Column:
    """Prometheus text-exposition sample line
    (src/sources/prometheus/ consumes this format; the grammar is the
    public exposition format):

      metric_name{label="a",other="b"} value [timestamp_ms]

    -> struct(name, labels:map<string,string>, value:double,
    ts_ms:bigint). Comment (#) and malformed lines -> all-NULL
    struct. Label values may contain escaped quotes."""
    name = F.regexp_extract(col, _PROM_LINE_RX, 1)
    labels_raw = F.regexp_extract(col, _PROM_LINE_RX, 2)
    value_raw = F.regexp_extract(col, _PROM_LINE_RX, 3)
    ts_raw = F.regexp_extract(col, _PROM_LINE_RX, 4)
    ok = (
        ~col.startswith("#")
        & (name != "")
        & F.regexp_extract(col, _PROM_LINE_RX, 3).isNotNull()
        & (value_raw != "")
    )
    pair_rx = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:\\.|[^"\\])*)"'
    keys = F.regexp_extract_all(labels_raw, F.lit(pair_rx), 1)
    vals = F.transform(
        F.regexp_extract_all(labels_raw, F.lit(pair_rx), 2),
        lambda v: F.replace(
            F.replace(v, F.lit(r"\""), F.lit('"')), F.lit(r"\\"), F.lit("\\")
        ),
    )
    labels = F.when(labels_raw != "", F.map_from_arrays(keys, vals)).otherwise(
        F.when(ok, F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")))
    )
    value = (
        F.when(F.lower(value_raw) == "nan", float("nan"))
        .when(F.lower(value_raw).isin("+inf", "inf"), float("inf"))
        .when(F.lower(value_raw) == "-inf", float("-inf"))
        .otherwise(value_raw.try_cast("double"))
    )
    return F.struct(
        F.when(ok, name).alias("name"),
        F.when(ok, labels).alias("labels"),
        F.when(ok, value).alias("value"),
        F.when(ok, ts_raw.try_cast("bigint")).alias("ts_ms"),
    )


def encode_json(cols: list[str] | None = None) -> Column:
    """json serializer: struct of named columns -> one JSON line."""
    return F.to_json(F.struct(*[F.col(c) for c in (cols or [])]))


def encode_text(message_col: str = "message") -> Column:
    """text serializer (lib/codecs/src/encoding/format/text.rs): the
    event's message field rendered as-is; non-string values via their
    canonical string form."""
    return F.col(message_col).cast("string")


def encode_raw_message(message_col: str = "message") -> Column:
    """raw_message serializer (encoding/format/raw_message.rs): the
    UNMODIFIED message bytes — binary passthrough (text is the
    string-rendering variant)."""
    return F.col(message_col).cast("binary")


def encode_logfmt(cols: list[str]) -> Column:
    """logfmt serializer: k=v pairs, null fields skipped
    (lib/codecs encoding::logfmt analogue)."""
    pairs = [
        F.when(
            F.col(c).isNotNull(), F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
        )
        for c in cols
    ]
    return F.array_join(F.array_compact(F.array(*pairs)), " ")


def encode_kv_map(map_col: Column) -> Column:
    """map<string,string> -> sorted 'k=v k=v' text (deterministic).

    Reference quoting (lib/vrl/stdlib/src/encode_key_value.rs): a
    value (or key) containing spaces, '=' or '"' is double-quoted
    with inner quotes backslash-escaped — logfmt-compatible."""

    def q(s: Column) -> Column:
        needs = s.rlike('[ ="]') | (F.length(s) == 0)
        return F.when(
            needs,
            F.concat(F.lit('"'), F.replace(s, F.lit('"'), F.lit('\\"')), F.lit('"')),
        ).otherwise(s)

    entries = F.transform(
        F.array_sort(F.map_entries(map_col)),
        lambda e: F.concat(q(e["key"]), F.lit("="), q(e["value"])),
    )
    return F.array_join(entries, " ")


def encode_native_json(
    log_map: Column | None = None, metric: Column | None = None
) -> Column:
    """native_json serializer (lib/codecs/src/encoding/format/
    native_json.rs): Vector's own event envelope — exactly one of
    {"log": {...}} / {"metric": {...}} per event; round-trips through
    decode_native_json. Null map fields are omitted by to_json, so a
    log event carries no "metric" key (and vice versa). A NULL input
    value encodes to NULL, not to the invalid empty envelope "{}" —
    the reference deserializer rejects an envelope with no variant."""
    if (log_map is None) == (metric is None):
        raise ValueError("exactly one of log_map/metric required")
    payload = log_map if log_map is not None else metric
    field = "log" if log_map is not None else "metric"
    return F.when(
        payload.isNotNull(), F.to_json(F.struct(payload.alias(field)))
    )


def encode_csv(cols: list[str]) -> Column:
    """csv serializer (lib/codecs/src/encoding/format/csv-ish): one
    RFC4180 line per row from the named columns."""
    return F.to_csv(F.struct(*[F.col(c) for c in cols]), {"escape": '"'})


def encode_gelf(
    message: Column,
    host: Column,
    ts: Column | None = None,
    level: Column | None = None,
    additional: dict[str, Column] | None = None,
) -> Column:
    """GELF serializer (lib/codecs/src/encoding/format/gelf.rs): the
    inverse of decode_gelf — version pinned 1.1, message -> short_message,
    epoch-seconds float timestamp, additional fields underscore-prefixed."""
    fields = [
        F.lit("1.1").alias("version"),
        host.alias("host"),
        message.alias("short_message"),
    ]
    if ts is not None:
        fields.append(F.unix_timestamp(ts).cast("double").alias("timestamp"))
    if level is not None:
        fields.append(level.cast("int").alias("level"))
    for k, v in (additional or {}).items():
        name = k if k.startswith("_") else f"_{k}"
        fields.append(v.cast("string").alias(name))
    return F.to_json(F.struct(*fields))
