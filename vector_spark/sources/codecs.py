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


def encode_json(cols: list[str] | None = None) -> Column:
    """json serializer: struct of named columns -> one JSON line."""
    return F.to_json(F.struct(*[F.col(c) for c in (cols or [])]))


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
    """map<string,string> -> sorted 'k=v k=v' text (deterministic)."""
    entries = F.transform(
        F.array_sort(F.map_entries(map_col)),
        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
    )
    return F.array_join(entries, " ")
