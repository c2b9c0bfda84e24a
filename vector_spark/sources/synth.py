"""Deterministic synthetic transcript source (the `demo_logs` analogue).

Mirrors the reference's deterministic synthetic-load pattern
(src/sources/demo_logs.rs:82-116 — fixed format cycle, seeded) and the
fixture rules in FIXTURES.md: every value is a pure function of
(conv_id, turn_idx), no RNG state, so the pandas small-scale path and
the Spark distributed path (mapInPandas over a range of conv ids)
produce bit-identical rows.

Table shape (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Skew: every `hot_every`-th conversation has `hot_mult`x the turns —
exercises salting / AQE skew handling at scale.

Text payload grammar (FIXTURES.md F2), template = (c + t) % 4:
  0 request:  "GET /api/v2/resource/123 status=200 dur_ms=42"
  1 kv:       "action=invoke tool=bash ok=true tokens=1234"
  2 free:     lorem words, sometimes with embedded "err_code=E042"
  3 json-ish: {"level":"info","msg":"...","attempt":3}; every 11th is
              truncated/malformed -> exercises the dropped channel
Last turn of every conversation is exactly "action=close" (reduce /
sessionization fixture, FIXTURES.md F6).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# mixed case on purpose — exercises role normalization (FIXTURES.md F1)
ROLES = np.array(["user", "assistant", "tool", "system", "USER", "Assistant"])
TOOLS = np.array(["bash", "search", "browser", "editor", "unknown_tool"])
METHODS = np.array(["GET", "POST", "PUT", "DELETE"])
STATUSES = np.array(["200", "200", "200", "201", "301", "404", "500", "503"])
LEVELS = np.array(["debug", "info", "warn", "error"])
WORDS = np.array(
    [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa",
    ]
)

BASE_TS_US = np.int64(pd.Timestamp("2024-01-01 00:00:00").value // 1000)

# default sizing per scale-factor directory name
SF_CONVS = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000}
BASE_TURNS = 12
HOT_EVERY = 97
HOT_MULT = 20


def _turn_counts(convs: np.ndarray, base_turns: int, hot_every: int, hot_mult: int) -> np.ndarray:
    counts = np.full(len(convs), base_turns, dtype=np.int64)
    counts[convs % hot_every == 0] = base_turns * hot_mult
    return counts


def gen_transcripts_pdf(
    convs: np.ndarray,
    base_turns: int = BASE_TURNS,
    hot_every: int = HOT_EVERY,
    hot_mult: int = HOT_MULT,
    pad: int = 0,
) -> pd.DataFrame:
    """All turns for the given conversation ids, as pandas.

    Pure function of the conv-id array — used directly for small
    fixtures and inside mapInPandas for distributed generation.

    pad > 0 appends `pad` deterministic filler chars per turn in
    PARSE-SAFE positions (long URL path segment, extra kv field, free
    body words, long json msg) — message sizes then approximate real
    log/transcript payloads (the reference's flagship regression case
    parses ~1KB HTTP JSON bodies) without changing any extracted
    field. Fixtures/goldens use pad=0.
    """
    convs = np.asarray(convs, dtype=np.int64)
    counts = _turn_counts(convs, base_turns, hot_every, hot_mult)
    c = np.repeat(convs, counts)
    n_of_c = np.repeat(counts, counts)
    offsets = np.cumsum(counts) - counts
    t = np.arange(counts.sum(), dtype=np.int64) - np.repeat(offsets, counts)

    mix = c + t
    tpl = mix % 4
    is_last = t == n_of_c - 1

    role = ROLES[(t % 6).astype(np.intp)]
    is_tool_turn = (t % 6) == 2
    tool = np.where(is_tool_turn, TOOLS[(mix % 5).astype(np.intp)], None)

    text = np.empty(len(c), dtype=object)

    def S(arr) -> pd.Series:
        return pd.Series(np.asarray(arr).astype(object))

    m0 = tpl == 0
    if m0.any():
        method = S(METHODS[((c[m0] * 7 + t[m0]) % 4).astype(np.intp)])
        ver = S((1 + t[m0] % 3).astype(str))
        rid = S(((c[m0] * 100 + t[m0]) % 10000).astype(str))
        status = S(STATUSES[((c[m0] + 2 * t[m0]) % 8).astype(np.intp)])
        dur = S(((c[m0] * 131 + t[m0] * 17) % 3000).astype(str))
        pad0 = "/" + "x" * pad if pad else ""
        text[m0] = (
            method + " /api/v" + ver + "/resource/" + rid + pad0
            + " status=" + status + " dur_ms=" + dur
        ).to_numpy()

    m1 = tpl == 1
    if m1.any():
        tool2 = S(TOOLS[(mix[m1] % 5).astype(np.intp)])
        ok = S(np.where(mix[m1] % 3 != 0, "true", "false"))
        tokens = S(((c[m1] * 53 + t[m1] * 29) % 5000).astype(str))
        pad1 = " pad=" + "y" * pad if pad else ""
        text[m1] = (
            "action=invoke tool=" + tool2 + " ok=" + ok + " tokens=" + tokens + pad1
        ).to_numpy()

    m2 = tpl == 2
    if m2.any():
        body = S(WORDS[((c[m2] + t[m2]) % 16).astype(np.intp)])
        for j in range(1, 6):
            body = body + " " + S(
                WORDS[((c[m2] * (j + 1) + t[m2] + j * j) % 16).astype(np.intp)]
            )
        errn = (mix[m2] % 997).astype(np.int64)
        err = S(
            np.where(
                mix[m2] % 5 == 0,
                np.char.add(" err_code=E", np.char.zfill(errn.astype(str), 3)),
                "",
            )
        )
        if pad:
            body = body + " " + "z" * pad
        text[m2] = (body + err).to_numpy()

    m3 = tpl == 3
    if m3.any():
        lvl = S(LEVELS[(mix[m3] % 4).astype(np.intp)])
        attempt = S((mix[m3] % 9).astype(str))
        step = S((t[m3] % 7).astype(str))
        pad3 = " " + "w" * pad if pad else ""
        good = (
            '{"level":"' + lvl + '","msg":"step ' + step + " done" + pad3
            + '","attempt":' + attempt + "}"
        )
        bad = '{"level":"' + lvl + '","msg":"trunc'  # malformed on purpose
        text[m3] = np.where(mix[m3] % 11 == 0, bad.to_numpy(), good.to_numpy())

    text[is_last] = "action=close"

    ts = (BASE_TS_US + (c * 60 + t * 7) * 1_000_000).view("datetime64[us]")

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", np.char.zfill(c.astype(str), 8)).astype(object),
            "turn_idx": t.astype(np.int32),
            "role": role.astype(object),
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def transcripts_df(
    spark: SparkSession,
    n_convs: int,
    base_turns: int = BASE_TURNS,
    hot_every: int = HOT_EVERY,
    hot_mult: int = HOT_MULT,
    num_partitions: int | None = None,
    pad: int = 0,
) -> DataFrame:
    """Distributed deterministic generation: spark.range over conv ids
    -> mapInPandas(gen_transcripts_pdf). Scales linearly with
    partitions; each partition generates its conv range independently
    (no shuffle, no driver materialization)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_convs, 1, num_partitions)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_transcripts_pdf(
                    pdf["id"].to_numpy(), base_turns, hot_every, hot_mult, pad
                )

    return rng.mapInPandas(gen, TRANSCRIPT_SCHEMA)


def sf_name(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf0.01'."""
    return os.path.basename(os.path.normpath(sf_dir))


def ensure_transcripts_file(sf_dir: str, data_dir: str | None = None) -> str:
    """Idempotently materialize the transcripts table for a scale
    factor as a SINGLE parquet file (so a DuckDB oracle can
    read_parquet() the same bytes Spark reads). Deterministic: same sf
    -> identical file contents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    name = sf_name(sf_dir)
    n_convs = SF_CONVS.get(name)
    if n_convs is None:
        raise ValueError(f"unknown scale factor dir {sf_dir!r}")
    data_dir = data_dir or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data")
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, f"transcripts_{name}.parquet")
    if os.path.exists(path):
        return path
    pdf = gen_transcripts_pdf(np.arange(n_convs, dtype=np.int64))
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), False),
            pa.field("turn_idx", pa.int32(), False),
            pa.field("role", pa.string(), False),
            pa.field("text", pa.string(), False),
            pa.field("tool", pa.string(), True),
            pa.field("ts", pa.timestamp("us"), False),
        ]
    )
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


# --- enrichment dimension (FIXTURES.md F3) -------------------------------

# Mirrors the CSV enrichment table shape (src/enrichment_tables/file.rs);
# 'unknown_tool' intentionally absent -> exercises the no-match path.
def tool_lookup_rows() -> list[tuple[str, str, int]]:
    return [
        ("bash", "shell", 3),
        ("search", "retrieval", 1),
        ("browser", "web", 2),
        ("editor", "code", 2),
    ]


TOOL_LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("tool", T.StringType(), False),
        T.StructField("tool_category", T.StringType(), False),
        T.StructField("risk_level", T.IntegerType(), False),
    ]
)


def tool_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(tool_lookup_rows(), TOOL_LOOKUP_SCHEMA)
