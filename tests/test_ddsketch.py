"""Agent DDSketch parity: the Spark expression implementation vs a
literal Python replay of the reference algorithm
(lib/vector-core/src/metrics/ddsketch.rs) — build, merge, quantile —
plus the published relative-error contract and merge-of-merges
(re-aggregation) properties."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.ddsketch import (
    BIN_LIMIT,
    GAMMA,
    GAMMA_LN,
    MAX_KEY,
    NORM_BIAS,
    NORM_MIN,
    SKETCH_COLS,
    sketch_agg,
    sketch_merge,
    sketch_quantile,
)


def py_key(v: float) -> int:
    """Config::key (ddsketch.rs:127-146). Python round() is
    round-half-even, same as the reference's round_to_even."""
    if v < 0:
        return -py_key(-v)
    if v == 0 or v < NORM_MIN:
        return 0
    rounded = round(math.log(v) / GAMMA_LN)
    return max(1, min(rounded + NORM_BIAS, MAX_KEY))


def py_lower_bound(k: int) -> float:
    if k < 0:
        return -py_lower_bound(-k)
    if k == 0:
        return 0.0
    return GAMMA ** (k - NORM_BIAS)


class PySketch:
    """Literal replay of AgentDDSketch on per-key totals (test oracle
    only — the product path is the Spark expressions)."""

    def __init__(self):
        self.bins: dict[int, int] = {}
        self.count = 0
        self.min = math.inf
        self.max = -math.inf
        self.sum = 0.0

    def insert(self, v: float) -> None:
        self.count += 1
        self.min = min(self.min, v)
        self.max = max(self.max, v)
        self.sum += v
        k = py_key(v)
        self.bins[k] = self.bins.get(k, 0) + 1
        self._trim()

    def merge(self, other: "PySketch") -> None:
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.sum += other.sum
        for k, n in other.bins.items():
            self.bins[k] = self.bins.get(k, 0) + n
        self._trim()

    def _trim(self) -> None:
        # trim_left (ddsketch.rs:938-979) on per-key totals
        if len(self.bins) <= BIN_LIMIT:
            return
        ks = sorted(self.bins)
        spill_keys = ks[: len(ks) - BIN_LIMIT]
        target = ks[len(ks) - BIN_LIMIT]
        for k in spill_keys:
            self.bins[target] += self.bins.pop(k)

    def quantile(self, q: float) -> float | None:
        # AgentDDSketch::quantile (ddsketch.rs:667-705)
        if self.count == 0:
            return None
        if q <= 0.0:
            return self.min
        if q >= 1.0:
            return self.max
        rank = float(round(q * (self.count - 1)))
        n = 0.0
        est = None
        for i, k in enumerate(sorted(self.bins)):
            cnt = self.bins[k]
            n += cnt
            if n <= rank:
                continue
            weight = (n - rank) / cnt
            v_low = py_lower_bound(k)
            v_high = v_low * GAMMA
            if i == 0:
                v_low = self.min
            est = v_low * weight + v_high * (1.0 - weight)
            break
        if est is None:
            return math.nan
        return min(max(est, self.min), self.max)


VALUE_SETS = {
    "positives": [0.5, 1.0, 1.0, 2.5, 185.22, 9.64, 106.03, 42.0, 1e6, 3.3],
    "mixed_signs": [-5.0, -0.001, 0.0, 0.002, 7.7, -185.22, 1e-12, -1e-12, 3.0],
    "tiny_and_zero": [0.0, NORM_MIN / 2, NORM_MIN, 1e-9, -1e-9, 5e-10],
    "uniform_random": [random.Random(7).uniform(-1000, 1000) for _ in range(400)],
    "lognormal": [math.exp(random.Random(11).gauss(2, 3)) for _ in range(400)],
}


def spark_sketch(spark, values, group="g"):
    df = spark.createDataFrame([(group, float(v)) for v in values], "g string, v double")
    return sketch_agg(df, ["g"], "v").collect()[0]


@pytest.mark.parametrize("name", list(VALUE_SETS))
def test_build_parity(spark, name):
    values = VALUE_SETS[name]
    ref = PySketch()
    for v in values:
        ref.insert(v)
    row = spark_sketch(spark, values)
    want = sorted(ref.bins.items())
    assert list(zip(row["keys"], row["counts"])) == want
    assert row["count"] == ref.count
    assert row["min"] == ref.min and row["max"] == ref.max
    assert row["sum"] == pytest.approx(ref.sum, rel=1e-12)


@pytest.mark.parametrize("name", list(VALUE_SETS))
@pytest.mark.parametrize("q", [0.0, 0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0])
def test_quantile_parity(spark, name, q):
    values = VALUE_SETS[name]
    ref = PySketch()
    for v in values:
        ref.insert(v)
    df = spark.createDataFrame(
        [(float(v),) for v in values], "v double"
    ).select(F.lit("g").alias("g"), "v")
    out = (
        sketch_agg(df, ["g"], "v")
        .select(sketch_quantile(q).alias("qv"))
        .collect()[0]["qv"]
    )
    assert out == pytest.approx(ref.quantile(q), rel=1e-9, abs=1e-300)


def test_relative_error_contract(spark):
    """The DDSketch guarantee: relative error <= eps (= gamma-1)/2 ...
    the reference tests use relative_accuracy = (gamma-1)/2 ~ 0.78%.
    Check against exact quantiles on positive data."""
    rng = random.Random(3)
    values = sorted(math.exp(rng.gauss(0, 2)) for _ in range(2000))
    df = spark.createDataFrame([("g", float(v)) for v in values], "g string, v double")
    sk = sketch_agg(df, ["g"], "v")
    rel = (GAMMA - 1.0) / 2.0
    for q in (0.1, 0.5, 0.9, 0.99):
        got = sk.select(sketch_quantile(q).alias("qv")).collect()[0]["qv"]
        exact = values[round(q * (len(values) - 1))]
        assert abs(got - exact) <= rel * exact * 1.5, (q, got, exact)


def test_merge_of_merges(spark):
    """Re-aggregation: sketches built per chunk then merged (in any
    grouping) equal the single-shot sketch over the union."""
    rng = random.Random(5)
    values = [rng.uniform(-100, 100) for _ in range(600)]
    rows = [(f"c{i % 7}", float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "chunk string, v double")
    chunked = sketch_agg(df, ["chunk"], "v").withColumn("g", F.lit("all"))
    # first merge chunks pairwise (via a coarser intermediate key),
    # then merge the intermediates — merge of merges
    inter = chunked.select(
        F.when(F.col("chunk").isin("c0", "c1", "c2"), "a")
        .otherwise("b")
        .alias("g"),
        *SKETCH_COLS,
    )
    merged_inter = sketch_merge(inter, ["g"])
    final = sketch_merge(
        merged_inter.withColumn("g", F.lit("all")), ["g"]
    ).collect()[0]
    single = sketch_agg(
        df.withColumn("g", F.lit("all")), ["g"], "v"
    ).collect()[0]
    assert list(final["keys"]) == list(single["keys"])
    assert list(final["counts"]) == list(single["counts"])
    assert final["count"] == single["count"]
    assert final["min"] == single["min"] and final["max"] == single["max"]
    assert final["sum"] == pytest.approx(single["sum"], rel=1e-12)
    for q in (0.5, 0.95):
        a = sketch_quantile(q, F.lit(final["keys"]), F.lit(final["counts"]), F.lit(final["count"]), F.lit(final["min"]), F.lit(final["max"]))
        b = sketch_quantile(q, F.lit(single["keys"]), F.lit(single["counts"]), F.lit(single["count"]), F.lit(single["min"]), F.lit(single["max"]))
        row = spark.range(1).select(a.alias("a"), b.alias("b")).collect()[0]
        assert row["a"] == pytest.approx(row["b"], rel=1e-12)


def test_weighted_equals_expanded(spark):
    """insert_n parity: weight_col multiplicity == inserting the value
    `weight` times (zero/negative weights contribute nothing)."""
    rows = [("g", 2.0, 3), ("g", 10.0, 1), ("g", 5.0, 0), ("g", 7.0, 2)]
    df = spark.createDataFrame(rows, "g string, v double, n int")
    wrow = sketch_agg(df, ["g"], "v", weight_col="n").collect()[0]
    expanded = [v for _, v, n in rows for _ in range(n)]
    erow = spark_sketch(spark, expanded)
    assert list(wrow["keys"]) == list(erow["keys"])
    assert list(wrow["counts"]) == list(erow["counts"])
    assert (wrow["count"], wrow["min"], wrow["max"]) == (
        erow["count"],
        erow["min"],
        erow["max"],
    )
    assert wrow["sum"] == pytest.approx(erow["sum"], rel=1e-12)


def test_empty_and_edges(spark):
    df = spark.createDataFrame([("g", None)], "g string, v double")
    out = sketch_agg(df, ["g"], "v").collect()
    assert out == []  # null-only input: no observations, no sketch row
    one = spark.createDataFrame([("g", 42.0)], "g string, v double")
    row = sketch_agg(one, ["g"], "v")
    got = row.select(
        sketch_quantile(0.5).alias("m"),
        sketch_quantile(0.0).alias("lo"),
        sketch_quantile(1.0).alias("hi"),
    ).collect()[0]
    assert got["lo"] == 42.0 and got["hi"] == 42.0
    assert abs(got["m"] - 42.0) <= 42.0 * (GAMMA - 1.0)
