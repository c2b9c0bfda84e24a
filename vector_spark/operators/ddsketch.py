"""Mergeable Agent DDSketch as native Spark expressions.

Parity: lib/vector-core/src/metrics/ddsketch.rs (AgentDDSketch) and the
Sketch metric value (lib/vector-core/src/event/metric/value.rs:140-193).
DDSketch itself is the published algorithm (Masson et al., VLDB'19);
the agent flavor fixes the config and collapse strategy.

Config is pinned to the agent defaults (ddsketch.rs:18-20):
eps = 1/128, min_value = 1e-9, bin_limit = 4096. Derived exactly as
Config::new (ddsketch.rs:81-111): gamma = 1 + 2*eps,
gamma_ln = ln1p(2*eps), norm_bias = -floor(ln(min_value)/gamma_ln) + 1.
key(v) = clamp(round_half_even(ln(v)/gamma_ln) + bias, 1, 32767) with
sign symmetry and |v| < norm_min -> key 0 (ddsketch.rs:127-146).
Spark's `bround` IS round-half-even and `ln` is the platform libm, so
the whole key function stays inside whole-stage codegen.

Representation: a sketch row = sorted parallel arrays
(keys array<int>, counts array<bigint>) + count/min/max/sum/avg.
Per-key totals are quantile-identical to the reference's u16 bin
layout: generate_bins (ddsketch.rs:981-1003) splits a total into
adjacent same-key bins and the quantile walk (ddsketch.rs:667-705)
sums them right back. bin_limit collapse folds the lowest
(len - limit) keys into the next surviving key — the same direction
as trim_left (ddsketch.rs:938-979). avg is computed as sum/count
(the reference keeps a running mean for numeric hygiene; quantiles
never consult it).

Scale story: build = one map-side-combinable groupBy(group, key)
shuffle producing <= 4096 rows per group, then a tiny per-group
array-collect. Merge-of-merges (re-aggregation across windows) =
explode + the same two-phase combine. No Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1.0 / 128.0
MIN_VALUE = 1.0e-9
BIN_LIMIT = 4096
MAX_KEY = 32767

_REL = 2.0 * EPS
GAMMA = 1.0 + _REL
GAMMA_LN = math.log1p(_REL)  # 0.015504186535965254
NORM_BIAS = -int(math.floor(math.log(MIN_VALUE) / GAMMA_LN)) + 1  # 1338
NORM_MIN = GAMMA ** (1 - NORM_BIAS)

# sketch columns appended by sketch_agg / sketch_merge
SKETCH_COLS = ("keys", "counts", "count", "min", "max", "sum", "avg")


def sketch_key(value: Column) -> Column:
    """Config::key (ddsketch.rs:127-146) as one codegen'd expression."""
    a = F.abs(value)
    mag = F.greatest(
        F.least(
            F.bround(F.ln(a) / F.lit(GAMMA_LN), 0).cast("int") + F.lit(NORM_BIAS),
            F.lit(MAX_KEY),
        ),
        F.lit(1),
    )
    return (
        F.when(value.isNull(), F.lit(None).cast("int"))
        .when(a < F.lit(NORM_MIN), F.lit(0))
        .when(value < 0, -mag)
        .otherwise(mag)
    )


def bin_lower_bound(key: Column) -> Column:
    """Config::bin_lower_bound / lower_bound (ddsketch.rs:39-53)."""
    a = F.abs(key)
    mag = F.when(a == 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(GAMMA), (a - F.lit(NORM_BIAS)).cast("double"))
    )
    return F.when(key < 0, -mag).otherwise(mag)


def _trim(keys: Column, counts: Column) -> tuple[Column, Column]:
    """trim_left (ddsketch.rs:938-979) on per-key totals: fold the
    lowest (n - BIN_LIMIT) keys' counts into the next surviving key."""
    over = F.size(keys) - F.lit(BIN_LIMIT)
    spill = F.aggregate(
        F.slice(counts, F.lit(1), over), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    kept_k = F.slice(keys, over + 1, F.lit(BIN_LIMIT))
    kept_c = F.slice(counts, over + 1, F.lit(BIN_LIMIT))
    kept_c = F.concat(F.array(F.element_at(kept_c, 1) + spill), F.slice(kept_c, 2, F.lit(BIN_LIMIT)))
    trim_k = F.when(over > 0, kept_k).otherwise(keys)
    trim_c = F.when(over > 0, kept_c).otherwise(counts)
    return trim_k, trim_c


def _collect_sketch(per_key: DataFrame, group_cols: list[str]) -> DataFrame:
    """Final combine: per-(group, key) partials -> one sketch row."""
    gb = per_key.groupBy(*group_cols) if group_cols else per_key.groupBy()
    agg = gb.agg(
        F.array_sort(F.collect_list(F.struct("__k", "__n"))).alias("__bins"),
        F.sum("__n").alias("count"),
        F.min("__mn").alias("min"),
        F.max("__mx").alias("max"),
        F.sum("__sm").alias("sum"),
    )
    keys = F.transform(F.col("__bins"), lambda b: b["__k"])
    counts = F.transform(F.col("__bins"), lambda b: b["__n"])
    tk, tc = _trim(keys, counts)
    return (
        agg.withColumn("keys", tk)
        .withColumn("counts", tc)
        .withColumn("avg", F.col("sum") / F.col("count"))
        .drop("__bins")
        .select(*group_cols, *SKETCH_COLS)
    )


def sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Build one AgentDDSketch per group over a value column.

    Plan: project key(v) -> groupBy(group, key) with count/min/max/sum
    (map-side combinable; at most 4096ish rows per group reach the
    shuffle) -> per-group array collect. NULL values are skipped
    (the reference never sees them: Rust f64).

    `weight_col`: observation multiplicity (the reference's
    insert_n(v, n), ddsketch.rs:553-560 — n observations of v land as
    +n on v's bin and n-weighted basic stats). Rows with weight < 1
    contribute nothing. The weight path is how distribution samples
    (value, rate) feed a sketch WITHOUT expanding rate copies."""
    vals = df.filter(F.col(value_col).isNotNull())
    if weight_col is not None:
        vals = vals.filter(F.col(weight_col) >= 1)
        w = F.col(weight_col).cast("bigint")
    else:
        w = F.lit(1).cast("bigint")
    vals = vals.select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        w.alias("__w"),
        sketch_key(F.col(value_col).cast("double")).alias("__k"),
    )
    per_key = vals.groupBy(*group_cols, "__k").agg(
        F.sum("__w").alias("__n"),
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.sum(F.col("__v") * F.col("__w").cast("double")).alias("__sm"),
    )
    return _collect_sketch(per_key, group_cols)


def sketch_merge(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketch rows (AgentDDSketch::merge, ddsketch.rs:719-756):
    per-key count add, min/max extremes, count/sum add; avg re-derived
    as sum/count (math-equal to the reference's weighted running
    mean). Associative and build-equivalent: merging any partition of
    the input rows yields the sketch built over their union, which is
    the re-aggregation (merge of merges) contract."""
    stats = df.groupBy(*group_cols).agg(
        F.sum("count").alias("count"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        F.sum("sum").alias("sum"),
    )
    ex = df.select(
        *group_cols,
        F.explode(F.arrays_zip(F.col("keys").alias("k"), F.col("counts").alias("n"))).alias("__b"),
    )
    per_key = ex.groupBy(*group_cols, F.col("__b.k").alias("__k")).agg(
        F.sum("__b.n").alias("__n")
    )
    gb = per_key.groupBy(*group_cols)
    bins = gb.agg(F.array_sort(F.collect_list(F.struct("__k", "__n"))).alias("__bins"))
    joined = bins.join(stats, on=group_cols) if group_cols else bins.crossJoin(stats)
    keys = F.transform(F.col("__bins"), lambda b: b["__k"])
    counts = F.transform(F.col("__bins"), lambda b: b["__n"])
    tk, tc = _trim(keys, counts)
    return (
        joined.withColumn("keys", tk)
        .withColumn("counts", tc)
        .withColumn("avg", F.col("sum") / F.col("count"))
        .drop("__bins")
        .select(*group_cols, *SKETCH_COLS)
    )


def sketch_quantile(
    q: float,
    keys: Column | str = "keys",
    counts: Column | str = "counts",
    count: Column | str = "count",
    min_: Column | str = "min",
    max_: Column | str = "max",
) -> Column:
    """AgentDDSketch::quantile (ddsketch.rs:667-705) as one expression.

    wanted_rank = round_half_even(q * (count - 1)); walk bins in key
    order until the running count exceeds it, then interpolate inside
    the bin: weight = (n - rank) / bin_n,
    est = v_low * weight + v_high * (1 - weight) with
    v_high = v_low * gamma, v_low = min for the FIRST bin (the
    reference's i == 0 case; its i == len case is unreachable in the
    loop), clamped to [min, max]. The walk is F.aggregate over the
    zipped (index, key, count) array with a (running_n, estimate)
    struct accumulator — pure JVM, no UDF."""
    keys = F.col(keys) if isinstance(keys, str) else keys
    counts = F.col(counts) if isinstance(counts, str) else counts
    count = F.col(count) if isinstance(count, str) else count
    min_ = F.col(min_) if isinstance(min_, str) else min_
    max_ = F.col(max_) if isinstance(max_, str) else max_

    rank = F.bround(F.lit(float(q)) * (count - 1).cast("double"), 0)
    first_k = F.element_at(keys, 1)
    zipped = F.arrays_zip(keys.alias("k"), counts.alias("n"))

    def step(acc, b):
        n2 = acc["n"] + b["n"]
        v_low_raw = bin_lower_bound(b["k"])
        # keys are distinct and sorted: first-bin test by key identity
        # (the reference's i == 0 case)
        v_low = F.when(b["k"] == first_k, min_).otherwise(v_low_raw)
        v_high = v_low_raw * F.lit(GAMMA)
        weight = (n2.cast("double") - rank) / b["n"].cast("double")
        est = v_low * weight + v_high * (F.lit(1.0) - weight)
        hit = acc["est"].isNull() & (n2.cast("double") > rank)
        return F.struct(
            n2.alias("n"),
            F.when(hit, est).otherwise(acc["est"]).alias("est"),
        )

    walked = F.aggregate(
        zipped,
        F.struct(
            F.lit(0).cast("bigint").alias("n"),
            F.lit(None).cast("double").alias("est"),
        ),
        step,
        lambda acc: acc["est"],
    )
    clamped = F.least(F.greatest(walked, min_), max_)
    return (
        F.when(count.isNull() | (count == 0), F.lit(None).cast("double"))
        .when(F.lit(float(q)) <= 0.0, min_)
        .when(F.lit(float(q)) >= 1.0, max_)
        .otherwise(clamped)
    )
