"""End-to-end flagship pipeline vs the independent pandas golden:
routed-row SET equality per sink, per-sink aggregate count equality,
per-turn text equality under stable ordering, count conservation.
These mirror the reference's behavior tests
(tests/behavior/transforms/route.toml) and the north-rule invariants.
"""

import numpy as np
import pandas as pd
import pytest

from tests.golden import golden_pipeline
from vector_spark.plans.transcript_pipeline import run_pipeline
from vector_spark.sources.synth import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

N_CONVS = 120


@pytest.fixture(scope="module")
def fixture_pdf():
    return gen_transcripts_pdf(np.arange(N_CONVS))


@pytest.fixture(scope="module")
def outputs(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf, TRANSCRIPT_SCHEMA)
    return run_pipeline(spark, df)


@pytest.fixture(scope="module")
def golden(fixture_pdf):
    return golden_pipeline(fixture_pdf)


def _keys(df):
    return set(map(tuple, df.select("conv_id", "turn_idx").toPandas().itertuples(index=False)))


def test_count_conservation(outputs, fixture_pdf):
    ok = outputs.parsed.count()
    dropped = outputs.dropped.count()
    assert ok + dropped == len(fixture_pdf)
    assert dropped > 0  # malformed json rows exist by construction


def test_per_turn_text_equality_under_stable_order(outputs, fixture_pdf):
    got = (
        outputs.parsed.select("conv_id", "turn_idx", "text", "turn_seq")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # turn_seq (row_number over (conv_id, turn_idx), assigned BEFORE the
    # parse-drop) must equal turn_idx+1 — fixture turn_idx is contiguous
    assert (got.turn_seq == got.turn_idx + 1).all()
    # text of parsed rows must be EXACTLY the source text for those keys
    merged = got.merge(
        fixture_pdf[["conv_id", "turn_idx", "text"]],
        on=["conv_id", "turn_idx"],
        suffixes=("_got", "_src"),
    )
    assert len(merged) == len(got)
    assert (merged.text_got == merged.text_src).all()


def test_routed_row_sets_match_golden(outputs, golden):
    for name in ("errors", "tool_calls", "slow", "_unmatched"):
        got = _keys(outputs.routes[name])
        want = golden["routes"][name]
        assert got == want, f"route {name}: {len(got ^ want)} differing keys"


def test_route_laws(outputs):
    all_parsed = _keys(outputs.parsed)
    unmatched = _keys(outputs.routes["_unmatched"])
    union = set()
    for name in ("errors", "tool_calls", "slow"):
        union |= _keys(outputs.routes[name])
    assert union | unmatched == all_parsed
    assert not (union & unmatched)


def test_aggregates_match_golden(outputs, golden):
    for name, want in golden["aggregates"].items():
        got = outputs.aggregates[name].toPandas()
        key = ["window_start", "role_norm", "tool_category"]
        got["window_start"] = pd.to_datetime(got["window_start"])
        want = want.copy()
        want["window_start"] = pd.to_datetime(want["window_start"])
        got = got.sort_values(key, na_position="last").reset_index(drop=True)
        want = want.sort_values(key, na_position="last").reset_index(drop=True)
        assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
        pd.testing.assert_frame_equal(
            got[key + ["events", "dur_ms_sum"]],
            want[key + ["events", "dur_ms_sum"]],
            check_dtype=False,
        )


def test_dropped_annotation_shape(outputs):
    row = outputs.dropped.limit(1).collect()[0]
    ann = row["metadata_dropped"].asDict()
    assert ann["reason"] == "error"
    assert ann["component_type"] == "remap"
    assert ann["component_kind"] == "transform"


def test_native_grok_variant_matches(spark, fixture_pdf, outputs):
    df = spark.createDataFrame(fixture_pdf, TRANSCRIPT_SCHEMA)
    alt = run_pipeline(spark, df, use_pandas_grok=False)
    a = outputs.parsed.select("conv_id", "turn_idx", "status", "dur_ms").toPandas()
    b = alt.parsed.select("conv_id", "turn_idx", "status", "dur_ms").toPandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
