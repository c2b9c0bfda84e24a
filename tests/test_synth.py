"""Generator invariants: determinism, distributed==local, skew shape."""

import numpy as np
import pandas as pd

from vector_spark.sources.synth import (
    BASE_TURNS,
    HOT_EVERY,
    HOT_MULT,
    gen_transcripts_pdf,
    transcripts_df,
)


def test_pure_function_of_conv_ids():
    a = gen_transcripts_pdf(np.arange(50))
    b = gen_transcripts_pdf(np.arange(50))
    assert a.equals(b)


def test_partition_independence():
    whole = gen_transcripts_pdf(np.arange(30))
    parts = pd.concat(
        [gen_transcripts_pdf(np.arange(0, 11)), gen_transcripts_pdf(np.arange(11, 30))],
        ignore_index=True,
    )
    assert whole.equals(parts)


def test_skew_and_session_markers():
    pdf = gen_transcripts_pdf(np.arange(HOT_EVERY + 1))
    counts = pdf.groupby("conv_id").size()
    assert counts.loc["conv-00000000"] == BASE_TURNS * HOT_MULT
    assert counts.loc["conv-00000001"] == BASE_TURNS
    # every conversation ends with the reduce fixture marker
    last = pdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id").tail(1)
    assert (last.text == "action=close").all()


def test_spark_generation_matches_pandas(spark):
    n = 40
    got = (
        transcripts_df(spark, n, num_partitions=7)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = gen_transcripts_pdf(np.arange(n)).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # normalize dtypes for comparison
    got["ts"] = pd.to_datetime(got["ts"])
    want["ts"] = pd.to_datetime(want["ts"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
