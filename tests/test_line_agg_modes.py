"""line_agg full Mode enum vs the reference's sequential automaton.

Fixture tables are the reference's own tests (src/line_agg.rs:404+);
the property test replays the literal handle_line state machine
(line_agg.rs:295-355) in Python over random (start, condition) match
sequences and requires segment-identical output from the declarative
window construction — all four modes, including the toggle path.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from vector_spark.operators.line_agg import MODES, line_agg_modes


def _run(spark, lines, start, cond, mode, timeout=None, ts=None):
    rows = [
        ("f", i, l) + ((float(ts[i]),) if ts else ())
        for i, l in enumerate(lines)
    ]
    schema = "src string, idx int, line string" + (
        ", ts double" if ts else ""
    )
    df = spark.createDataFrame(rows, schema)
    out = line_agg_modes(
        df,
        ["src"],
        [F.col("idx")],
        "line",
        start,
        cond,
        mode,
        timeout=timeout,
        ts_col="ts" if ts else None,
    )
    got = sorted(out.collect(), key=lambda r: r["segment"])
    return [r["message"] for r in got]


def reference_automaton(lines, s_bits, c_bits, mode, gaps=None):
    """The literal handle_line logic (line_agg.rs:295-355): buffer per
    source, occupied-branch decision table, EndExclude re-processing
    the halting line through the vacant branch. `gaps[i]` True means
    the buffer timed out before line i arrived (flush first)."""
    out, buf = [], None
    for i, line in enumerate(lines):
        s, c = s_bits[i], c_bits[i]
        if gaps and gaps[i] and buf is not None:
            out.append(buf)
            buf = None
        if buf is None:
            if s:
                buf = [line]
            else:
                out.append([line])
            continue
        decision = {
            "continue_through": "cont" if c else "end_ex",
            "continue_past": "cont" if c else "end_in",
            "halt_before": "end_ex" if c else "cont",
            "halt_with": "end_in" if c else "cont",
        }[mode]
        if decision == "cont":
            buf.append(line)
        elif decision == "end_in":
            buf.append(line)
            out.append(buf)
            buf = None
        else:  # end_ex: emit buffer, REPROCESS line via vacant branch
            out.append(buf)
            buf = [line] if s else None
            if buf is None:
                out.append([line])
    if buf is not None:
        out.append(buf)
    return ["\n".join(b) for b in out]


# (name, lines, start, cond, mode, expected) — line_agg.rs fixtures
REFERENCE_CASES = [
    (
        "continue_through",
        ["some usual line", "some other usual line", "first part",
         " second part", " last part", "another normal message",
         "finishing message", " last part of the incomplete finishing message"],
        r"^[^\s]", r"^[\s]+", "continue_through",
        ["some usual line", "some other usual line",
         "first part\n second part\n last part", "another normal message",
         "finishing message\n last part of the incomplete finishing message"],
    ),
    (
        "continue_past",
        ["some usual line", "some other usual line", "first part \\",
         "second part \\", "last part", "another normal message",
         "finishing message \\",
         "last part of the incomplete finishing message \\"],
        r"\\$", r"\\$", "continue_past",
        ["some usual line", "some other usual line",
         "first part \\\nsecond part \\\nlast part",
         "another normal message",
         "finishing message \\\nlast part of the incomplete finishing message \\"],
    ),
    (
        "halt_before",
        ["INFO some usual line", "INFO some other usual line",
         "INFO first part", "second part", "last part",
         "ERROR another normal message", "ERROR finishing message",
         "last part of the incomplete finishing message"],
        r"", r"^(INFO|ERROR) ", "halt_before",
        ["INFO some usual line", "INFO some other usual line",
         "INFO first part\nsecond part\nlast part",
         "ERROR another normal message",
         "ERROR finishing message\nlast part of the incomplete finishing message"],
    ),
    (
        "halt_with",
        ["some usual line;", "some other usual line;", "first part",
         "second part", "last part;", "another normal message;",
         "finishing message", "last part of the incomplete finishing message"],
        r"[^;]$", r";$", "halt_with",
        ["some usual line;", "some other usual line;",
         "first part\nsecond part\nlast part;", "another normal message;",
         "finishing message\nlast part of the incomplete finishing message"],
    ),
    (
        "java_exception",
        ["java.lang.Exception", "    at com.foo.bar(bar.java:123)",
         "    at com.foo.baz(baz.java:456)"],
        r"^[^\s]", r"^[\s]+at", "continue_through",
        ["java.lang.Exception\n    at com.foo.bar(bar.java:123)\n"
         "    at com.foo.baz(baz.java:456)"],
    ),
]


@pytest.mark.parametrize("case", REFERENCE_CASES, ids=[c[0] for c in REFERENCE_CASES])
def test_reference_mode_fixtures(spark, case):
    _, lines, start, cond, mode, exp = case
    assert _run(spark, lines, start, cond, mode) == exp


def test_timeout_flush(spark):
    """A gap larger than the timeout flushes the open buffer: the
    post-gap line cannot join backwards even though the condition
    pattern continues."""
    lines = ["head", " tail1", " tail2", " orphan after gap", "head2", " t"]
    ts = [0.0, 1.0, 2.0, 100.0, 101.0, 102.0]
    got = _run(
        spark, lines, r"^[^\s]", r"^[\s]+", "continue_through",
        timeout=10.0, ts=ts,
    )
    assert got == ["head\n tail1\n tail2", " orphan after gap", "head2\n t"]


def test_mode_validation(spark):
    df = spark.createDataFrame([("f", 1, "x")], "src string, idx int, line string")
    with pytest.raises(ValueError, match="mode"):
        line_agg_modes(df, ["src"], [F.col("idx")], "line", "a", "b", "bogus")
    with pytest.raises(ValueError, match="together"):
        line_agg_modes(
            df, ["src"], [F.col("idx")], "line", "a", "b",
            "continue_through", timeout=5.0,
        )


@settings(max_examples=12, deadline=None)
@given(
    bits=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=12
    ),
    mode=st.sampled_from(MODES),
)
def test_property_matches_sequential_automaton(spark, bits, mode):
    """Random (start, condition) sequences, each line unique: the
    window construction must emit exactly the sequential automaton's
    segments, every mode."""
    lines = [
        ("S" if s else "x") + ("C" if c else "y") + f"_{i}"
        for i, (s, c) in enumerate(bits)
    ]
    want = reference_automaton(
        lines, [b[0] for b in bits], [b[1] for b in bits], mode
    )
    got = _run(spark, lines, "S", "C", mode)
    assert sorted(got) == sorted(want), (bits, mode)
