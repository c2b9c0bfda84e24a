"""PII redaction (datapipe/redact.py) — pattern parity with the
reference's redact VRL function (lib/vrl/stdlib/src/redact.rs) plus
the corpus-pass plumbing (counts, column shapes, zero-shuffle plan).
"""

import re

import pytest
from pyspark.sql import functions as F

from vector_spark.datapipe.redact import (
    PII_FILTERS,
    SSN_PATTERN,
    redact_pii,
    redact_text,
)


def _rows(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_ssn_reference_docstring_example(spark):
    # lib/vrl/stdlib/src/redact.rs:54-56 — the function's own example.
    out = (
        _rows(spark, ['{ "name": "John Doe", "ssn": "123-12-1234"}'])
        .select(redact_text(F.col("text")).alias("r"))
        .first()["r"]
    )
    assert out == '{ "name": "John Doe", "ssn": "[REDACTED]"}'


@pytest.mark.parametrize(
    "ssn,matches",
    [
        ("001-01-0001", True),  # minimum of every component
        ("899-99-9999", True),
        ("666-12-1234", False),  # area 666 excluded
        ("000-12-1234", False),  # area 000 excluded
        ("900-12-1234", False),  # area >= 900 excluded
        ("123-00-1234", False),  # group 00 excluded
        ("123-12-1204", False),  # reference quirk: serial with an inner
        # zero matches NO alternative of its non-lookaround serial
        # regex (redact.rs:19); we carry the quirk for parity
        ("123-12-1000", True),  # [1-9]000 alternative
        ("123-12-0001", True),  # 000[1-9] alternative
    ],
)
def test_ssn_pattern_reference_quirks(ssn, matches):
    assert (re.search(SSN_PATTERN, ssn) is not None) == matches


def test_filter_order_and_markers(spark):
    text = "mail a.b+c@ex-ample.co.uk from 192.168.0.1 ssn 212-09-1111 tel 555-867-5309"
    out = (
        _rows(spark, [text]).select(redact_text(F.col("text")).alias("r")).first()["r"]
    )
    assert out == "mail [EMAIL] from [IP] ssn [REDACTED] tel [PHONE]"


def test_email_does_not_eat_bare_ipv4_domains(spark):
    # a@1.2.3.4 is not an email per our pattern (TLD must be alpha), so
    # the IP inside survives to the ipv4 pass.
    out = (
        _rows(spark, ["a@1.2.3.4 end"]).select(redact_text(F.col("text")).alias("r")).first()["r"]
    )
    assert out == "a@[IP] end"


def test_counts_are_pre_redaction_and_typed(spark):
    df = redact_pii(_rows(spark, ["x@y.com and z@w.org ssn 212-09-2222", None]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["n_email"] == 2
    assert rows[0]["n_ssn"] == 1
    assert rows[0]["n_ipv4"] == 0
    assert rows[0]["n_phone"] == 0
    assert rows[0]["text_redacted"] == "[EMAIL] and [EMAIL] ssn [REDACTED]"
    # NULL text propagates as NULL/NULL-counts (caller decides policy)
    assert rows[1]["text_redacted"] is None
    schema = dict(df.dtypes)
    assert schema["n_email"] == "bigint" and schema["text_redacted"] == "string"


def test_patterns_are_re2_safe():
    # The DuckDB oracle runs the literal same patterns under RE2: no
    # lookaround, no backreferences allowed.
    for name, pattern, _ in PII_FILTERS:
        assert "(?=" not in pattern and "(?!" not in pattern and "(?<" not in pattern, name
        assert not re.search(r"\\[1-9]", pattern), name


def test_redact_pass_plan_has_no_exchange(spark):
    df = redact_pii(_rows(spark, ["a@b.co"] * 4))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM regexp chain
