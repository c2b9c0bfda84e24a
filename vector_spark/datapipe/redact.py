"""PII redaction for corpus pipelines — the training-data analogue of
the reference's `redact` VRL function (lib/vrl/stdlib/src/redact.rs:
Filter::Pattern + Filter::UsSocialSecurityNumber, replacement
Redactor::Full = "[REDACTED]").

Everything is a JVM `regexp_replace` / `regexp_count` chain — no
Python in the hot path, zero shuffles (pure projection over the scan),
so the pass is embarrassingly scan-parallel at 100 TB. Every pattern
is deliberately written in the Java-regex ∩ RE2 common subset (no
lookaround, no backreferences) so the DuckDB oracle can run the exact
same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's US SSN pattern (lib/vrl/stdlib/src/redact.rs:14-22),
# flattened from its (?x) verbose form: area 001-899 except 666,
# group 01-99, serial 0001-9999. Kept character-for-character
# semantically equal so redaction parity with the reference holds.
SSN_PATTERN = (
    r"(?:00[1-9]|0[1-9][0-9]|[1-578][0-9]{2}|6[0-57-9][0-9]|66[0-57-9])-"
    r"(?:0[1-9]|[1-9]0|[1-9][1-9])-"
    r"(?:000[1-9]|00[1-9]0|0[1-9]00|[1-9]000|[1-9]{4})"
)

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
US_PHONE_PATTERN = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

# Order matters: emails go first (their domains contain dots that the
# bare IPv4 pattern could otherwise nibble), SSN before phone (both
# are dash-digit shapes; SSN's 3-2-4 grouping is disjoint from
# phone's 3-3-4, but redacting SSNs first makes the pass
# insensitive to any future loosening of the phone pattern).
PII_FILTERS: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "[EMAIL]"),
    ("ssn", SSN_PATTERN, "[REDACTED]"),
    ("ipv4", IPV4_PATTERN, "[IP]"),
    ("phone", US_PHONE_PATTERN, "[PHONE]"),
]


def redact_text(col: Column) -> Column:
    """Apply every PII filter in order; one nested regexp_replace
    expression, fully codegen'd on the JVM."""
    out = col
    for _, pattern, marker in PII_FILTERS:
        out = F.regexp_replace(out, pattern, marker)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-filter match counts on the PRE-redaction text (the audit
    signal a pipeline emits per document)."""
    return {
        f"n_{name}": F.regexp_count(col, F.lit(pattern)).cast("bigint")
        for name, pattern, _ in PII_FILTERS
    }


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus PII pass: redacted text + per-type counts per document.

    Plan shape: a single Project over the scan — no exchange, no
    Python. At 10^12 docs this is bounded purely by scan bandwidth.
    """
    counts = pii_counts(F.col(text_col))
    return df.select(
        "*",
        redact_text(F.col(text_col)).alias(f"{text_col}_redacted"),
        *[c.alias(n) for n, c in counts.items()],
    )
