"""Property-based tests (hypothesis) — the analogue of the reference's
quickcheck/proptest layer (SURVEY.md §5: lib/vrl/proptests/,
lib/value quickcheck). Pure-python kernels only, so the suite stays
fast: grok->regex compilation, the portable hash arithmetic, and the
shingle-id math that MinHash portability rests on.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.datapipe.dedup import MH_P
from vector_spark.functions.grok import GROK_PATTERNS, grok_to_regex
from vector_spark.functions.hashes import consistent_keyed_hash_sql

# ---------------------------------------------------------------------------
# grok -> regex round trip


_literals = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x7E),
    min_size=1,
    max_size=8,
)

_word = st.from_regex(r"\w+", fullmatch=True).filter(lambda s: len(s) <= 10 and s)
_int = st.integers(min_value=-(10**9), max_value=10**9).map(str)
_notspace = st.from_regex(r"\S+", fullmatch=True).filter(
    lambda s: 0 < len(s) <= 10 and all(ord(c) < 127 for c in s)
)


@settings(max_examples=200, deadline=None)
@given(
    lit0=_literals,
    a=_word,
    lit1=_literals.map(lambda s: " " + s + " "),
    b=_int,
    lit2=_literals,
)
def test_grok_roundtrip_word_int(lit0, a, lit1, b, lit2):
    """Compiling '<lit>%{WORD:a}<lit>%{INT:b}<lit>' and matching the
    string rendered from sampled values must recover exactly (a, b)."""
    pattern = f"{lit0} %{{WORD:a}}{lit1}%{{INT:b}} {lit2}"
    rendered = f"{lit0} {a}{lit1}{b} {lit2}"
    regex, fields = grok_to_regex(pattern)
    assert fields == ["a", "b"]
    m = re.fullmatch(regex, rendered)
    assert m is not None, (pattern, rendered, regex)
    # WORD is greedy \w+; with a space-delimited render the capture is exact
    assert m.group("a") == a
    assert m.group("b") == b


@settings(max_examples=100, deadline=None)
@given(v=_notspace)
def test_grok_notspace_captures_token(v):
    regex, fields = grok_to_regex("x=%{NOTSPACE:v} end")
    m = re.fullmatch(regex, f"x={v} end")
    assert m is not None and m.group("v") == v


def test_grok_all_primitives_compile_both_flavors():
    for name in GROK_PATTERNS:
        for flavor in ("python", "java"):
            regex, fields = grok_to_regex(f"a %{{{name}:x}} b", flavor=flavor)
            # composites (COMMONAPACHELOG etc.) legitimately surface
            # their internal named captures after the outer name
            assert fields[0] == "x"
            if flavor == "python":
                re.compile(regex)


@settings(max_examples=50, deadline=None)
@given(lit=st.text(min_size=1, max_size=12))
def test_grok_literal_escaping(lit):
    """Any literal text (incl. regex metacharacters) must match itself."""
    regex, _ = grok_to_regex(f"{lit}%{{INT:n}}")
    assert re.fullmatch(regex, f"{lit}42").group("n") == "42"


# ---------------------------------------------------------------------------
# portable hash: python arithmetic == the SQL string we hand to DuckDB


def _py_keyed_hash(key: int) -> int:
    m, a, b = 1_000_003, 2_654_435_761, 97
    return ((key % m + m) % m * a + b) % m


@settings(max_examples=100, deadline=None)
@given(key=st.integers(min_value=-(2**40), max_value=2**40))
def test_consistent_hash_sql_matches_python(key):
    sql = consistent_keyed_hash_sql(str(key))
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert got == _py_keyed_hash(key)


# ---------------------------------------------------------------------------
# shingle-id math (MinHash portability): first-15-hex-of-md5 mod P is
# engine-reproducible and in range


@settings(max_examples=100, deadline=None)
@given(s=st.text(min_size=0, max_size=30))
def test_shingle_id_portable(s):
    py = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MH_P
    got = duckdb.execute(
        "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT) % 2147483647",
        [s],
    ).fetchone()[0]
    assert got == py
    assert 0 <= py < MH_P


# ---------------------------------------------------------------------------
# redact pattern portability: the PII filter chain must behave
# identically under Python re (PCRE-ish) and DuckDB (RE2) — the
# single-source-of-truth claim in datapipe/redact.py rests on the
# patterns staying inside the common subset. Random ASCII text with
# randomly embedded PII-shaped tokens.

_pii_snippets = st.sampled_from(
    [
        "bob@example.com",
        "a.b+c@ex-ample.co.uk",
        "x@y.z",  # 1-char TLD: NOT an email per the pattern
        "212-09-1111",  # valid SSN shape
        "666-12-1234",  # excluded area
        "123-12-1204",  # serial quirk: no match (carried from reference)
        "10.0.0.1",
        "555-867-5309",
        "1234-12-1234",  # phone-adjacent junk
    ]
)
_filler = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E, blacklist_characters="'%\\"),
    min_size=0,
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(parts=st.lists(st.one_of(_filler, _pii_snippets), min_size=1, max_size=6))
def test_redact_chain_python_re_matches_duckdb_re2(parts):
    from vector_spark.datapipe.redact import PII_FILTERS

    text = " ".join(parts)
    py = text
    for _, pattern, marker in PII_FILTERS:
        py = re.sub(pattern, marker.replace("\\", "\\\\"), py)
    sql = "?"
    for _, pattern, marker in PII_FILTERS:
        sql = f"regexp_replace({sql}, '{pattern}', '{marker}', 'g')"
    got = duckdb.execute(f"SELECT {sql}", [text]).fetchone()[0]
    assert got == py
    for name, pattern, _ in PII_FILTERS:
        n_py = len(re.findall(pattern, text))
        n_ddb = duckdb.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, pattern]
        ).fetchone()[0]
        assert n_ddb == n_py, name
