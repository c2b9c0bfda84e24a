"""Enrichment-table semantics (lib/enrichment/src/lib.rs):
exactly-one-match invariant, case-insensitive keys, BetweenDates."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vector_spark.operators.enrich import enrich_between, enrich_lookup


def test_non_unique_dim_raises(spark):
    """get_enrichment_table_record errors unless exactly 1 row matches
    (lib.rs:43-51); we enforce it at build time on the dim side."""
    fact = spark.createDataFrame([("a",)], "k string")
    dim = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v int")
    with pytest.raises(ValueError, match="not unique"):
        enrich_lookup(fact, dim, on=["k"])


def test_lookup_left_and_case_insensitive(spark):
    fact = spark.createDataFrame([("Bash",), ("nope",)], "tool string")
    dim = spark.createDataFrame([("bash", "shell")], "tool string, cat string")
    out = {
        r.tool: r.cat
        for r in enrich_lookup(fact, dim, on=["tool"], case_insensitive=True).collect()
    }
    assert out == {"Bash": "shell", "nope": None}


def test_between_dates(spark):
    fact = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5)), (2, datetime.datetime(2024, 2, 5))],
        "id int, ts timestamp",
    )
    dim = spark.createDataFrame(
        [("jan", datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 31))],
        "campaign string, valid_from timestamp, valid_to timestamp",
    )
    out = {r.id: r.campaign for r in enrich_between(fact, dim, ts_col="ts").collect()}
    assert out == {1: "jan", 2: None}


# ---- mmdb reader (sources/mmdb.py) over a spec-valid fixture ----

_MMDB_NETS = [
    ("10.0.0.0/8", {"country": {"iso_code": "US", "geoname_id": 6252001},
                    "is_anycast": False}),
    ("172.16.0.0/12", {"country": {"iso_code": "DE", "geoname_id": 2921044},
                       "is_anycast": True}),
    ("192.168.4.0/24", {"country": {"iso_code": "FR"},
                        "location": {"latitude": 48.8566}}),
]


def _fixture(tmp_path, record_size):
    from tests.mmdb_writer import build_mmdb

    p = tmp_path / f"t{record_size}.mmdb"
    p.write_bytes(build_mmdb(_MMDB_NETS, record_size=record_size))
    return str(p)


@pytest.mark.parametrize("record_size", [24, 28, 32])
def test_mmdb_reader_roundtrip(tmp_path, record_size):
    """networks() enumerates exactly the written networks, data maps
    intact, for every record size the spec allows."""
    from vector_spark.sources.mmdb import MMDBReader

    r = MMDBReader.open(_fixture(tmp_path, record_size))
    assert r.metadata["database_type"] == "Test-GeoIP"
    assert r.record_size == record_size and r.ip_version == 4
    got = dict(r.networks())
    assert got == dict(_MMDB_NETS)


def test_mmdb_point_lookup(tmp_path):
    from vector_spark.sources.mmdb import MMDBReader

    r = MMDBReader.open(_fixture(tmp_path, 24))
    assert r.lookup("10.1.2.3")["country"]["iso_code"] == "US"
    assert r.lookup("172.31.255.255")["country"]["iso_code"] == "DE"
    assert r.lookup("192.168.4.77")["location"]["latitude"] == pytest.approx(48.8566)
    assert r.lookup("192.168.5.1") is None  # outside every network
    assert r.lookup("8.8.8.8") is None


def test_mmdb_rejects_garbage(tmp_path):
    from vector_spark.sources.mmdb import MMDBError, MMDBReader

    p = tmp_path / "bad.mmdb"
    p.write_bytes(b"definitely not a maxmind database")
    with pytest.raises(MMDBError):
        MMDBReader.open(str(p))


def test_mmdb_dim_feeds_enrich_cidr(spark, tmp_path):
    """The production path: mmdb -> (cidr, fields) dim -> broadcast
    range join (geoip.rs semantics end-to-end, no Python per fact
    row)."""
    from vector_spark.operators.enrich import enrich_cidr
    from vector_spark.sources.mmdb import mmdb_dim

    dim = mmdb_dim(
        spark, _fixture(tmp_path, 24),
        fields=["country.iso_code", "is_anycast"],
    )
    assert dim.columns == ["cidr", "country_iso_code", "is_anycast"]
    facts = spark.createDataFrame(
        [("10.9.9.9",), ("172.20.0.1",), ("192.168.4.200",), ("1.1.1.1",)],
        "ip string",
    )
    out = {
        r["ip"]: (r["country_iso_code"], r["is_anycast"])
        for r in enrich_cidr(facts, dim, "ip").collect()
    }
    assert out["10.9.9.9"] == ("US", "False")
    assert out["172.20.0.1"] == ("DE", "True")
    assert out["192.168.4.200"] == ("FR", None)  # field absent in record
    assert out["1.1.1.1"] == (None, None)  # no network matched

    # the plan is the broadcast range join, no Python
    plan = enrich_cidr(facts, dim, "ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
    assert "Python" not in plan.split("Scan ExistingRDD")[0]
