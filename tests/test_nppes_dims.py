"""dim_npi / dim_npi_address builders: payload normalization parity with
the reference (utils_nppes.py:127-189), upsert semantics, and the wiring
into StarLake's search index."""

from __future__ import annotations

import hashlib
import json
import tempfile

from pyspark.sql import functions as F

from mrf_etl_spark.operators.enrichment import fake_nppes_payload
from mrf_etl_spark.operators.nppes_dims import (
    build_npi_dims,
    dim_npi_address_from_payloads,
    dim_npi_from_payloads,
    synthetic_npi_payloads,
)

NPIS = [f"1{i:09d}" for i in range(40)]


def _reference_rows(npi: str):
    """The reference's Python extraction, re-run independently here as the
    test oracle (mirrors _extract_dim_npi_row/_extract_addresses)."""
    rec = fake_nppes_payload(npi)["results"][0]
    basic = rec["basic"]
    tax = rec["taxonomies"]
    prim = next((t for t in tax if t.get("primary")), tax[0] if tax else None)
    dim = {
        "npi": npi,
        "enumeration_type": rec["enumeration_type"],
        "status": basic["status"],
        "organization_name": basic["organization_name"],
        "first_name": basic["first_name"],
        "last_name": basic["last_name"],
        "primary_taxonomy_code": prim["code"] if prim else None,
        "primary_taxonomy_license": prim.get("license") if prim else None,
    }

    def co(x):
        return "" if x is None else str(x)

    addrs = []
    for a in rec["addresses"]:
        key = "|".join(
            co(a.get(f))
            for f in (
                "address_purpose", "address_type", "address_1", "address_2",
                "city", "state", "postal_code", "country_code",
            )
        )
        addrs.append((a.get("address_purpose"), hashlib.md5(key.encode()).hexdigest()))
    return dim, addrs


def test_dim_npi_matches_reference_extraction(spark):
    payloads = synthetic_npi_payloads(spark, NPIS)
    got = {r["npi"]: r.asDict() for r in dim_npi_from_payloads(payloads).collect()}
    assert set(got) == set(NPIS)
    for npi in NPIS:
        want, _ = _reference_rows(npi)
        for k, v in want.items():
            assert got[npi][k] == v, (npi, k, got[npi][k], v)
        assert got[npi]["nppes_fetched"] is True
        assert got[npi]["nppes_fetch_date"] == got[npi]["last_updated"]


def test_dim_npi_address_hash_matches_reference_md5(spark):
    payloads = synthetic_npi_payloads(spark, NPIS)
    rows = dim_npi_address_from_payloads(payloads).collect()
    got = {}
    for r in rows:
        got.setdefault(r["npi"], []).append((r["address_purpose"], r["address_hash"]))
    for npi in NPIS:
        _, want = _reference_rows(npi)
        assert sorted(got[npi]) == sorted(want), npi
    # phone cleaning: digits only
    loc = [r for r in rows if r["address_purpose"] == "LOCATION"][0]
    assert loc["telephone_number"].isdigit() and len(loc["telephone_number"]) == 10


def test_no_address_and_malformed_payloads(spark):
    no_addr = fake_nppes_payload("1999999999")
    no_addr["results"][0]["addresses"] = []
    df = spark.createDataFrame(
        [
            ("1999999999", json.dumps(no_addr)),
            ("1888888888", "{not json"),
            ("1777777777", json.dumps({"result_count": 0, "results": []})),
        ],
        "npi string, payload_json string",
    )
    assert dim_npi_address_from_payloads(df).count() == 0
    # only the parseable payload with a result row mints a dim row
    assert [r["npi"] for r in dim_npi_from_payloads(df).collect()] == ["1999999999"]


def test_build_idempotent_and_refresh_takes_newest(spark):
    lake = tempfile.mkdtemp(prefix="npi_lake_")
    payloads = synthetic_npi_payloads(spark, NPIS)
    c1 = build_npi_dims(spark, payloads, lake)
    c2 = build_npi_dims(spark, payloads, lake)  # append mode: no-op rerun
    assert c1 == c2
    assert c1["dim_npi"] == len(NPIS)
    assert c1["dim_npi_address"] == 2 * len(NPIS)  # MAILING + LOCATION each

    # refresh mode: a newer last_updated replaces the row for its key
    bumped = dim_npi_from_payloads(payloads).limit(0)  # schema template
    one = fake_nppes_payload(NPIS[0])
    one["results"][0]["basic"]["last_updated"] = "2030-01-01"
    one["results"][0]["basic"]["status"] = "I"
    delta = spark.createDataFrame(
        [(NPIS[0], json.dumps(one))], "npi string, payload_json string"
    )
    assert bumped.count() == 0
    build_npi_dims(spark, delta, lake, refresh=True)
    got = (
        spark.read.parquet(f"{lake}/dim_npi")
        .filter(F.col("npi") == NPIS[0])
        .collect()
    )
    assert len(got) == 1 and got[0]["status"] == "I"
    assert spark.read.parquet(f"{lake}/dim_npi").count() == len(NPIS)


def test_star_lake_search_index_joins_npi_dims(spark):
    """FK round-trip: fact → xref_pg_member_npi → dim_npi/address (the
    reference's search-index join, optimized_queries.py shape)."""
    from mrf_etl_spark.plans.ingest import ingest_batch, ingest_npi_dims
    from mrf_etl_spark.plans.queries import StarLake
    from tests.fixtures import make_raw_frames

    lake = tempfile.mkdtemp(prefix="npi_star_lake_")
    rates, prov = make_raw_frames(spark)
    ingest_batch(spark, rates, prov, lake)
    npis = [
        r["npi"]
        for r in spark.read.parquet(f"{lake}/xref_pg_member_npi")
        .select("npi").distinct().collect()
    ]
    ingest_npi_dims(spark, synthetic_npi_payloads(spark, npis), lake)

    star = StarLake.load(spark, lake)
    assert star.dim_npi is not None and star.dim_npi_address is not None
    idx = star.search_index()
    # every fact row that has an NPI must resolve its dim columns
    resolved = idx.filter(F.col("npi").isNotNull())
    assert resolved.count() > 0
    assert resolved.filter(F.col("primary_taxonomy_code").isNull()).count() == 0
    assert resolved.filter(
        F.col("provider_state").isNull() | (F.col("provider_state") != "GA")
    ).count() == 0
    # FK integrity both ways: no dangling xref npi, no orphan dim rows
    xref = star.xref_npi.select("npi").distinct()
    dim = star.dim_npi.select("npi").distinct()
    assert xref.join(dim, "npi", "left_anti").count() == 0
    assert dim.join(xref, "npi", "left_anti").count() == 0
