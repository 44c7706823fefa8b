"""Cached-lookup enrichment operator tests (S8-S10, S17): fetch-once
semantics via a file-logging fetcher, NPPES payload parsing fidelity,
offline dim_npi join mode, and HUD best-ratio selection."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mrf_etl_spark.operators.enrichment import (
    LookupConfig,
    NPPES_RESULT,
    enrich_census_geocode,
    enrich_nppes,
    offline_nppes_fetcher,
    parse_nppes_payload,
    zip_to_cbsa,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="mrf_enrich_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def logging_fetcher(log_path):
    """Wrap the offline NPPES fetcher to record every fetched key in a file
    (executor-side; local mode shares the FS) so tests can count fetches."""

    def fetch(keys):
        with open(log_path, "a") as f:
            for k in keys:
                f.write(f"{k}\n")
        return offline_nppes_fetcher(keys)

    return fetch


def _fetch_count(log_path):
    if not os.path.exists(log_path):
        return 0
    with open(log_path) as f:
        return sum(1 for _ in f)


def test_cached_lookup_fetches_each_key_once(spark, tmpdir):
    df = spark.createDataFrame(
        [(f"1{i:09d}",) for i in range(20) for _ in range(3)], "prov_npi string"
    )
    log = f"{tmpdir}/fetch.log"
    cache = f"{tmpdir}/nppes_cache"
    cfg = LookupConfig(batch_size=7, fetch_partitions=2)

    out1 = enrich_nppes(
        spark, df, "prov_npi", cache_path=cache, fetcher=logging_fetcher(log), cfg=cfg
    )
    assert out1.count() == 60  # left join against unique-keyed cache: no fanout
    assert _fetch_count(log) == 20  # one fetch per DISTINCT key, not per row

    # second run: all keys cached -> zero new fetches
    out2 = enrich_nppes(
        spark, df, "prov_npi", cache_path=cache, fetcher=logging_fetcher(log), cfg=cfg
    )
    assert _fetch_count(log) == 20
    assert out2.filter(F.col("status") == "A").count() == 60  # every cached row enriched (org_name is null for NPI-1 individuals, like the real API)

    # new keys fetch only the delta
    df2 = spark.createDataFrame([(f"1{i:09d}",) for i in range(25)], "prov_npi string")
    enrich_nppes(
        spark, df2, "prov_npi", cache_path=cache, fetcher=logging_fetcher(log), cfg=cfg
    )
    assert _fetch_count(log) == 25  # 5 new keys


def test_parse_nppes_payload_location_preferred():
    payload = {
        "result_count": 1,
        "results": [
            {
                "enumeration_type": "NPI-1",
                "basic": {"organization_name": "ACME", "status": "A", "last_updated": "2024-05-01"},
                "addresses": [
                    {"address_purpose": "MAILING", "address_1": "PO BOX 9", "city": "NOWHERE"},
                    {"address_purpose": "LOCATION", "address_1": "1 MAIN ST", "city": "ATLANTA",
                     "state": "GA", "postal_code": "30301-1234"},
                ],
                "taxonomies": [
                    {"code": "X1", "desc": "Not primary", "primary": False},
                    {"code": "207R00000X", "desc": "Internal Medicine", "primary": True},
                ],
            }
        ],
    }
    rec = parse_nppes_payload("1234567890", payload)
    assert rec["address_1"] == "1 MAIN ST"  # LOCATION wins over first/MAILING
    assert rec["city"] == "ATLANTA"
    assert rec["primary_taxonomy_code"] == "207R00000X"
    assert rec["error"] is None
    assert set(rec) == {f.name for f in NPPES_RESULT.fields}

    # no results -> error record, all-null fields
    rec2 = parse_nppes_payload("1", {"result_count": 0})
    assert rec2["error"] == "no_results" and rec2["org_name"] is None
    # first address used when no LOCATION
    payload["results"][0]["addresses"] = [{"address_purpose": "MAILING", "address_1": "PO BOX 9"}]
    assert parse_nppes_payload("1", payload)["address_1"] == "PO BOX 9"


def test_enrich_nppes_dim_join_mode(spark):
    df = spark.createDataFrame([("111",), ("222",), ("333",)], "prov_npi string")
    dim = spark.createDataFrame(
        [("111", "DR A"), ("222", "DR B")], "npi string, organization_name string"
    )
    out = enrich_nppes(spark, df, "prov_npi", dim_npi=dim)
    got = {r.prov_npi: r.organization_name for r in out.collect()}
    assert got == {"111": "DR A", "222": "DR B", "333": None}


def test_zip_to_cbsa_best_ratio(spark, tmpdir):
    df = spark.createDataFrame([("30301",), ("30302",), ("30301",)], "zip5 string")
    cache = f"{tmpdir}/hud_cache"
    out = zip_to_cbsa(spark, df, "zip5", cache_path=cache)
    rows = out.collect()
    assert len(rows) == 3  # best-per-zip join adds no fanout
    assert all(r.cbsa is not None for r in rows)

    # the picked cbsa is the max-ratio candidate in the cache
    cache_df = spark.read.parquet(cache)
    best = (
        cache_df.orderBy(F.col("tot_ratio").desc(), F.col("cbsa").asc())
        .filter(F.col("zip") == "30301")
        .first()
    )
    got = {r.zip5: r.cbsa for r in rows}
    assert got["30301"] == best.cbsa

    # idempotent: rerun leaves cache unchanged
    n1 = cache_df.count()
    zip_to_cbsa(spark, df, "zip5", cache_path=cache)
    assert spark.read.parquet(cache).count() == n1


def test_census_geocode_offline(spark, tmpdir):
    df = spark.createDataFrame(
        [("1 MAIN ST", "ATLANTA", "GA", "30301-1234"), ("2 OAK AVE", "SAVANNAH", "GA", "31401")],
        "address_1 string, city string, state string, postal_code string",
    )
    out = enrich_census_geocode(spark, df, cache_path=f"{tmpdir}/geo_cache")
    rows = out.collect()
    assert len(rows) == 2
    assert {"lat", "lon", "cbsa_geoid", "cbsa_name", "geocode_key"} <= set(out.columns)
    # deterministic: same address -> same key -> same result on rerun
    out2 = enrich_census_geocode(spark, df, cache_path=f"{tmpdir}/geo_cache")
    assert sorted(map(str, rows)) == sorted(map(str, out2.collect()))
