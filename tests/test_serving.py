"""Serving-shim tests: JSON envelopes over a hand-built StarLake plus one
live end-to-end HTTP round trip through the stdlib server."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from mrf_etl_spark.plans.queries import StarLake
from mrf_etl_spark.serving import RateAPI, serve


@pytest.fixture(scope="module")
def api(spark):
    fact = spark.createDataFrame(
        [
            ("f1", "GA", "2025-01", "aetna", "professional", "CPT", "99213", "pg1", 100.0, "Aetna Inc"),
            ("f2", "GA", "2025-01", "aetna", "professional", "CPT", "99215", "pg1", 200.555, "Aetna Inc"),
            ("f3", "GA", "2025-01", "uhc", "institutional", "CPT", "99213", "pg2", 300.0, "United"),
            ("f4", "GA", "2025-02", "uhc", "professional", "CPT", "70450", "pg2", 400.0, "United"),
            ("f5", "FL", "2025-01", "aetna", "professional", "CPT", "99213", "pg3", 150.0, "Aetna Inc"),
        ],
        "fact_uid string, state string, year_month string, payer_slug string, billing_class string, "
        "code_type string, code string, pg_uid string, negotiated_rate double, reporting_entity_name string",
    ).select(
        "*",
        F.lit("negotiated").alias("negotiated_type"),
        F.lit("ffs").alias("negotiation_arrangement"),
        F.lit("9999-12-31").alias("expiration_date"),
    )
    dim_code = spark.createDataFrame(
        [("CPT", "99213", "Office visit"), ("CPT", "70450", None)],
        "code_type string, code string, code_description string",
    )
    dim_npi = spark.createDataFrame(
        [("n1", "ACME CLINIC", None, None, "Internal Medicine", "NPI-2", "A")],
        "npi string, organization_name string, first_name string, last_name string, "
        "primary_taxonomy_desc string, enumeration_type string, status string",
    )
    return RateAPI(StarLake(fact=fact, dim_code=dim_code, dim_npi=dim_npi))


def test_rate_summary_envelope(api):
    out = api.rate_summary("GA", "2025-01")
    assert out["state"] == "GA" and out["year_month"] == "2025-01"
    s = out["summary"]
    assert s["total_rates"] == 3
    assert s["avg_rate"] == pytest.approx(200.19, abs=0.01)
    assert s["min_rate"] == 100.0 and s["max_rate"] == 300.0
    assert s["unique_procedures"] == 2 and s["unique_payers"] == 2
    # payer ILIKE filter narrows the scope like the reference's
    scoped = api.rate_summary("GA", "2025-01", payer="aetna")
    assert scoped["summary"]["total_rates"] == 2
    assert scoped["filters"]["payer"] == "aetna"


def test_by_payer_and_by_procedure_envelopes(api):
    payers = api.rates_by_payer("GA", "2025-01")["payers"]
    assert [p["payer_name"] for p in payers] == ["aetna", "uhc"]
    assert payers[0]["rate_count"] == 2
    assert payers[0]["max_rate"] == 200.56  # rounded to 2 like the reference

    procs = api.rates_by_procedure("GA", "2025-01")["procedures"]
    assert procs[0]["code"] == "99213" and procs[0]["rate_count"] == 2
    assert procs[0]["description"] == "Office visit"  # dim_code coalesce


def test_statistics_and_dimension_values(api):
    stats = api.statistics()
    assert stats["total_rates"] == 5 and stats["states"] == 2
    dims = api.dimension_values("billing_class")
    vals = {v["facet"]: v["n"] for v in dims["values"]}
    assert vals == {"professional": 4, "institutional": 1}


def test_provider_search_and_autocomplete(api):
    provs = api.provider_search("acme")["providers"]
    assert len(provs) == 1 and provs[0]["npi"] == "n1"
    sugg = api.autocomplete("code", "99")["suggestions"]
    assert sugg[0]["value"] == "99213" and sugg[0]["n"] == 3


def test_http_round_trip(api):
    server = serve(api, port=0, block=False)  # ephemeral port
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/rates/summary?state=GA&year_month=2025-01"
        ) as resp:
            assert resp.status == 200
            body = json.loads(resp.read())
        assert body["summary"]["total_rates"] == 3
        # the reference's detail + explore URLs resolve too (round-5: the
        # route table was missing both)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/rates/detail?state=GA&year_month=2025-01&code=99213&limit=5"
        ) as resp:
            detail = json.loads(resp.read())
        assert detail["count"] == 2
        assert all(r["code"] == "99213" for r in detail["results"])
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/explore/drilldown?group_by=payer_slug&k=5&state=GA&year_month=2025-01"
        ) as resp:
            ex = json.loads(resp.read())
        assert ex["group_by"] == "payer_slug"
        assert {g["payer_slug"] for g in ex["groups"]} == {"aetna", "uhc"}
        assert ex["fixed"] == {"state": "GA", "year_month": "2025-01"}
        # unknown endpoint → 404 envelope
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # missing required scope → 400
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/rates/summary")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_every_endpoint_plan_carries_global_limit(api, monkeypatch):
    """Driver-protection audit (round-4 verdict item 7): every endpoint's
    collect must go through a limit-capped plan, so an unboundedly large
    lake can never flood the serving process. Spies on DataFrame.collect
    and asserts each collected plan carries a GlobalLimit/CollectLimit."""
    # patch the CONCRETE frame class (pyspark 4's facade DataFrame
    # dispatches to pyspark.sql.classic.dataframe.DataFrame — patching
    # the facade never fires)
    frame_cls = type(api.lake.fact)

    plans: list[tuple[str, str]] = []
    orig = frame_cls.collect
    current = ["?"]

    def spy(self):
        opt = self._jdf.queryExecution().optimizedPlan()
        # Catalyst ELIMINATES limit(1) over a provably-single-row agg
        # (EliminateLimits fires when maxRows <= limit) — there the
        # plan's own maxRows bound is the proof of driver safety
        max_rows = opt.maxRows().get() if opt.maxRows().isDefined() else None
        plans.append((current[0], opt.toString(), max_rows))
        return orig(self)

    monkeypatch.setattr(frame_cls, "collect", spy)
    calls = [
        ("rate_summary", lambda: api.rate_summary("GA", "2025-01")),
        ("rates_by_payer", lambda: api.rates_by_payer("GA", "2025-01", limit=10**9)),
        ("rates_by_procedure", lambda: api.rates_by_procedure("GA", "2025-01", limit=10**9)),
        ("rate_detail", lambda: api.rate_detail("GA", "2025-01")),
        ("provider_search", lambda: api.provider_search("acme", limit=10**9)),
        ("data_availability", lambda: api.data_availability()),
        ("statistics", lambda: api.statistics()),
        ("dimension_values", lambda: api.dimension_values("payer_slug", k=10**9)),
        ("autocomplete", lambda: api.autocomplete("code", "99", k=10**9)),
        ("drilldown", lambda: api.drilldown({"state": "GA"}, "payer_slug", k=10**9)),
    ]
    for name, call in calls:
        current[0] = name
        call()
    assert len(plans) >= len(calls)
    from mrf_etl_spark.serving.api import MAX_ROWS

    unlimited = [
        n
        for n, p, mr in plans
        if "GlobalLimit" not in p
        and "CollectLimit" not in p
        and not (mr is not None and mr <= MAX_ROWS)
    ]
    assert not unlimited, f"endpoints collecting without a limit: {unlimited}"
