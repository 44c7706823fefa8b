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
    xref_npi = spark.createDataFrame(
        [("pg1", "n1"), ("pg2", "n1")], "pg_uid string, npi string"
    )
    xref_tin = spark.createDataFrame(
        [("pg1", "ein", "123456789"), ("pg2", "ein", "987654321")],
        "pg_uid string, tin_type string, tin_value string",
    )
    return RateAPI(
        StarLake(
            fact=fact, dim_code=dim_code, dim_npi=dim_npi,
            xref_npi=xref_npi, xref_tin=xref_tin,
        )
    )


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
    vals = {v["value"]: v["count"] for v in dims["values"]}
    assert vals == {"professional": 4, "institutional": 1}
    # the reference's scoped form + the xref-resolved tin dimension
    scoped = api.dimension_values("billing_class", state="GA", year_month="2025-01")
    assert {v["value"]: v["count"] for v in scoped["values"]} == {
        "professional": 2, "institutional": 1,
    }
    tins = api.dimension_values("tin_value", state="GA", year_month="2025-01")
    assert {v["value"]: v["count"] for v in tins["values"]} == {
        "123456789": 2, "987654321": 1,
    }


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
        ("search_tin", lambda: api.search_tin("123456789", "GA", "2025-01", limit=10**9)),
        ("search_payer", lambda: api.search_payer("aetna", "GA", "2025-01", limit=10**9)),
        ("multi_field", lambda: api.multi_field("GA", "2025-01", limit=10**9, billing_code="99213")),
        ("explore_availability", lambda: api.explore_availability("GA", "2025-01", "payer", limit=10**9)),
        ("category_stats", lambda: api.category_stats("GA", "2025-01")),
        ("drill_down", lambda: api.drill_down("GA", "2025-01", "payer", "Aetna Inc", "organization", limit=10**9)),
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


def test_search_family_envelopes(api):
    """The /api/search/* rollups (round-5: URL surface completed): each
    returns the reference's envelope with identity-grain rate stats."""
    tin = api.search_tin("123456789", "GA", "2025-01")
    assert tin["search_type"] == "tin" and tin["result_count"] == 1
    r = tin["results"][0]
    assert r["tin_value"] == "123456789" and r["rate_count"] == 2
    assert r["avg_rate"] == pytest.approx(150.28, abs=0.01)
    assert r["organization_name"] == "ACME CLINIC"

    org = api.search_organization("acme", "GA", "2025-01")
    assert org["result_count"] == 1 and org["results"][0]["rate_count"] == 3

    payer = api.search_payer("aetna", "GA", "2025-01")
    assert payer["results"][0]["payer_slug"] == "aetna"
    assert payer["results"][0]["unique_procedures"] == 2
    assert payer["results"][0]["unique_provider_groups"] == 1

    code = api.search_billing_code("99213", "GA", "2025-01")
    # groups by billing_class too (the reference's grain): professional
    # and institutional rows split
    assert code["result_count"] == 2
    assert all(r["rate_count"] == 1 for r in code["results"])

    mf = api.multi_field("GA", "2025-01", billing_code="99213,99215", payer="aet")
    assert mf["search_type"] == "multi_field" and mf["result_count"] == 2
    assert {r["code"] for r in mf["results"]} == {"99213", "99215"}


def test_explore_family_envelopes(api):
    av = api.explore_availability("GA", "2025-01", "payer", limit=10)
    assert av["result_count"] == 2 and not av["has_more"]
    top = av["results"][0]
    assert top["value"] in ("Aetna Inc", "United") and top["record_count"] >= 1
    assert top["category_info"]["field"] == "reporting_entity_name"

    stats = api.category_stats("GA", "2025-01")["category_statistics"]
    assert stats["payer"]["count"] == 2 and stats["total_records"] == 3
    assert stats["tin"]["count"] == 2

    dd = api.drill_down("GA", "2025-01", "payer", "Aetna Inc", "procedure")
    assert dd["result_count"] == 2
    assert {r["value"] for r in dd["results"]} == {"99213", "99215"}
    assert dd["results"][0]["source_category"] == "payer"


def test_reference_url_surface(api):
    """Every reference URL (backend/main.py:57-996) resolves: health,
    search family, explore family, aliases, and the path-parameter
    autocomplete form."""
    server = serve(api, port=0, block=False)
    try:
        port = server.server_address[1]

        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
                assert resp.status == 200, path
                return json.loads(resp.read())

        assert get("/api/health")["status"] == "healthy"
        assert get("/")["status"] == "healthy"
        scope = "state=GA&year_month=2025-01"
        assert get(f"/api/search/tin?tin_value=123456789&{scope}")["result_count"] == 1
        assert get(f"/api/search/organization?org_name=acme&{scope}")["result_count"] == 1
        assert get(f"/api/search/payer?payer_name=united&{scope}")["result_count"] == 1
        assert get(f"/api/search/billing-code?billing_code=99213&{scope}")["result_count"] == 2
        mf = get(f"/api/search/multi-field?{scope}&billing_code=99213,99215")
        assert mf["result_count"] == 3  # f1, f2, f3 (no payer filter here)
        assert get("/api/meta/available-data")["count"] == get("/api/meta/data-availability")["count"]
        ss = get(f"/api/search/statistics?{scope}")
        assert ss["statistics"]["total_records"] == 3
        assert ss["statistics"]["unique_payers"] == 2
        assert ss["statistics"]["unique_tins"] == 2
        assert get(f"/api/explore/data-availability?{scope}&category=payer")["result_count"] == 2
        assert get(f"/api/explore/category-stats?{scope}")["category_statistics"]["total_records"] == 3
        dd = get(f"/api/explore/drill-down?{scope}&category=payer&selected_value=Aetna%20Inc&drill_category=procedure")
        assert dd["result_count"] == 2
        # path-parameter autocomplete form, legacy prefix flavor
        ac = get("/api/autocomplete/code?prefix=99")
        assert ac["suggestions"][0]["value"] == "99213"
        # reference-scoped flavor: bare value list from the field's own
        # source, value-ascending (backend/main.py:791-906)
        ref = get(f"/api/autocomplete/billing_code?query=9&{scope}")
        assert ref["suggestions"] == ["99213", "99215"]
        tin = get(f"/api/autocomplete/tin_value?query=&{scope}")
        assert tin["suggestions"] == ["123456789", "987654321"]
    finally:
        server.shutdown()


def test_materialized_search_index_serves_identically_and_prunes(api, tmp_path):
    """The reference's comprehensive_search_index MV path: results over
    the materialized index equal the live-join results, and a scoped
    endpoint's scan carries partition filters on (state, year_month) —
    the pruning that makes MV serving 10-50x."""
    mv_lake = api.lake.materialize_search_index(str(tmp_path / "search_mv"))
    live = api.lake.search_rollup("payer", "aetna", "GA", "2025-01").collect()
    mat = mv_lake.search_rollup("payer", "aetna", "GA", "2025-01")
    assert sorted(map(tuple, mat.collect())) == sorted(map(tuple, live))
    plan = mat._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the filters actually bind the partition columns
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "state" in pf and "year_month" in pf, pf


def test_second_tier_rollup_mvs_serve_identically_and_prune(api, tmp_path):
    """The per-endpoint pre-aggregated rollup MVs (the reference's
    10-50x tier): every search type's MV-served rollup must equal the
    live aggregation row-for-row — filtering pre-aggregated groups is
    exact because the predicate column is part of each rollup's group
    key — and the request plan must carry (state, year_month) partition
    filters. category_statistics from its MV must equal the live scoped
    aggregation and also prune."""

    def norm(rows):
        return sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
            for r in rows
        )

    mv_lake = api.lake.materialize_search_index(str(tmp_path / "idx_mv"))
    mv2 = mv_lake.materialize_search_rollups(str(tmp_path / "rollup_mv"))
    probes = [
        ("payer", "aetna"),
        ("payer", "ZZZ-no-match"),
        ("billing_code", "99213"),
        ("organization", "acme"),
        ("taxonomy", "surgery"),
        ("tin", "91-111"),
        # procedure_category needs dim_code_cat, absent from this
        # fixture — the live path can't serve it here either
    ]
    for st, val in probes:
        live = api.lake.search_rollup(st, val, "GA", "2025-01")
        mat = mv2.search_rollup(st, val, "GA", "2025-01")
        assert mat.columns == live.columns, (st, mat.columns, live.columns)
        assert norm(mat.collect()) == norm(live.collect()), (st, val)
    plan = mv2.search_rollup("payer", "aetna", "GA", "2025-01")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters: [" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "state" in pf and "year_month" in pf, pf

    mv3 = mv_lake.materialize_category_stats(str(tmp_path / "stats_mv"))
    live = api.lake.category_statistics("GA", "2025-01")
    mat = mv3.category_statistics("GA", "2025-01")
    assert mat.columns == live.columns, (mat.columns, live.columns)
    assert norm(mat.collect()) == norm(live.collect())
    splan = mat._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in splan
    # an out-of-lake scope serves the SAME one-row-of-zeros shape as the
    # live path (a point-read caller indexes row [0])
    live_absent = api.lake.category_statistics("ZZ", "1999-01").collect()
    mv_absent = mv3.category_statistics("ZZ", "1999-01").collect()
    assert len(live_absent) == len(mv_absent) == 1
    assert norm(mv_absent) == norm(live_absent)

    # availability (value-grain) MVs: MV == live per category; drill-down
    # requests (source=) must FALL BACK to the live path unchanged
    mv4 = mv_lake.materialize_category_rollups(str(tmp_path / "cat_mv"))
    for cat in ("payer", "procedure", "organization"):
        live = api.lake.category_rollup("GA", "2025-01", cat)
        mat = mv4.category_rollup("GA", "2025-01", cat)
        assert mat.columns == live.columns, (cat, mat.columns)
        assert norm(mat.collect()) == norm(live.collect()), cat
    live_dd = api.lake.category_rollup(
        "GA", "2025-01", "procedure", source=("payer", "Aetna Inc")
    )
    mv_dd = mv4.category_rollup(
        "GA", "2025-01", "procedure", source=("payer", "Aetna Inc")
    )
    assert norm(mv_dd.collect()) == norm(live_dd.collect())


def test_ilike_wildcards_are_literal_on_both_tiers(spark, tmp_path):
    """ADVICE r10: a user '%'/'_' in a search value must match LITERALLY
    on BOTH serving tiers — the fast path (contains on stored _lc_
    columns) can only be literal, and the MV rollup tier's ilike
    fallback now escapes (plans/queries.like_literal), so the same
    endpoint returns the same rows whichever tier answers. Probes: a
    payer name containing both wildcard characters matches itself and
    ONLY itself; a wildcard-shaped probe ('Ae%na') matches nothing."""
    from mrf_etl_spark.plans.queries import like_literal

    assert like_literal("100% a_b\\c") == "100\\% a\\_b\\\\c"

    fact = spark.createDataFrame(
        [
            ("f1", "GA", "2025-01", "pct", "professional", "CPT", "99213",
             "pg1", 100.0, "100% Health_Plan Inc"),
            ("f2", "GA", "2025-01", "aetna", "professional", "CPT", "99213",
             "pg1", 200.0, "Aetna Inc"),
            ("f3", "GA", "2025-01", "xhp", "professional", "CPT", "99213",
             "pg1", 300.0, "100X HealthYPlan Inc"),
        ],
        "fact_uid string, state string, year_month string, payer_slug string, "
        "billing_class string, code_type string, code string, pg_uid string, "
        "negotiated_rate double, reporting_entity_name string",
    ).select(
        "*",
        F.lit("negotiated").alias("negotiated_type"),
        F.lit("ffs").alias("negotiation_arrangement"),
        F.lit("9999-12-31").alias("expiration_date"),
    )
    lake = StarLake(fact=fact)

    def payers(lk, value):
        return sorted(
            r.reporting_entity_name
            for r in lk.search_rollup("payer", value, "GA", "2025-01")
            .select("reporting_entity_name")
            .collect()
        )

    mv2 = lake.materialize_search_index(
        str(tmp_path / "idx")
    ).materialize_search_rollups(str(tmp_path / "mv2"), ["payer"])
    for lk in (lake, mv2):
        # literal value with % and _ matches exactly its own row — were
        # the wildcards live, '100% Health_Plan' would ALSO match
        # '100X HealthYPlan' ('%'→any run, '_'→any char)
        assert payers(lk, "100% Health_Plan") == ["100% Health_Plan Inc"]
        # a wildcard-shaped probe matches nothing (no literal substring)
        assert payers(lk, "Ae%na") == []
        assert payers(lk, "Aetna") == ["Aetna Inc"]
