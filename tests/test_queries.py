"""Query/API-layer tests over a hand-built StarLake: J8 star-join
semantics (LOCATION-only address, search text), endpoint filters/caps,
coalesced code descriptions, funnel staging, and the market-rates rollup
materialization."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from mrf_etl_spark.plans.queries import StarLake, build_filter


@pytest.fixture(scope="module")
def lake(spark):
    fact = spark.createDataFrame(
        [
            ("f1", "GA", "2025-01", "aetna", "professional", "CPT", "99213", "pg1", 100.0, "Aetna Inc"),
            ("f2", "GA", "2025-01", "aetna", "professional", "CPT", "99215", "pg1", 200.0, "Aetna Inc"),
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
    dim_code_cat = spark.createDataFrame(
        [("99213", "E&M", "Office", "Established")],
        "proc_cd string, proc_set string, proc_class string, proc_group string",
    )
    dim_npi = spark.createDataFrame(
        [
            ("n1", "ACME CLINIC", None, None, "Internal Medicine", "NPI-2", "A"),
            ("n2", None, "JANE", "DOE", "Surgery", "NPI-1", "A"),
        ],
        "npi string, organization_name string, first_name string, last_name string, "
        "primary_taxonomy_desc string, enumeration_type string, status string",
    )
    dim_npi_address = spark.createDataFrame(
        [
            ("n1", "LOCATION", "ATLANTA", "GA", "30301"),
            ("n1", "MAILING", "NOWHERE", "TX", "75001"),
            ("n2", "LOCATION", "SAVANNAH", "GA", "31401"),
        ],
        "npi string, address_purpose string, city string, state string, postal_code string",
    )
    xref_npi = spark.createDataFrame([("pg1", "n1"), ("pg2", "n2")], "pg_uid string, npi string")
    xref_tin = spark.createDataFrame(
        [("pg1", "ein", "91-111"), ("pg2", "ein", "91-222")], "pg_uid string, tin_type string, tin_value string"
    )
    return StarLake(
        fact=fact,
        dim_code=dim_code,
        dim_code_cat=dim_code_cat,
        dim_npi=dim_npi,
        dim_npi_address=dim_npi_address,
        xref_npi=xref_npi,
        xref_tin=xref_tin,
    )


def test_search_index_star_join(lake):
    idx = lake.search_index()
    rows = {r.fact_uid: r for r in idx.collect()}
    # pg3 has no xref -> null provider side but row survives (LEFT joins)
    assert rows["f5"].npi is None and rows["f5"].city is None
    # LOCATION-only address (MAILING row must not leak or duplicate)
    assert rows["f1"].city == "ATLANTA" and rows["f1"].provider_state == "GA"
    assert idx.count() == 5  # 1:1 xrefs -> no fanout
    # categorization joined on code=proc_cd
    assert rows["f1"].proc_class == "Office" and rows["f4"].proc_class is None
    # search text: lowercase concat includes org, taxonomy, code, payer name
    assert "acme clinic" in rows["f1"].full_search_text
    assert "internal medicine" in rows["f1"].full_search_text
    assert "99213" in rows["f1"].full_search_text


def test_multi_field_search(lake):
    pred = build_filter(eq={"state": "GA"}, between={"negotiated_rate": (100.0, 350.0)})
    out = lake.multi_field_search(pred=pred, free_text="acme").collect()
    assert [r.fact_uid for r in out] == ["f2", "f1"]  # rate desc, pg1 only
    assert lake.multi_field_search(limit=2).count() == 2  # cap honored


def test_rate_summary_exact_median(lake):
    row = lake.rate_summary(pred=F.col("state") == "GA").first()
    assert row.rate_count == 4
    assert row.median_rate == round(statistics.median([100.0, 200.0, 300.0, 400.0]), 2)
    assert row.unique_codes == 3 and row.unique_payers == 2


def test_rates_by_procedure_code_desc_coalesce(lake):
    rows = {r.code: r for r in lake.rates_by_procedure().collect()}
    assert rows["99213"].code_desc == "Office visit"
    assert rows["70450"].code_desc == "70450"  # null description -> code itself
    assert rows["99213"].rate_count == 3


def test_meta_endpoints(lake):
    avail = {(r.state, r.year_month): r.rate_count for r in lake.availability_matrix().collect()}
    assert avail[("GA", "2025-01")] == 3 and avail[("FL", "2025-01")] == 1

    stats = lake.dashboard_statistics().first()
    assert stats.total_rates == 5 and stats.payers == 2 and stats.states == 2

    dims = lake.dimension_values("payer_slug").collect()
    assert dims[0].facet == "aetna" and dims[0].n == 3

    dd = {r.payer_slug: r.rate_count for r in lake.drilldown({"state": "GA"}, "payer_slug").collect()}
    assert dd == {"aetna": 2, "uhc": 2}

    ac = lake.autocomplete("code", "992").collect()
    assert [r.value for r in ac] == ["99213", "99215"]


def test_staged_funnel(lake):
    stages = lake.staged_funnel([("billing_class", "professional"), ("payer_slug", None)])
    assert len(stages) == 2
    s1 = {r.facet: r.n for r in stages[0].collect()}
    assert s1 == {"professional": 4, "institutional": 1}
    s2 = {r.facet: r.n for r in stages[1].collect()}
    assert s2 == {"aetna": 3, "uhc": 1}  # filtered to professional


def test_market_rates_materialize(lake, tmp_path):
    rolled = lake.market_rates()
    cell = rolled.filter((F.col("code") == "99213") & (F.col("state") == "GA") & (F.col("payer_slug") == "aetna")).first()
    assert cell.p50 == 100.0 and cell.npi_count == 1 and cell.tin_count == 1

    path = str(tmp_path / "agg_market_rates")
    served = lake.materialize_market_rates(path)
    assert served.count() == rolled.count()
    import os

    assert any(d.startswith("state=") for d in os.listdir(path))  # partition pruning layout


def test_market_rates_head_matches_full_order_limit(lake, tmp_path):
    """The pre-ranked serving head (VERDICT r7 #5) must return, per
    state, EXACTLY the full MV's ORDER BY p50 DESC, code LIMIT k — the
    deterministic presentation order the dashboard page fetch uses —
    while storing only k rows per state partition."""
    import os

    mr_path = str(tmp_path / "mr")
    head_path = str(tmp_path / "mr_head")
    mr = lake.materialize_market_rates(mr_path)
    k = 2
    head = lake.materialize_market_rates_head(mr, head_path, k=k)
    assert any(d.startswith("state=") for d in os.listdir(head_path))
    for state in [r["state"] for r in mr.select("state").distinct().collect()]:
        want = (
            mr.filter(F.col("state") == state)
            .orderBy(F.col("p50").desc(), F.col("code"))
            .limit(k)
            .collect()
        )
        got = (
            head.filter(F.col("state") == state)
            .orderBy(F.col("p50").desc(), F.col("code"))
            .collect()
        )
        assert len(got) == min(k, mr.filter(F.col("state") == state).count())
        assert [(r["code"], r["p50"]) for r in got] == [
            (r["code"], r["p50"]) for r in want
        ]


def test_rate_detail_filters_and_shape(lake):
    rows = lake.rate_detail("GA", "2025-01").collect()
    assert [r.code for r in rows] == ["99213", "99215", "99213"]  # payer,code,rate order
    assert rows[0].payer_name == "Aetna Inc" and rows[0].code_desc == "Office visit"
    assert rows[0].negotiated_rate == 100.0
    # code without a dim description falls back to the code itself
    f4 = lake.rate_detail("GA", "2025-02").collect()
    assert f4[0].code_desc == "70450"
    # payer substring (case-insensitive) + billing-class filters compose
    assert lake.rate_detail("GA", "2025-01", payer="aetna").count() == 2
    assert lake.rate_detail("GA", "2025-01", billing_class="institutional").count() == 1
    assert lake.rate_detail("GA", "2025-01", code="99215").count() == 1
    assert lake.rate_detail("GA", "2025-01", limit=1).count() == 1


def test_rate_detail_tin_join(lake):
    got = lake.rate_detail("GA", "2025-01", tin_value="91-111").collect()
    assert {r.code for r in got} == {"99213", "99215"}  # pg1 facts only
    assert lake.rate_detail("GA", "2025-01", tin_value="91-222").count() == 1
    assert lake.rate_detail("GA", "2025-01", tin_value="no-such").count() == 0


def test_provider_search(lake):
    got = lake.provider_search("acme").collect()
    assert [r.npi for r in got] == ["n1"]
    assert got[0].enumeration_type == "NPI-2" and got[0].status == "A"
    # matches first/last name too, case-insensitively
    assert [r.npi for r in lake.provider_search("jane").collect()] == ["n2"]
    assert [r.npi for r in lake.provider_search("DOE").collect()] == ["n2"]
    assert lake.provider_search("zzz").count() == 0
    assert lake.provider_search("n", limit=1).count() == 1


def test_refresh_market_rates_incremental(lake, tmp_path):
    """Incremental refresh rewrites only the touched state's partition:
    other partitions' files stay byte-identical (not rewritten), and the
    refreshed partition reflects new fact rows."""
    import os

    path = str(tmp_path / "agg_mr")
    lake.materialize_market_rates(path)
    fl_dir = f"{path}/state=FL"
    before = {f: os.path.getmtime(f"{fl_dir}/{f}") for f in os.listdir(fl_dir)}

    # new GA-only batch: one more 99213 row shifts GA's cell stats
    extra = lake.fact.limit(0).unionByName(
        lake.fact.sparkSession.createDataFrame(
            [("f9", "GA", "2025-01", "aetna", "professional", "CPT", "99213",
              "pg1", 500.0, "Aetna Inc", "negotiated", "ffs", "9999-12-31")],
            lake.fact.schema,
        )
    )
    from mrf_etl_spark.plans.queries import StarLake

    lake2 = StarLake(fact=lake.fact.unionByName(extra), xref_npi=lake.xref_npi,
                     xref_tin=lake.xref_tin)
    served = lake2.refresh_market_rates(path, states=["GA"])

    after = {f: os.path.getmtime(f"{fl_dir}/{f}") for f in os.listdir(fl_dir)}
    assert before == after  # FL partition untouched
    from pyspark.sql import functions as F2

    ga = served.filter(
        (F2.col("state") == "GA") & (F2.col("code") == "99213")
        & (F2.col("payer_slug") == "aetna") & (F2.col("year_month") == "2025-01")
    ).first()
    assert ga["p90"] > 100.0  # new 500.0 rate visible in the refreshed cell
    assert served.filter(F2.col("state") == "FL").count() > 0  # FL still served
