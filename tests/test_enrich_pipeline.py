"""Wide-table pipeline tests: phase-by-phase column contract (renames,
drops, suffixing), GA-WC coalesce direction, state filter via NPPES state,
categorizer columns, and end-to-end with benchmark join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrf_etl_spark.plans.enrich_pipeline import (
    PipelineConfig,
    extract_and_merge,
    merge_ga_wc,
    rename_columns,
    run_pipeline,
)


@pytest.fixture(scope="module")
def inputs(spark):
    rates = spark.createDataFrame(
        [
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR1", "99213", "CPT", "professional", 120.0, "2026-01-01", "Office visit"),
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR1", "70450", "CPT", "institutional", 400.0, "2026-01-01", "CT head"),
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR2", "99215", "CPT", "professional", 210.0, "2026-01-01", "Office visit ext"),
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR3", "G0008", "HCPCS", "professional", 25.0, "2026-01-01", "Flu shot admin"),
        ],
        "last_updated_on string, reporting_entity_name string, reporting_entity_type string, "
        "version string, provider_reference_id string, billing_code string, billing_code_type string, "
        "billing_class string, negotiated_rate double, expiration_date string, description string",
    )
    providers = spark.createDataFrame(
        [
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR1", "1111111111"),
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR2", "2222222222"),
            ("2025-08-01", "Aetna", "Insurer", "1.0", "PR3", "3333333333"),
        ],
        "last_updated_on string, reporting_entity_name string, reporting_entity_type string, "
        "version string, provider_group_id string, npi string",
    )
    dim_npi = spark.createDataFrame(
        [
            ("1111111111", "CLINIC A", "GA"),
            ("2222222222", "CLINIC B", "GA"),
            ("3333333333", "CLINIC C", "FL"),  # filtered out by state
        ],
        "npi string, org_name string, state string",
    )
    ga_wc = spark.createDataFrame(
        [("99213", 150.0, None, None, "x"), ("70450", None, 500.0, 450.0, "y")],
        "CODE string, `PROF MAR` double, `OP MAR` double, `ASC MAR` double, MOD string",
    )
    return rates, providers, dim_npi, ga_wc


def test_extract_and_merge_suffixes(spark, inputs):
    rates, providers, *_ = inputs
    merged = extract_and_merge(rates, providers)
    # pandas-merge suffix semantics on the 4 overlapping columns
    for c in ["last_updated_on", "reporting_entity_name", "reporting_entity_type", "version"]:
        assert f"{c}_x" in merged.columns and f"{c}_y" in merged.columns
    assert merged.count() == 4  # left join keeps all rates rows
    renamed = rename_columns(merged)
    assert "payer" in renamed.columns and "rate" in renamed.columns
    assert "prov_npi" in renamed.columns  # npi from providers side


def test_merge_ga_wc_coalesce_direction(spark, inputs):
    df = spark.createDataFrame(
        [("99213", 999.0), ("70450", None), ("88888", None)],
        "billing_code string, GA_PROF_MAR double",
    ).withColumn("GA_OP_MAR", F.lit(None).cast("double")).withColumn(
        "GA_ASC_MAR", F.lit(None).cast("double")
    )
    out = merge_ga_wc(df, inputs[3])
    got = {r.billing_code: (r.GA_PROF_MAR, r.GA_OP_MAR, r.GA_ASC_MAR) for r in out.collect()}
    # combine_first: src (fee schedule) wins where non-null, dest kept otherwise
    assert got["99213"] == (150.0, None, None)
    assert got["70450"] == (None, 500.0, 450.0)
    assert got["88888"] == (None, None, None)
    assert "CODE" not in out.columns and "MOD" not in out.columns  # temps dropped


def test_run_pipeline_end_to_end(spark, inputs, tmp_path):
    rates, providers, dim_npi, ga_wc = inputs
    from tests.test_benchmarks import ref_tables  # reuse fixture factory logic

    # build tiny benches inline (same shapes as test_benchmarks)
    from mrf_etl_spark.plans.benchmarks import build_asc, build_opps, build_professional

    rvu = spark.createDataFrame(
        [("99213", 0.97, 1.01, 0.07)],
        "procedure_code string, work_rvu double, practice_expense_rvu double, malpractice_rvu double",
    )
    gpci = spark.createDataFrame(
        [("01", 1.0, 1.0, 1.0)], "locality_code string, work_gpci double, pe_gpci double, mp_gpci double"
    )
    meta = spark.createDataFrame([("GA ATLANTA", "01")], "state_name string, locality_code string")
    cf = spark.createDataFrame([(32.0,)], "conversion_factor double")
    wi = spark.createDataFrame(
        [("12060", "GA", 1.0, 0)], "cbsa string, state string, wage_index double, is_state_rural int"
    )
    opps_b = spark.createDataFrame([("70450", 2.0, "J1", "d")], "hcpcs string, rel_wt double, si string, short_desc string")
    asc_aa = spark.createDataFrame([("70450", "A2", 100.0, "d")], "hcpcs string, asc_ind string, nat_rate double, short_desc string")
    benches = (
        build_professional(rvu, gpci, meta, cf, year=2025),
        build_opps(opps_b, wi, year=2025),
        build_asc(asc_aa, wi, year=2025),
    )

    out = run_pipeline(
        spark,
        rates,
        providers,
        dim_npi=dim_npi,
        ga_wc=ga_wc,
        benches=benches,
        cfg=PipelineConfig(target_state="GA", billing_codes={"99213", "70450", "99215"}),
        output_path=str(tmp_path / "wide"),
    )
    rows = {r.billing_code: r for r in out.collect()}
    # G0008 dropped by billing-code filter; PR3/FL dropped by state filter
    assert set(rows) == {"99213", "70450", "99215"}
    # renames applied, drop list applied
    assert "payer" in out.columns and "negotiated_rate" not in out.columns
    assert "expiration_date" not in out.columns and "version_x" not in out.columns
    # NPPES join brought provider org + state
    assert rows["99213"].org_name == "CLINIC A" and rows["99213"].state == "GA"
    # GA WC coalesce
    assert rows["99213"].GA_PROF_MAR == 150.0
    assert rows["70450"].GA_OP_MAR == 500.0
    # categorizer
    assert rows["99213"].procedure_set == "Evaluation & Management"
    assert rows["70450"].procedure_set == "Radiology"
    # benchmark join: professional row got pct_of_medicare
    exp_bench = (0.97 * 1.0 + 1.01 * 1.0 + 0.07 * 1.0) * 32.0
    # year_month derives from rate_updated_on (2025-08) but benches are
    # 2025-01 -> no match; verify the column exists and is null, then
    # verify a direct-keyed join works
    assert "pct_of_medicare" in out.columns
    assert rows["99213"].pct_of_medicare is None

    out2 = run_pipeline(
        spark,
        rates.withColumn("last_updated_on", F.lit("2025-01-15")),
        providers,
        dim_npi=dim_npi,
        ga_wc=ga_wc,
        benches=benches,
        cfg=PipelineConfig(target_state="GA", billing_codes={"99213", "70450", "99215"}),
    )
    rows2 = {r.billing_code: r for r in out2.collect()}
    assert rows2["99213"].pct_of_medicare == pytest.approx(120.0 / exp_bench)
    # institutional 70450 is CPT-typed: misses the HCPCS-typed OPPS bench,
    # matches the CPT-typed ASC bench (faithful to the reference key)
    assert rows2["70450"].pct_of_medicare_opps is None
    assert rows2["70450"].pct_of_medicare_asc == pytest.approx(400.0 / 100.0)


def test_taxonomy_whitelist_and_dim_code_cat(spark):
    from mrf_etl_spark.plans.enrich_pipeline import build_dim_code_cat, filter_taxonomy_whitelist

    df = spark.createDataFrame(
        [("Internal Medicine Physician",), ("Chiropractor",), (None,)],
        "primary_taxonomy_desc string",
    )
    out = filter_taxonomy_whitelist(df, ["internal medicine", "orthopedic"])
    assert out.count() == 1  # null-safe, case-insensitive contains
    assert filter_taxonomy_whitelist(df, []).count() == 3  # empty -> passthrough

    xw = spark.createDataFrame(
        [("99213", "E&M", "Office", "Established", "x"), ("99213", "E&M", "Office", "Established", "y")],
        "HCPCS string, Level1 string, Level2 string, Level3 string, BETOS_20 string",
    )
    cat = build_dim_code_cat(xw)
    assert cat.columns == ["proc_cd", "proc_set", "proc_class", "proc_group"]
    assert cat.count() == 1  # deduped on proc_cd
