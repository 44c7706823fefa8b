"""Benchmark builder + J7 joiner tests: hand-computed rate goldens for all
three formulas, cross-product coverage, class-split join semantics, and the
SQLite source round-trip (S6)."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F

from mrf_etl_spark.io.readers import read_sqlite
from mrf_etl_spark.plans.benchmarks import (
    ASC_CF,
    OPPS_CF,
    build_asc,
    build_comprehensive,
    build_opps,
    build_professional,
    coverage_stats,
    join_benchmarks,
    state_wage_index_averages,
)


@pytest.fixture(scope="module")
def ref_tables(spark):
    rvu = spark.createDataFrame(
        [("99213", 0.97, 1.01, 0.07), ("70450", 0.85, 4.20, 0.05), ("99215", 2.11, 1.91, 0.14)],
        "procedure_code string, work_rvu double, practice_expense_rvu double, malpractice_rvu double",
    )
    gpci = spark.createDataFrame(
        [("01", 1.0, 1.1, 0.9), ("02", 1.2, 0.9, 1.1), ("03", 1.0, 1.0, 1.0)],
        "locality_code string, work_gpci double, pe_gpci double, mp_gpci double",
    )
    meta = spark.createDataFrame(
        [("GA ATLANTA", "01"), ("GA REST OF STATE", "02"), ("FL MIAMI", "03")],
        "state_name string, locality_code string",
    )
    cf = spark.createDataFrame([(32.3465,)], "conversion_factor double")
    opps_b = spark.createDataFrame(
        [("99213 ", 1.5, "J1", "desc a"), ("G0463", 2.0, "Q3", "desc b")],
        "hcpcs string, rel_wt double, si string, short_desc string",
    )
    asc_aa = spark.createDataFrame(
        [("99213", "A2", 100.0, "asc a"), ("G0463", "P3", 250.0, "asc b")],
        "hcpcs string, asc_ind string, nat_rate double, short_desc string",
    )
    wi = spark.createDataFrame(
        [("12060", "GA", 0.95, 0), ("42340", "ga", 1.05, 0), ("99999", "GA", 5.0, 1), ("33100", "FL", 1.0, None)],
        "cbsa string, state string, wage_index double, is_state_rural int",
    )
    return dict(rvu=rvu, gpci=gpci, meta=meta, cf=cf, opps_b=opps_b, asc_aa=asc_aa, wi=wi)


def test_professional_golden(spark, ref_tables):
    t = ref_tables
    bench = build_professional(t["rvu"], t["gpci"], t["meta"], t["cf"], year=2025)
    # cross product: 2 states (GA, FL) x 3 codes
    assert bench.count() == 6
    row = bench.filter((F.col("state") == "GA") & (F.col("code") == "99213")).first()
    # GA gpci = mean of localities 01,02 -> work 1.1, pe 1.0, mp 1.0
    exp_state = (0.97 * 1.1 + 1.01 * 1.0 + 0.07 * 1.0) * 32.3465
    assert row.medicare_prof_stateavg == pytest.approx(exp_state, rel=1e-12)
    # national gpci = mean over all 3 localities
    nw, npe, nmp = (1.0 + 1.2 + 1.0) / 3, (1.1 + 0.9 + 1.0) / 3, (0.9 + 1.1 + 1.0) / 3
    exp_nat = (0.97 * nw + 1.01 * npe + 0.07 * nmp) * 32.3465
    assert row.medicare_prof_national == pytest.approx(exp_nat, rel=1e-12)
    assert row.year_month == "2025-01" and row.code_type == "CPT"


def test_wage_index_excludes_rural_and_uppercases(spark, ref_tables):
    avg = {r.state: r.state_wage_index_avg for r in state_wage_index_averages(ref_tables["wi"]).collect()}
    # GA: (0.95 + 1.05)/2, rural row (wi=5.0) excluded; 'ga' uppercased in
    assert avg["GA"] == pytest.approx(1.0)
    assert avg["FL"] == pytest.approx(1.0)  # null is_state_rural kept


def test_opps_asc_golden(spark, ref_tables):
    t = ref_tables
    opps = build_opps(t["opps_b"], t["wi"], year=2025)
    row = opps.filter((F.col("state") == "GA") & (F.col("code") == "99213")).first()
    assert row.medicare_opps_national == pytest.approx(1.5 * OPPS_CF)
    assert row.medicare_opps_stateavg == pytest.approx(1.5 * OPPS_CF * (0.60 * 1.0 + 0.40))
    # hcpcs normalization: '99213 ' (trailing space) matched via trim/upper
    assert row.opps_si == "J1"

    asc = build_asc(t["asc_aa"], t["wi"], year=2025)
    row = asc.filter((F.col("state") == "GA") & (F.col("code") == "G0463")).first()
    assert row.medicare_asc_national == pytest.approx(250.0)
    assert row.medicare_asc_stateavg == pytest.approx(250.0 * (0.50 * 1.0 + 0.50))
    assert ASC_CF == 54.895  # constant parity with settings.py:60-68

    comp = build_comprehensive(build_professional(t["rvu"], t["gpci"], t["meta"], t["cf"]), opps, asc)
    assert comp.count() == 6 + opps.count() + asc.count()
    assert set(r.benchmark_type for r in comp.select("benchmark_type").distinct().collect()) == {
        "professional", "opps", "asc",
    }


def test_join_benchmarks_class_split(spark, ref_tables):
    t = ref_tables
    prof = build_professional(t["rvu"], t["gpci"], t["meta"], t["cf"])
    opps = build_opps(t["opps_b"], t["wi"])
    asc = build_asc(t["asc_aa"], t["wi"])
    # OPPS/ASC benches are HCPCS/CPT-typed; craft fact rows matching each
    fact = spark.createDataFrame(
        [
            ("GA", "2025-01", "CPT", "99213", "professional", 120.0),
            ("GA", "2025-01", "HCPCS", "99213", "institutional", 400.0),
            ("GA", "2025-01", "CPT", "99213", "institutional", 150.0),
            ("GA", "2025-01", "CPT", "99999", "professional", 50.0),  # no bench
            ("GA", "2025-01", "CPT", "99213", "dental", 70.0),  # passthrough
        ],
        "state string, year_month string, code_type string, code string, billing_class string, rate double",
    )
    out = join_benchmarks(fact, prof, opps, asc)
    assert out.count() == 5  # no row multiplication

    rows = {(r.billing_class, r.code_type, r.code, r.rate): r for r in out.collect()}
    p = rows[("professional", "CPT", "99213", 120.0)]
    exp = (0.97 * 1.1 + 1.01 * 1.0 + 0.07 * 1.0) * 32.3465
    assert p.pct_of_medicare == pytest.approx(120.0 / exp)

    i_opps = rows[("institutional", "HCPCS", "99213", 400.0)]
    assert i_opps.pct_of_medicare_opps == pytest.approx(400.0 / (1.5 * OPPS_CF * 1.0))
    assert i_opps.benchmark_type == "institutional"

    i_asc = rows[("institutional", "CPT", "99213", 150.0)]
    assert i_asc.pct_of_medicare_asc == pytest.approx(150.0 / (100.0 * 1.0))
    assert i_asc.pct_of_medicare_opps is None  # OPPS bench is HCPCS-typed

    unmatched = rows[("professional", "CPT", "99999", 50.0)]
    assert unmatched.pct_of_medicare is None  # null bench -> null pct, no div error
    assert rows[("dental", "CPT", "99213", 70.0)].pct_of_medicare is None  # passthrough

    stats = coverage_stats(out).first()
    assert stats.total_rows == 5
    assert stats.professional_rows == 2 and stats.professional_benchmarked == 1  # 99999 has no bench
    assert stats.institutional_rows == 2 and stats.institutional_benchmarked == 2


def test_read_sqlite_source(spark):
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    try:
        with sqlite3.connect(path) as conn:
            conn.execute("CREATE TABLE cms_rvu (procedure_code TEXT, work_rvu REAL, modifier TEXT)")
            conn.executemany(
                "INSERT INTO cms_rvu VALUES (?,?,?)",
                [("99213", 0.97, None), ("70450", 0.85, "26"), ("99215", 2.11, None)],
            )
        df = read_sqlite(spark, path, "cms_rvu", where="modifier IS NULL")
        rows = {r.procedure_code: r.work_rvu for r in df.collect()}
        assert rows == {"99213": 0.97, "99215": 2.11}
    finally:
        os.unlink(path)
