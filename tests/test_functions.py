"""Golden tests for the exact-parity expression library.

Goldens are hand-computed in-test from the documented recipes (FIXTURES.md
§6, SURVEY §2.8): md5 over pipe-joined null→"" fields, %.4f rates,
md5("none") for empty POS sets, slugify collapse/strip, regex year_month.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mrf_etl_spark.functions import (
    address_hash,
    fact_uid,
    normalize_service_codes,
    nz,
    pg_uid,
    pos_set_id,
    rate_4f,
    slugify,
    year_month_from_string,
    zip5,
)
from mrf_etl_spark.functions.categorizer import categorize_columns


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def one(df, expr):
    return df.select(expr.alias("v")).collect()[0].v


def test_pg_uid_golden(spark):
    df = spark.createDataFrame(
        [("aetna", "1.0.0", None, "PR123")], "ps string, v string, pgid string, pref string"
    )
    got = one(df, pg_uid("ps", "v", "pgid", "pref"))
    assert got == md5("aetna|1.0.0||PR123")


def test_fact_uid_golden_and_rate_format(spark):
    row = dict(
        state="GA",
        year_month="2025-08",
        payer_slug="aetna",
        billing_class="professional",
        code_type="CPT",
        code="99213",
        pg_uid="abc",
        pos_set_id="def",
        negotiated_type="negotiated",
        negotiation_arrangement="ffs",
        expiration_date=None,
        negotiated_rate=123.5,
        provider_group_id_raw="42",
    )
    schema = (
        "state string, year_month string, payer_slug string, billing_class string,"
        " code_type string, code string, pg_uid string, pos_set_id string,"
        " negotiated_type string, negotiation_arrangement string, expiration_date string,"
        " negotiated_rate double, provider_group_id_raw string"
    )
    df = spark.createDataFrame([tuple(row.values())], schema)
    expected = md5(
        "GA|2025-08|aetna|professional|CPT|99213|abc|def|negotiated|ffs||123.5000|42"
    )
    assert one(df, fact_uid()) == expected

    # null rate serializes as "" (ETL_1.py:179-182)
    df2 = spark.createDataFrame([(None,)], "negotiated_rate double")
    assert one(df2, rate_4f("negotiated_rate")) == ""
    df3 = spark.createDataFrame([(0.07 + 0.1,)], "negotiated_rate double")
    assert one(df3, rate_4f("negotiated_rate")) == "0.1700"


def test_pos_set_id_empty_and_members(spark):
    df = spark.createDataFrame([(["11", "22"],), ([],), (None,)], "m array<string>")
    got = [r.v for r in df.select(pos_set_id("m").alias("v")).collect()]
    assert got == [md5("11|22"), md5("none"), md5("none")]


def test_address_hash_golden(spark):
    df = spark.createDataFrame(
        [("LOCATION", "DOM", "1 Main St", None, "Atlanta", "GA", "30301", "US")],
        "p string, t string, a1 string, a2 string, c string, s string, z string, cc string",
    )
    got = one(df, address_hash("p", "t", "a1", "a2", "c", "s", "z", "cc"))
    assert got == md5("LOCATION|DOM|1 Main St||Atlanta|GA|30301|US")


def test_slugify_variants(spark):
    df = spark.createDataFrame([("Aetna Life Insurance Company",)], "s string")
    assert one(df, slugify("s", "-")) == "aetna-life-insurance-company"
    assert one(df, slugify("s", "_")) == "aetna_life_insurance_company"
    df2 = spark.createDataFrame([("  ++Blue!! Cross&Shield__ ",)], "s string")
    assert one(df2, slugify("s", "-")) == "blue-cross-shield"


def test_year_month_regex_semantics(spark):
    # reference's strptime chain is dead code; regex is the behavior
    cases = {
        "2025-08-01": "2025-08",
        "2025/08/01": "2025-08",
        "2025-08": "2025-08",
        "202508": "",  # no separator → no match, as in the reference
        "junk": "",
        None: "",
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    got = {r.s: r.v for r in df.select("s", year_month_from_string("s").alias("v")).collect()}
    assert got == cases


def test_zip5(spark):
    df = spark.createDataFrame([("30301-1234",), ("301",), ("abc",), (None,)], "z string")
    got = [r.v for r in df.select(zip5("z").alias("v")).collect()]
    assert got == ["30301", "00301", None, None]


def test_normalize_service_codes(spark):
    cases = [
        ('["11","22"]', ["11", "22"]),
        ("11,22", ["11", "22"]),
        ("22|11|11", ["11", "22"]),
        ("[]", []),
        (None, []),
        ("11 22", ["11", "22"]),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "s string")
    got = [r.v for r in df.select(normalize_service_codes("s").alias("v")).collect()]
    assert got == [e for _, e in cases]
    # single-quoted JSON falls back to the split path (json.loads parity):
    # tokens keep quote garbage, exactly like ETL_1.py's re.split fallback
    df2 = spark.createDataFrame([("['02','11']",)], "s string")
    got2 = one(df2, normalize_service_codes("s"))
    assert got2 == sorted({"['02'", "'11']"})
    # notebook variant drops n/u/l garbage
    df3 = spark.createDataFrame([("n,u,l,11",)], "s string")
    assert one(df3, normalize_service_codes("s", garbage_filter=True)) == ["11"]


def test_nz(spark):
    df = spark.createDataFrame([(None, 5)], "a string, b int")
    assert one(df, nz("a")) == ""
    assert one(df, nz("b")) == "5"


def test_categorizer_boundaries(spark):
    cases = {
        "70559": ("Radiology", "Head and Neck Imaging", "Skull and Brain"),
        "70560": ("Radiology", "Head and Neck Imaging", "Spine and Neck"),
        "17999": ("Surgery", "Integumentary System", "Skin Procedures"),
        "18000": ("Surgery", "Integumentary System", "Breast Procedures"),
        "99215": ("Evaluation & Management", "Office Visits", "Outpatient E&M"),
        "99216": ("Evaluation & Management", "Other E&M", "General E&M"),
        "99091": ("Evaluation & Management", "Remote Monitoring", "Digital Health"),
        "G0008": ("HCPCS", "Medicare Specific", "G-Codes"),
        "IME01": ("HCPCS", "Facility Specific", "IME Codes"),
        "ABC": ("Unknown", "Unknown", "Unknown"),
        "01234": ("Other", "Miscellaneous", "Unspecified"),
        "85025": ("Pathology & Laboratory", "Hematology", "Blood Studies"),
        "93000": ("Medicine", "Cardiovascular", "Cardiac Procedures"),
        "97110": ("Medicine", "Physical Medicine", "Rehabilitation"),
    }
    df = spark.createDataFrame([(k,) for k in cases], "code string")
    cols = categorize_columns("code")
    rows = df.select(
        "code",
        cols["procedure_set"].alias("s"),
        cols["procedure_class"].alias("c"),
        cols["procedure_group"].alias("g"),
    ).collect()
    got = {r.code: (r.s, r.c, r.g) for r in rows}
    assert got == cases

    # the staged struct path (with_categories) must agree everywhere,
    # including on a non-trivial input EXPRESSION (the staging is exactly
    # what keeps that expression from being duplicated into every branch)
    from mrf_etl_spark.functions.categorizer import with_categories

    rows2 = with_categories(
        df.select(F.concat(F.lit(" "), F.col("code"), F.lit(" ")).alias("messy"), "code"),
        "messy",
    ).collect()
    got2 = {r.code: (r.procedure_set, r.procedure_class, r.procedure_group) for r in rows2}
    assert got2 == cases


def test_rate_4f_modes(spark):
    """Documented %.4f divergence: JVM shortest-repr HALF_UP vs CPython
    exact-binary — equal for <=4-decimal money, divergent at 5-decimal
    boundaries; exact_cpython mode matches CPython everywhere."""
    vals = [54.12345, 123.45675, 123.5, 7.25, 0.01, 19.9999, None]
    df = spark.createDataFrame([(v,) for v in vals], "r double")
    rows = df.select(
        "r",
        rate_4f("r").alias("fast"),
        rate_4f("r", exact_cpython=True).alias("exact"),
    ).collect()
    for r in rows:
        py = "" if r.r is None else f"{r.r:.4f}"
        assert r.exact == py  # exact mode == CPython always
        if r.r is None or r.r in (54.12345, 123.45675):
            continue  # known divergent 5-decimal cases (fast == HALF_UP)
        assert r.fast == py  # fast mode == CPython for money values
    fast = {r.r: r.fast for r in rows}
    assert fast[54.12345] == "54.1235"  # the documented JVM behavior
