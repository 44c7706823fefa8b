"""Deterministic domain fixtures per FIXTURES.md — small rates/providers
batches with the messy value domains the reference tolerates (mixed date
formats, garbage service_codes, null keys, boundary CPT codes)."""

from __future__ import annotations

import random

BOUNDARY_CODES = [
    "10121", "17999", "18000", "33216", "43239", "70450", "70559", "70560",
    "72110", "73721", "76499", "76500", "77001", "80053", "85025", "93000",
    "97110", "99213", "99215", "99284", "G0008", "G0463", "IME01", "ABC",
]
SERVICE_CODE_VARIANTS = ['["11","22"]', "['02','11']", "11,22", "[]", None, "11 22"]
DATE_VARIANTS = ["2025-08-01", "2025/08/01", "2025-08", "202508"]


def rates_rows(n: int = 400, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # money-realistic 2/4-decimal rates; the 5-decimal %.4f rounding
        # edge has its own dedicated test (test_functions.test_rate_4f_modes)
        rate = round(rng.lognormvariate(4, 1.2), rng.choice([2, 4]))
        rows.append(
            {
                "last_updated_on": DATE_VARIANTS[i % len(DATE_VARIANTS)],
                "reporting_entity_name": "Aetna Life Insurance Company",
                "reporting_entity_type": "Insurer",
                "version": rng.choice(["1.0.0", None, ""]),
                "billing_class": rng.choice(["professional", "institutional"]),
                "billing_code_type": rng.choice(["CPT"] * 8 + ["HCPCS", "REV"]),
                "billing_code": BOUNDARY_CODES[i % len(BOUNDARY_CODES)],
                "service_codes": SERVICE_CODE_VARIANTS[i % len(SERVICE_CODE_VARIANTS)],
                "negotiated_type": rng.choice(["negotiated", "fee schedule"]),
                "negotiation_arrangement": "ffs",
                "negotiated_rate": rate,
                "expiration_date": rng.choice(["9999-12-31"] * 7 + ["2026-01-01"] * 3),
                "description": f"desc {i}",
                "name": f"name {i}",
                "provider_reference_id": f"PR{i % 50}" if i % 11 else None,
                "provider_group_id": None,
            }
        )
    return rows


def provider_rows(n_groups: int = 50, seed: int = 43) -> list[dict]:
    """One provider-file row set per (version, group) combination seen in the
    rates file — pg_uid is minted from (payer_slug, version, provider_group_id,
    provider_reference_id) on BOTH sides (ETL_1.py:276,334), so the provider
    batch must carry the same key tuple for xrefs to resolve."""
    rng = random.Random(seed)
    rows = []
    for g in range(n_groups):
        for version in ["1.0.0", None, ""]:
            for j in range(rng.randint(1, 3)):
                rows.append(
                    {
                        "last_updated_on": "2025-08-01",
                        "reporting_entity_name": "Aetna Life Insurance Company",
                        "reporting_entity_type": "Insurer",
                        "version": version,
                        "provider_group_id": None,
                        "provider_reference_id": f"PR{g}",
                        "npi": f"1{g:04d}{j:05d}",
                        "tin_type": "ein",
                        "tin_value": f"9{g:08d}",
                    }
                )
    return rows


def make_raw_frames(spark):
    from mrf_etl_spark import schemas

    rates = spark.createDataFrame(
        [tuple(r[f.name] for f in schemas.RATES_RAW.fields) for r in rates_rows()],
        schemas.RATES_RAW,
    )
    prov = spark.createDataFrame(
        [tuple(r[f.name] for f in schemas.PROVIDERS_RAW.fields) for r in provider_rows()],
        schemas.PROVIDERS_RAW,
    )
    return rates, prov
