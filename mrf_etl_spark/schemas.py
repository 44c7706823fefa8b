"""Explicit StructTypes for every table in the star schema + raw inputs.

The reference is schema-tolerant on read (prod_etl/ETL_1.py:216-226) but its
*output* star schema is stable (prod_etl/Data_Schema.md:425-466,
webapp/WEBAPP_DATA_SCHEMA.md:41-243). We declare the stable schemas here and
implement tolerance as `io.readers.conform` instead of schema-on-read
guesswork — at 100 TB, schema drift must fail loudly at the conform step,
not 12 joins later.

Type discipline (SURVEY §1.2): codes/ids are strings even when
numeric-looking; money is double; `year_month` is "YYYY-MM" text.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


S = T.StringType()
D = T.DoubleType()
B = T.BooleanType()
TS = T.TimestampType()
ARR_S = T.ArrayType(T.StringType())

# ---------------------------------------------------------------- raw inputs

RATES_RAW = _schema(
    ("last_updated_on", S),
    ("reporting_entity_name", S),
    ("reporting_entity_type", S),
    ("version", S),
    ("billing_class", S),
    ("billing_code_type", S),
    ("billing_code", S),
    ("service_codes", S),  # messy string; normalized to array by ingest
    ("negotiated_type", S),
    ("negotiation_arrangement", S),
    ("negotiated_rate", D),
    ("expiration_date", S),
    ("description", S),
    ("name", S),
    ("provider_reference_id", S),
    ("provider_group_id", S),
)

PROVIDERS_RAW = _schema(
    ("last_updated_on", S),
    ("reporting_entity_name", S),
    ("reporting_entity_type", S),
    ("version", S),
    ("provider_group_id", S),
    ("provider_reference_id", S),
    ("npi", S),
    ("tin_type", S),
    ("tin_value", S),
)

# ------------------------------------------------------------- star schema

FACT_RATE = _schema(
    ("fact_uid", S),
    ("state", S),
    ("year_month", S),
    ("payer_slug", S),
    ("billing_class", S),
    ("code_type", S),
    ("code", S),
    ("pg_uid", S),
    ("pos_set_id", S),
    ("negotiated_type", S),
    ("negotiation_arrangement", S),
    ("negotiated_rate", D),
    ("expiration_date", S),
    ("provider_group_id_raw", S),
    ("reporting_entity_name", S),
)

DIM_CODE = _schema(("code_type", S), ("code", S), ("code_description", S), ("code_name", S))

DIM_CODE_CAT = _schema(("proc_cd", S), ("proc_set", S), ("proc_class", S), ("proc_group", S))

DIM_PAYER = _schema(("payer_slug", S), ("reporting_entity_name", S), ("version", S))

DIM_PROVIDER_GROUP = _schema(
    ("pg_uid", S), ("payer_slug", S), ("provider_group_id_raw", S), ("version", S)
)

DIM_POS_SET = _schema(("pos_set_id", S), ("pos_members", ARR_S))

XREF_POS = _schema(("pos_set_id", S), ("pos", S))

DIM_NPI = _schema(
    ("npi", S),
    ("enumeration_type", S),
    ("status", S),
    ("organization_name", S),
    ("first_name", S),
    ("last_name", S),
    ("credential", S),
    ("sole_proprietor", S),
    ("enumeration_date", S),
    ("last_updated", S),
    ("replacement_npi", S),
    ("nppes_fetched", B),
    ("nppes_fetch_date", S),
    ("primary_taxonomy_code", S),
    ("primary_taxonomy_desc", S),
    ("primary_taxonomy_state", S),
    ("primary_taxonomy_license", S),
)

DIM_NPI_ADDRESS = _schema(
    ("npi", S),
    ("address_purpose", S),
    ("address_type", S),
    ("address_1", S),
    ("address_2", S),
    ("city", S),
    ("state", S),
    ("postal_code", S),
    ("country_code", S),
    ("telephone_number", S),
    ("fax_number", S),
    ("last_updated", S),
    ("address_hash", S),
)

XREF_PG_MEMBER_NPI = _schema(("pg_uid", S), ("npi", S))

XREF_PG_MEMBER_TIN = _schema(("pg_uid", S), ("tin_type", S), ("tin_value", S))

# ------------------------------------------------------- benchmark tables

_BENCH_COMMON = [
    ("state", S),
    ("year_month", S),
    ("code_type", S),
    ("code", S),
]
_BENCH_TAIL = [
    ("benchmark_type", S),
    ("created_date", TS),
    ("data_year", T.LongType()),
]

BENCH_MEDICARE_PROFESSIONAL = _schema(
    *_BENCH_COMMON,
    ("medicare_prof_national", D),
    ("medicare_prof_stateavg", D),
    ("work_rvu", D),
    ("practice_expense_rvu", D),
    ("malpractice_rvu", D),
    ("conversion_factor", D),
    *_BENCH_TAIL,
)

BENCH_MEDICARE_OPPS = _schema(
    *_BENCH_COMMON,
    ("medicare_opps_national", D),
    ("medicare_opps_stateavg", D),
    ("opps_weight", D),
    ("opps_si", S),
    ("opps_short_desc", S),
    ("state_wage_index_avg", D),
    ("opps_adj_factor_stateavg", D),
    *_BENCH_TAIL,
)

BENCH_MEDICARE_ASC = _schema(
    *_BENCH_COMMON,
    ("asc_pi", S),
    ("asc_nat_rate", D),
    ("asc_short_desc", S),
    ("medicare_asc_national", D),
    ("medicare_asc_stateavg", D),
    ("asc_adj_factor_stateavg", D),
    *_BENCH_TAIL,
)

STAR_TABLES: dict[str, T.StructType] = {
    "fact_rate": FACT_RATE,
    "dim_code": DIM_CODE,
    "dim_code_cat": DIM_CODE_CAT,
    "dim_payer": DIM_PAYER,
    "dim_provider_group": DIM_PROVIDER_GROUP,
    "dim_pos_set": DIM_POS_SET,
    "xref_pos": XREF_POS,
    "dim_npi": DIM_NPI,
    "dim_npi_address": DIM_NPI_ADDRESS,
    "xref_pg_member_npi": XREF_PG_MEMBER_NPI,
    "xref_pg_member_tin": XREF_PG_MEMBER_TIN,
}

# Natural (dedup) key per star table — drives append-unique/upsert writers.
TABLE_KEYS: dict[str, list[str]] = {
    "fact_rate": ["fact_uid"],
    "dim_code": ["code_type", "code"],
    "dim_code_cat": ["proc_cd"],
    "dim_payer": ["payer_slug"],
    "dim_provider_group": ["pg_uid"],
    "dim_pos_set": ["pos_set_id"],
    "xref_pos": ["pos_set_id", "pos"],
    "dim_npi": ["npi"],
    "dim_npi_address": ["npi", "address_purpose", "address_hash"],
    "xref_pg_member_npi": ["pg_uid", "npi"],
    "xref_pg_member_tin": ["pg_uid", "tin_value"],
}
