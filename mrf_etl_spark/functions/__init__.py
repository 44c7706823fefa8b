"""Native Column-expression library.

Everything here is a pure `pyspark.sql.Column` expression (JVM-side,
whole-stage-codegen'd) — no Python UDFs. These are the exact-parity
building blocks: hash uids, slugify, date normalization, POS-set
normalization, and the CPT categorizer.
"""

from mrf_etl_spark.functions.hashing import (
    nz,
    md5_join,
    pg_uid,
    fact_uid,
    pos_set_id,
    address_hash,
    rate_4f,
)
from mrf_etl_spark.functions.text import slugify, code_norm, zip5, search_text
from mrf_etl_spark.functions.dates import (
    year_month_from_string,
    year_month_from_date,
    null_sentinel_date,
)
from mrf_etl_spark.functions.arrays import normalize_service_codes
from mrf_etl_spark.functions.categorizer import (
    categorize_expr,
    categorize_sql_case,
    CPT_RULES,
)

__all__ = [
    "nz",
    "md5_join",
    "pg_uid",
    "fact_uid",
    "pos_set_id",
    "address_hash",
    "rate_4f",
    "slugify",
    "code_norm",
    "zip5",
    "search_text",
    "year_month_from_string",
    "year_month_from_date",
    "null_sentinel_date",
    "normalize_service_codes",
    "categorize_expr",
    "categorize_sql_case",
    "CPT_RULES",
]
