"""Date normalization expressions.

The reference's `normalize_yymm` (prod_etl/ETL_1.py:95-107) *looks* like a
multi-format strptime chain, but its prefix-truncation makes every strptime
attempt fail (e.g. "%Y-%m-%d" truncates the input to 3 chars); the observed
semantics are exactly the regex fallback: first ``20YY[-/]MM`` occurrence →
"YYYY-MM", else "". We reproduce the *observed* semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def year_month_from_string(col: ColumnOrName) -> Column:
    """Messy date string → "YYYY-MM" (or "" when unparseable).

    Parity with ETL_1.py:95-107 observed behavior: regex `(20\\d{2})[-/](0[1-9]|1[0-2])`.
    Note "202508" (no separator) → "" in the reference, reproduced here.
    """
    s = _c(col).cast("string")
    y = F.regexp_extract(s, r"(20\d{2})[-/](0[1-9]|1[0-2])", 1)
    m = F.regexp_extract(s, r"(20\d{2})[-/](0[1-9]|1[0-2])", 2)
    return F.when((s.isNull()) | (y == ""), F.lit("")).otherwise(F.concat_ws("-", y, m))


def year_month_from_date(col: ColumnOrName) -> Column:
    """date/timestamp → "YYYY-MM" (prod_etl/notebook.py:130-135)."""
    return F.date_format(_c(col), "yyyy-MM")


def null_sentinel_date(col: ColumnOrName, sentinel: str = "9999-12-31") -> Column:
    """Sentinel "no expiration" date → null (notebook.py:137-138)."""
    c = _c(col)
    return F.when(c == sentinel, F.lit(None).cast("string")).otherwise(c.cast("string"))
