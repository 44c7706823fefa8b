"""String normalization expressions (reference §2.8 scalar functions)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def slugify(col: ColumnOrName, sep: str = "-") -> Column:
    """lower → collapse non-alnum runs to ``sep`` → strip leading/trailing.

    Two variants exist in the reference: sep="-" (prod_etl/ETL_1.py:79-84)
    and sep="_" (prod_etl/notebook.py:43, webapp/utils/data_queries.py:26-28);
    both share the collapse/strip recipe. null → null.
    """
    s = F.regexp_replace(F.lower(_c(col).cast("string")), "[^a-z0-9]+", sep)
    return F.regexp_replace(s, f"^[{sep}]+|[{sep}]+$", "")


def code_norm(col: ColumnOrName) -> Column:
    """strip + upper code normalization (rate_calculator.py:78,231)."""
    return F.upper(F.trim(_c(col).cast("string")))


def zip5(col: ColumnOrName) -> Column:
    """First 5-digit run, zero-padded (rate_calculator.py:55,98; main.py:453-456).

    Handles 9-digit ZIP+4, int-typed zips that lost leading zeros, and junk
    (→ null).
    """
    digits = F.regexp_extract(_c(col).cast("string"), r"(\d{1,5})", 1)
    return F.when(digits == "", F.lit(None)).otherwise(F.lpad(digits, 5, "0"))


def search_text(*cols: ColumnOrName) -> Column:
    """Lowercased concat_ws(' ') search blob (optimized_queries.py:66-71)."""
    return F.lower(F.concat_ws(" ", *[F.coalesce(_c(c).cast("string"), F.lit("")) for c in cols]))
