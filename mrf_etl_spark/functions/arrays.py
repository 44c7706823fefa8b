"""Array normalization — messy MRF `service_codes` → clean sorted list.

Reference semantics (prod_etl/ETL_1.py:109-145 `normalize_service_codes`):
  input may be null, a real list, a JSON-ish string ('["11","22"]'), or a
  CSV-ish string ("11,22" / "11|22" / "11 22"); output is a sorted unique
  list of non-empty trimmed strings.

Parity notes:
  * Python json.loads REJECTS single-quoted strings ("['02','11']") and the
    reference then falls back to a regex split that keeps quote/bracket
    garbage in the tokens. Spark's from_json *accepts* single quotes by
    default, so we pass allowSingleQuotes=false to keep the same fallback
    path.
  * The notebook variant (notebook.py:48-64, 106-111) instead quote-swaps +
    drops ['n','u','l'] garbage; `garbage_filter=True` reproduces that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ColumnOrName = Column | str

_SPLIT_RE = r"[;,|\s]+"


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _clean_sorted(arr: Column) -> Column:
    cleaned = F.filter(
        F.transform(arr, lambda x: F.trim(F.coalesce(x.cast("string"), F.lit("")))),
        lambda x: x != "",
    )
    return F.array_sort(F.array_distinct(cleaned))


def normalize_service_codes(col: ColumnOrName, garbage_filter: bool = False) -> Column:
    """String/array column → sorted unique array<string> (ETL_1.py:109-145).

    null → []. JSON arrays parse (double-quoted only, like json.loads);
    anything else splits on `[;,|\\s]+`. With ``garbage_filter`` the
    notebook's 'n'/'u'/'l' tokens are dropped too (notebook.py:106-111).
    """
    s = F.trim(_c(col).cast("string"))
    parsed = F.from_json(s, T.ArrayType(T.StringType()), {"allowSingleQuotes": "false"})
    looks_json = s.startswith("[") & s.endswith("]")
    arr = (
        F.when(s.isNull(), F.array().cast("array<string>"))
        .when(looks_json & parsed.isNotNull(), parsed)
        .otherwise(F.split(s, _SPLIT_RE))
    )
    out = _clean_sorted(arr)
    if garbage_filter:
        out = F.filter(out, lambda x: ~F.lower(x).isin("n", "u", "l"))
    return out
