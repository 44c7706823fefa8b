"""Deterministic surrogate-key expressions.

Parity contract (reference: prod_etl/ETL_1.py:76-199, notebook.py:106-111,
prod_etl/utils/utils_nppes.py:176-188):

  * nulls serialize as ""            (`_co()` helper, ETL_1.py:87)
  * fields join with "|"             (ETL_1.py:168-199)
  * negotiated_rate formats "%.4f"   (ETL_1.py:179-182)
  * empty POS set hashes md5("none") (ETL_1.py:148-165)
  * md5 → lowercase hex digest

These keys drive idempotent upsert: byte-for-byte parity is required, so
every recipe here has a hand-computed golden in tests/test_hashing.py.

All expressions are native (md5/concat_ws/coalesce) — at 100 TB the uid
mint is a per-row projection inside whole-stage codegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def nz(col: ColumnOrName) -> Column:
    """null → "" (the reference's `_co`); everything else → string."""
    return F.coalesce(_c(col).cast("string"), F.lit(""))


def rate_4f(col: ColumnOrName, exact_cpython: bool = False) -> Column:
    """Rate serialized as %.4f, null → "" (ETL_1.py:179-182).

    Fast path (default) uses JVM `format_string`, which rounds via the
    double's shortest decimal repr (HALF_UP) — IDENTICAL to CPython's
    printf for every value whose shortest repr has ≤4 decimals, which is
    all real negotiated rates (money). They diverge only for ≥5-decimal
    binary-inexact values (e.g. 54.12345 → Java "54.1235", CPython
    "54.1234", because CPython rounds the exact binary expansion).

    ``exact_cpython=True`` switches to an Arrow-batched pandas_udf with
    CPython's exact semantics — use when byte-level uid interop with a
    reference-produced (Python-written) lake is required. ~100× slower
    per column than the codegen path; still vectorized.
    """
    c = _c(col)
    if exact_cpython:
        return _rate_4f_cpython(c.cast("double"))
    return F.when(c.isNull(), F.lit("")).otherwise(
        F.format_string("%.4f", c.cast("double"))
    )


def _make_rate_4f_cpython():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: no type hints — `from __future__ import annotations` stringifies
    # them and pyspark's hint resolver can't see the local `pd` import; the
    # explicit Series->Series eval type is declared via the decorator instead.
    def _fmt(s):
        return s.map(lambda v: "" if pd.isna(v) else f"{v:.4f}")

    _fmt.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_fmt, "string")


_RATE4F_UDF = None


def _rate_4f_cpython(c: Column) -> Column:
    global _RATE4F_UDF
    if _RATE4F_UDF is None:
        _RATE4F_UDF = _make_rate_4f_cpython()
    return _RATE4F_UDF(c)


def md5_join(parts: list[Column], sep: str = "|") -> Column:
    """md5 of null-safe pipe-joined parts.

    NOTE: concat_ws *skips* null args rather than emitting an empty field,
    which would silently change the byte layout — so every part is
    null-coalesced before joining.
    """
    return F.md5(F.concat_ws(sep, *[F.coalesce(p.cast("string"), F.lit("")) for p in parts]))


def pg_uid(
    payer_slug: ColumnOrName,
    version: ColumnOrName,
    provider_group_id: ColumnOrName,
    provider_reference_id: ColumnOrName,
) -> Column:
    """Provider-group uid — md5(payer_slug|version|pgid|pref) (ETL_1.py:168-171)."""
    return md5_join([_c(payer_slug), _c(version), _c(provider_group_id), _c(provider_reference_id)])


# Field order of the fact grain (ETL_1.py:173-199). rate is injected as the
# %.4f-formatted 12th field.
FACT_UID_FIELDS = [
    "state",
    "year_month",
    "payer_slug",
    "billing_class",
    "code_type",
    "code",
    "pg_uid",
    "pos_set_id",
    "negotiated_type",
    "negotiation_arrangement",
    "expiration_date",
    # negotiated_rate (%.4f) goes here
    "provider_group_id_raw",
]


def fact_uid(cols: dict[str, ColumnOrName] | None = None) -> Column:
    """Fact-row uid over the 13-field grain (ETL_1.py:173-199).

    ``cols`` maps field name → Column; defaults to same-named columns of the
    input DataFrame. ``negotiated_rate`` is always read from the mapping (or
    the column of that name) and serialized %.4f.
    """
    cols = cols or {}

    def g(name: str) -> Column:
        return _c(cols.get(name, name))

    parts = [nz(g(f)) for f in FACT_UID_FIELDS[:11]]
    parts.append(rate_4f(g("negotiated_rate")))
    parts.append(nz(g("provider_group_id_raw")))
    return F.md5(F.concat_ws("|", *parts))


def pos_set_id(members: ColumnOrName) -> Column:
    """POS-set uid (ETL_1.py:148-165): null/empty list → md5("none"),
    else md5("|".join(members)) over the already-normalized member list."""
    m = _c(members)
    return F.when(
        m.isNull() | (F.size(m) == 0), F.md5(F.lit("none"))
    ).otherwise(
        F.md5(F.concat_ws("|", F.transform(m, lambda x: F.coalesce(x.cast("string"), F.lit("")))))
    )


def address_hash(
    address_purpose: ColumnOrName,
    address_type: ColumnOrName,
    address_1: ColumnOrName,
    address_2: ColumnOrName,
    city: ColumnOrName,
    state: ColumnOrName,
    postal_code: ColumnOrName,
    country_code: ColumnOrName,
) -> Column:
    """NPI address uid (utils_nppes.py:176-188)."""
    return md5_join(
        [
            _c(address_purpose),
            _c(address_type),
            _c(address_1),
            _c(address_2),
            _c(city),
            _c(state),
            _c(postal_code),
            _c(country_code),
        ]
    )
