"""The reference webapp's query vocabulary as parameterized DataFrame
functions (SURVEY §3.3). Each FastAPI endpoint's SQL becomes a function
over temp views / DataFrames; DuckDB's PERCENTILE_CONT ≡ Spark's exact
`percentile`, ILIKE ≡ `ilike`.

This module grows with the build; `build_filter` is the P10 predicate
builder shared by the search endpoints and the parity catalog.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_filter(
    eq: dict[str, object] | None = None,
    isin: dict[str, Iterable[object]] | None = None,
    ilike: dict[str, str] | None = None,
    between: dict[str, tuple[object, object]] | None = None,
    not_null: Iterable[str] = (),
) -> Column:
    """Compose =, IN (...), ILIKE '%x%', BETWEEN, IS NOT NULL conditions
    over arbitrary filter fields into one conjunction
    (optimized_queries.py:565-650). Catalyst pushes the resulting
    predicate into the scan where possible."""
    pred = F.lit(True)
    for col, val in (eq or {}).items():
        pred = pred & (F.col(col) == val)
    for col, vals in (isin or {}).items():
        pred = pred & F.col(col).isin(list(vals))
    for col, pat in (ilike or {}).items():
        pred = pred & F.col(col).ilike(pat)
    for col, (lo, hi) in (between or {}).items():
        pred = pred & F.col(col).between(lo, hi)
    for col in not_null:
        pred = pred & F.col(col).isNotNull()
    return pred


def summary_stats(df: DataFrame, rate_col: str, group_cols: list[str]) -> DataFrame:
    """COUNT/AVG/MIN/MAX/exact-median block (data_queries.py:96-107)."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("rate_count"),
        F.round(F.avg(rate_col), 2).alias("avg_rate"),
        F.round(F.min(rate_col), 2).alias("min_rate"),
        F.round(F.max(rate_col), 2).alias("max_rate"),
        F.round(F.expr(f"percentile({rate_col}, 0.5)"), 2).alias("median_rate"),
    )


def percentile_profile(
    df: DataFrame,
    rate_col: str,
    group_cols: list[str],
    percentiles: tuple[float, ...] = (0.10, 0.25, 0.50, 0.75, 0.90),
    distinct_counts: dict[str, str] | None = None,
) -> DataFrame:
    """agg_market_rates rollup (notebook.py:374-405): p10..p90 + distinct
    entity counts per market cell."""
    aggs = [
        F.round(F.expr(f"percentile({rate_col}, {p})"), 2).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    for out, col in (distinct_counts or {}).items():
        aggs.append(F.countDistinct(col).alias(out))
    return df.groupBy(*group_cols).agg(*aggs)


def faceted_counts(df: DataFrame, facet: str, k: int = 20) -> DataFrame:
    """GROUP BY facet ORDER BY count DESC LIMIT k (staged_dashboard.py:95-314),
    with the facet value as tie-break for determinism."""
    return (
        df.groupBy(F.col(facet).alias("facet"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("facet").asc())
        .limit(k)
    )
