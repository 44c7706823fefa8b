"""Data-quality report over a lake's tables.

The reference validates its star lake with ad-hoc notebook checks
(null/zero scans and FK spot-joins in the validation cells of
`prod_etl/notebook.py` and the quality gates in `prod_etl/ETL_1.py`'s
ingest path); here the same intent is a single declarative report: each
check compiles to one aggregate over one scan (FK checks to one
left-join + aggregate where the parent key list is the broadcast side),
and the report is the UNION of one-row aggregates — N checks run as one
lazy plan, sharing scans where Catalyst can.

Scale: a check never materializes bad ROWS (that's a debugging query,
bounded by LIMIT when needed); it returns counts, so the output is O(1)
per check no matter the table size. FK checks reduce the parent side to
DISTINCT keys before the join — the classic dedup-before-expensive-work
pattern (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(df: DataFrame, name: str, bad: Column) -> DataFrame:
    """One-row (check, n_bad, n_total) aggregate."""
    return df.agg(
        F.count_if(bad).alias("n_bad"), F.count("*").alias("n_total")
    ).select(F.lit(name).alias("check"), "n_bad", "n_total")


def null_check(df: DataFrame, name: str, col: str) -> DataFrame:
    return _report_row(df, name, F.col(col).isNull())


def range_check(
    df: DataFrame, name: str, col: str, lo: float, hi: float
) -> DataFrame:
    """Rows OUTSIDE [lo, hi] (nulls count as violations)."""
    c = F.col(col)
    return _report_row(df, name, ~c.between(lo, hi) | c.isNull())


def fk_check(
    child: DataFrame, parent: DataFrame, name: str, fk: str, pk: str
) -> DataFrame:
    """Child rows whose ``fk`` has no match in parent ``pk`` (null fk is
    an orphan too — a star fact must reference a real dim row)."""
    keys = parent.select(F.col(pk).alias(fk)).distinct().withColumn(
        "_hit", F.lit(1)
    )
    return _report_row(
        child.join(keys, fk, "left"), name, F.col("_hit").isNull()
    )


def quality_report(checks: list[DataFrame]) -> DataFrame:
    """UNION the one-row check frames and derive the violation rate.
    ``bad_rate`` is one double division of exact counts (engine-stable)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn(
        "bad_rate",
        F.col("n_bad").cast("double") / F.col("n_total").cast("double"),
    )
