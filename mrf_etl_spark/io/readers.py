"""Tolerant readers (SURVEY §2.1 S1-S7).

The reference streams Parquet in hand-rolled 500k-row chunks
(src/utils/chunk_processor.py:17-32) — Spark's partition-iterator execution
subsumes that entirely; a scan here is just `spark.read.parquet` and the
parallelism/memory bounds come from file splits + `maxPartitionBytes`, not
application code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: add missing columns as typed nulls,
    cast present ones, select in schema order.

    Reproduces `read_parquet_safely`/`prj_cols` tolerance
    (prod_etl/ETL_1.py:43-57,201-226) declaratively — Catalyst still prunes
    the parquet scan to the intersection of columns actually present.
    """
    cols = []
    existing = {f.lower() for f in df.columns}
    for field in schema.fields:
        if field.name.lower() in existing:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_parquet_tolerant(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    salvage: bool = True,
) -> DataFrame:
    """Parquet scan with corrupt-file salvage (S2) and optional conform (S4).

    `ignoreCorruptFiles` replaces the reference's per-row-group salvage loop
    (chunk_processor.py:34-50): Spark skips unreadable splits instead of
    failing the job.
    """
    reader = spark.read
    if salvage:
        reader = reader.option("ignoreCorruptFiles", "true")
    df = reader.parquet(path)
    return conform(df, schema) if schema is not None else df


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str,
    where: str | None = None,
) -> DataFrame:
    """SQLite reference-table source (S6, rate_calculator.py:23-50).

    The reference's 9 Medicare tables are small dims (≤ a few 100k rows), so
    a driver-side stdlib-sqlite3 → Arrow → createDataFrame hop is the right
    scale tradeoff: no JDBC driver needed and the result is broadcast-ready.
    For genuinely large tables use spark.read.jdbc with a partition column
    instead."""
    import sqlite3

    import pandas as pd

    q = f"SELECT * FROM {table}" + (f" WHERE {where}" if where else "")
    with sqlite3.connect(db_path) as conn:
        pdf = pd.read_sql(q, conn)
    # Mixed-type object columns → string, mirroring the reference's
    # coercion-before-use policy (chunk_processor.py:105-110).
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype("string")
    return spark.createDataFrame(pdf)


def read_excel_sheets(
    spark: SparkSession,
    path: str,
    sheets: list[str],
    sheet_filters: dict[str, str] | None = None,
) -> DataFrame:
    """Excel multi-sheet source (S5, excel_extractor.py:14-44): read each
    sheet driver-side (tiny fee-schedule files), apply per-sheet pandas
    query filters (the reference keeps Surgery rows with SI=='J1'), tag the
    sheet name, and UNION ALL.

    Uses pandas+openpyxl when available (full OOXML surface: dates,
    formulas, styles); otherwise the stdlib zipfile+ElementTree parser in
    :mod:`mrf_etl_spark.io.xlsx` (shared/inline strings, bools, numerics —
    the subset fee-schedule workbooks actually use)."""
    import pandas as pd

    try:
        import openpyxl  # noqa: F401

        sheet_frames = {
            sheet: pd.read_excel(path, sheet_name=sheet) for sheet in sheets
        }
    except ImportError:
        from mrf_etl_spark.io.xlsx import load_workbook_rows

        book = load_workbook_rows(path)
        missing = [s for s in sheets if s not in book]
        if missing:
            raise ValueError(f"sheets not in workbook {path}: {missing}")
        sheet_frames = {
            sheet: pd.DataFrame(book[sheet][1], columns=book[sheet][0])
            for sheet in sheets
        }

    frames = []
    for sheet in sheets:
        pdf = sheet_frames[sheet]
        flt = (sheet_filters or {}).get(sheet)
        if flt:
            pdf = pdf.query(flt).copy()
        pdf["sheet"] = sheet
        frames.append(pdf)
    merged = pd.concat(frames, ignore_index=True)
    for c in merged.columns:
        if merged[c].dtype == object:
            merged[c] = merged[c].astype("string")
    return spark.createDataFrame(merged)


def read_code_list(spark: SparkSession, path: str) -> set[str]:
    """Text file of one code per line → python set for isin()/broadcast
    filters (main.py:193-203, S7). The file is tiny (~10k codes max); for
    very large lists prefer a semi-join against `spark.read.text`."""
    if not os.path.exists(path):
        return set()
    rows = spark.read.text(path).collect()
    return {r.value.strip() for r in rows if r.value and r.value.strip()}
