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


def read_code_list(spark: SparkSession, path: str) -> set[str]:
    """Text file of one code per line → python set for isin()/broadcast
    filters (main.py:193-203, S7). The file is tiny (~10k codes max); for
    very large lists prefer a semi-join against `spark.read.text`."""
    if not os.path.exists(path):
        return set()
    rows = spark.read.text(path).collect()
    return {r.value.strip() for r in rows if r.value and r.value.strip()}
