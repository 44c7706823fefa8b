"""Source-reader tests for the paths the parity catalog can't reach:
corrupt-Parquet salvage (S2), the Excel multi-sheet source (S5, with the
engine driven through a fake ``pd.read_excel`` since openpyxl is not in
this container), and the code-list source (S7)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mrf_etl_spark.io.readers import (
    read_code_list,
    read_excel_sheets,
    read_parquet_tolerant,
)


def test_corrupt_parquet_salvage(spark, tmp_path):
    good = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    d = tmp_path / "data"
    d.mkdir()
    good.to_parquet(d / "part-0.parquet")
    # A file that is not parquet at all — the reference's salvage loop
    # (chunk_processor.py:34-50) skips unreadable row groups; Spark's
    # ignoreCorruptFiles skips the unreadable split.
    (d / "part-1.parquet").write_bytes(b"PAR1 this is not a real parquet file")

    df = read_parquet_tolerant(spark, str(d), salvage=True)
    assert sorted(r.a for r in df.collect()) == [1, 2, 3]

    with pytest.raises(Exception):
        read_parquet_tolerant(spark, str(d), salvage=False).collect()


def test_excel_sheets_filter_and_union(spark, monkeypatch):
    sheets = {
        "Surgery": pd.DataFrame({"CODE": ["10021", "10022"], "SI": ["J1", "Q2"], "MAR": [100.0, 50.0]}),
        "E&M": pd.DataFrame({"CODE": ["99213"], "SI": [None], "MAR": [75.0]}),
    }
    monkeypatch.setattr(pd, "read_excel", lambda path, sheet_name: sheets[sheet_name].copy())

    df = read_excel_sheets(
        spark,
        "fake.xlsx",
        ["Surgery", "E&M"],
        sheet_filters={"Surgery": "SI == 'J1'"},  # excel_extractor.py:20-28
    )
    rows = {(r.CODE, r.sheet): r.MAR for r in df.collect()}
    # Surgery keeps only the SI=='J1' row; E&M passes through untouched.
    assert rows == {("10021", "Surgery"): 100.0, ("99213", "E&M"): 75.0}


def test_read_code_list(spark, tmp_path):
    p = tmp_path / "cpt_codes.txt"
    p.write_text("99213\n  70450 \n\n99213\n")
    assert read_code_list(spark, str(p)) == {"99213", "70450"}
    assert read_code_list(spark, str(tmp_path / "missing.txt")) == set()
