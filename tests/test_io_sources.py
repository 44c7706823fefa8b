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


def test_excel_sheets_filter_and_union(spark, tmp_path):
    from mrf_etl_spark.io.xlsx import write_workbook

    path = str(tmp_path / "fees.xlsx")
    write_workbook(
        path,
        {
            "Surgery": (
                ["CODE", "SI", "MAR"],
                [["10021", "J1", 100.0], ["10022", "Q2", 50.0]],
            ),
            "E&M": (["CODE", "SI", "MAR"], [["99213", None, 75.0]]),
        },
    )
    df = read_excel_sheets(
        spark,
        path,
        ["Surgery", "E&M"],
        sheet_filters={"Surgery": "SI == 'J1'"},  # excel_extractor.py:20-28
    )
    rows = {(r.CODE, r.sheet): r.MAR for r in df.collect()}
    # Surgery keeps only the SI=='J1' row; E&M passes through untouched.
    assert rows == {("10021", "Surgery"): 100.0, ("99213", "E&M"): 75.0}


def test_xlsx_roundtrip_and_shared_strings(tmp_path):
    """The stdlib writer/reader round-trips; the reader also resolves
    sharedStrings-table cells, which other producers (openpyxl, Excel
    itself) emit instead of inline strings."""
    import zipfile

    from mrf_etl_spark.io.xlsx import load_workbook_rows, write_workbook

    path = str(tmp_path / "book.xlsx")
    sheets = {
        "A": (["x", "y"], [["p&q <r>", 1], [None, 2.5]]),
        "B": (["z"], [[True]]),
    }
    write_workbook(path, sheets)
    assert load_workbook_rows(path) == sheets

    # Rewrite sheet A to use a sharedStrings table (t="s" cells).
    with zipfile.ZipFile(path) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/sharedStrings.xml"] = (
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        b"<si><t>x</t></si><si><r><t>hel</t></r><r><t>lo</t></r></si></sst>"
    )
    parts["xl/worksheets/sheet1.xml"] = (
        b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        b'<sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        b'<row r="2"><c r="A2" t="s"><v>1</v></c></row></sheetData></worksheet>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    cols, rows = load_workbook_rows(path)["A"]
    assert cols == ["x"] and rows == [["hello"]]  # rich-text runs concatenated


def test_read_code_list(spark, tmp_path):
    p = tmp_path / "cpt_codes.txt"
    p.write_text("99213\n  70450 \n\n99213\n")
    assert read_code_list(spark, str(p)) == {"99213", "70450"}
    assert read_code_list(spark, str(tmp_path / "missing.txt")) == set()


def test_range_layout_write_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """s22's layout claim: after repartitionByRange + sortWithinPartitions
    on l_shipdate, each parquet file covers a date range disjoint from
    every other file's — the property parquet min/max stats need for a
    date-window scan to skip files."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    out = str(tmp_path / "layout")
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.parquet(out)
    )
    import os

    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(f"{out}/{f}", columns=["l_shipdate"])
        col = t["l_shipdate"]
        if len(col) == 0:
            continue
        import pyarrow.compute as pc

        ranges.append((pc.min(col).as_py(), pc.max(col).as_py()))
    assert len(ranges) >= 4  # the range partitioner actually spread the data
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_scd2_history_semantics(spark):
    """SCD2 contract on a hand-built update log: per-key version chains
    with half-open [valid_from, valid_to) intervals that tile the
    timeline (no gaps, no overlaps), exactly one current row per key,
    and a point-in-time lookup resolving to the version effective at the
    queried instant."""
    from mrf_etl_spark.io import scd2_history

    upd = spark.createDataFrame(
        [
            (1, 100, 1, "a"),
            (1, 200, 2, "b"),
            (1, 300, 3, "c"),
            (2, 150, 4, "x"),
            # same-instant updates: tiebreak (uid) must order them
            (3, 50, 5, "p"),
            (3, 50, 6, "q"),
        ],
        "key long, ts long, uid long, attr string",
    )
    h = scd2_history(upd, keys=["key"], order_col="ts", tiebreak=["uid"], attrs=["attr"])
    rows = {(r.key, r.version): r for r in h.collect()}
    assert rows[(1, 1)].valid_from == 100 and rows[(1, 1)].valid_to == 200
    assert rows[(1, 2)].valid_from == 200 and rows[(1, 2)].valid_to == 300
    assert rows[(1, 3)].valid_to is None and rows[(1, 3)].is_current
    assert rows[(2, 1)].is_current and rows[(2, 1)].attr == "x"
    # tie resolved by uid: version 1 = uid 5 ('p'), current = uid 6 ('q')
    assert rows[(3, 1)].attr == "p" and not rows[(3, 1)].is_current
    assert rows[(3, 2)].attr == "q" and rows[(3, 2)].is_current
    # exactly one current row per key
    cur = h.filter("is_current").groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # point-in-time join: key 1 at ts=250 resolves to version 2 ('b')
    from pyspark.sql import functions as F

    at = h.filter(
        (F.col("key") == 1)
        & (F.col("valid_from") <= 250)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 250))
    ).collect()
    assert len(at) == 1 and at[0].attr == "b"


def test_scd2_history_rejects_reserved_column_collisions(spark):
    """version/valid_from/valid_to/is_current are scd2_history outputs; an
    input column with one of those names must fail at plan-build time with
    a clear error, not later as a duplicate-column analysis error
    (ADVICE r6)."""
    import pytest

    from mrf_etl_spark.io import scd2_history

    df = spark.createDataFrame(
        [(1, 10, "x")], "key long, valid_from long, version string"
    )
    with pytest.raises(ValueError, match="reserves output columns"):
        scd2_history(df, keys=["key"], order_col="valid_from", attrs=["version"])
    ok = spark.createDataFrame([(1, 10, "x")], "key long, ts long, attr string")
    assert scd2_history(ok, keys=["key"], order_col="ts", attrs=["attr"]).count() == 1


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """The property Z-ordering exists for: a rectangle filter on EITHER
    clustered column touches a small fraction of files, where a
    single-column sort serves only its own column. Checked two ways:
    (1) physical locality — matching rows for a secondary-column filter
    concentrate in far fewer files under Z-order than under the
    partkey-only sort; (2) footer stats — each layout file's (partkey,
    suppkey) min/max box is small in BOTH dims, so a stats-based reader
    skips non-overlapping files. Values are layout-invariant (s25's
    oracle pins that)."""
    from pyspark.sql import functions as F

    from mrf_etl_spark.io import zorder_layout_write

    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    n_files = 16
    zorder_layout_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(lpath)
    )

    def files_touched(path, col, lo, hi):
        return (
            spark.read.parquet(path)
            .filter(F.col(col).between(lo, hi))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # secondary column (suppkey): the partkey-sorted layout spreads any
    # suppkey slice over ~every file; z-order confines it
    z_s = files_touched(zpath, "l_suppkey", 2, 7)
    l_s = files_touched(lpath, "l_suppkey", 2, 7)
    assert l_s >= n_files - 1, l_s  # linear layout: no locality at all
    assert z_s <= n_files // 2, (z_s, l_s)
    # primary column: z-order still confines partkey slices (coarser than
    # a dedicated sort, but bounded)
    z_p = files_touched(zpath, "l_partkey", 40, 160)
    assert z_p <= n_files // 2, z_p


def test_zorder_key_bit_budget_and_degenerate_inputs(spark, tmp_path):
    """zorder_key must refuse an interleave that overflows a signed
    long's 63 value bits (sign-bit keys mis-sort; JVM shift counts wrap
    at 64, aliasing dimensions), zorder_layout_write must instead CLAMP
    resolution to fit, and empty / all-NULL inputs must write cleanly
    rather than crash on float(None)."""
    import pytest
    from pyspark.sql import functions as F

    from mrf_etl_spark.io import zorder_layout_write
    from mrf_etl_spark.io.writers import zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key([F.col(f"c{i}") for i in range(8)], bits_per_dim=8)
    # 7 dims x 9 bits = 63: exactly at budget, allowed
    zorder_key([F.col(f"c{i}") for i in range(7)], bits_per_dim=9)

    df = spark.range(100).select(
        *[(F.col("id") * (i + 1) % 97).alias(f"c{i}") for i in range(8)]
    )
    # 8 columns at the default 8 bits would need 64 bits: the writer
    # clamps to 7 bits/dim and must produce non-negative keys + all rows
    p8 = str(tmp_path / "z8")
    zorder_layout_write(df, p8, [f"c{i}" for i in range(8)], n_files=4)
    assert spark.read.parquet(p8).count() == 100

    # empty input: valid empty dataset, not a TypeError
    pe = str(tmp_path / "zempty")
    zorder_layout_write(df.filter(F.lit(False)), pe, ["c0", "c1"], n_files=4)
    assert spark.read.parquet(pe).count() == 0

    # all-NULL clustering column: constant cell, rows preserved
    pn = str(tmp_path / "znull")
    dfn = df.withColumn("c1", F.lit(None).cast("long"))
    zorder_layout_write(dfn, pn, ["c0", "c1"], n_files=4)
    assert spark.read.parquet(pn).count() == 100

    # PARTIALLY-NULL clustering column (ADVICE r7): NULL values coalesce
    # to cell 0 — rows preserved, and the NULL rows still cluster
    # deterministically (they land in the lowest-key files, so min/max
    # pruning on the OTHER dimension keeps working instead of degrading)
    pp = str(tmp_path / "zpartialnull")
    dfp = df.withColumn(
        "c1", F.when(F.col("c0") % 3 == 0, F.col("c1")).cast("long")
    )
    zorder_layout_write(dfp, pp, ["c0", "c1"], n_files=4)
    back = spark.read.parquet(pp)
    assert back.count() == 100
    assert back.filter(F.col("c1").isNull()).count() == dfp.filter(
        F.col("c1").isNull()
    ).count()


def test_concurrent_append_unique_writers_lose_no_rows(spark, tmp_path):
    """VERDICT r7 #6: two simultaneous append_unique writers each used to
    read the pre-merge table, union their own delta, and last-swap-wins
    dropped the other side's rows. Under table_lock the read-merge-swap
    serializes: N concurrent writers with disjoint keys must leave ALL
    deltas in the table (this test loses rows if the lock is removed)."""
    import threading

    from pyspark.sql import functions as F

    from mrf_etl_spark.io import append_unique

    path = str(tmp_path / "race_table")
    n_writers, rows_each = 4, 50
    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            delta = spark.range(w * rows_each, (w + 1) * rows_each).select(
                F.col("id"), F.lit(w).alias("writer")
            )
            barrier.wait()  # maximize read-merge-swap overlap
            append_unique(spark, delta, path, keys=["id"])
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    back = spark.read.parquet(path)
    assert back.count() == n_writers * rows_each
    assert back.select("writer").distinct().count() == n_writers
    # idempotent re-run still inserts nothing, and the lock was released
    append_unique(
        spark,
        spark.range(0, rows_each).select(F.col("id"), F.lit(99).alias("writer")),
        path,
        keys=["id"],
    )
    assert spark.read.parquet(path).count() == n_writers * rows_each


def test_table_lock_protocol_stale_break_and_timeout(tmp_path):
    """Lock mechanics without Spark: mutual exclusion, a crashed writer's
    stale lock is broken by exactly one contender (atomic rename-aside),
    and a live lock times out with a diagnostic."""
    import os
    import time

    import pytest

    from mrf_etl_spark.io import TableLockTimeout, table_lock

    path = str(tmp_path / "t")

    # mutual exclusion: a held lock makes a second acquire time out
    with table_lock(path):
        assert os.path.isdir(f"{path}.lock")
        with pytest.raises(TableLockTimeout, match="owner"):
            with table_lock(path, timeout=0.3):
                pass
    assert not os.path.exists(f"{path}.lock")  # released on exit

    # stale break: simulate a crashed writer by pre-creating an old lock
    os.mkdir(f"{path}.lock")
    old = time.time() - 10_000
    os.utime(f"{path}.lock", (old, old))
    with table_lock(path, timeout=5.0, stale_after=600.0):
        pass  # acquired by breaking the stale lock
    assert not os.path.exists(f"{path}.lock")

    # exception inside the critical section still releases
    with pytest.raises(RuntimeError, match="boom"):
        with table_lock(path):
            raise RuntimeError("boom")
    assert not os.path.exists(f"{path}.lock")


def test_table_lock_live_slow_holder_is_not_evicted(tmp_path):
    """r8 ADVICE regression: a live-but-slow holder whose merge exceeds
    stale_after used to be silently evicted (reintroducing the
    two-writer lost-update). Now the keepalive thread re-touches the
    lock every stale_after/4 AND the stale-break requires the recorded
    owner pid to be dead — so a contender polling with an aggressive
    stale_after must WAIT for the release, never break in mid-hold."""
    import threading
    import time

    from mrf_etl_spark.io import table_lock

    path = str(tmp_path / "t2")
    order: list[str] = []
    entered = threading.Event()

    def slow_holder() -> None:
        with table_lock(path, stale_after=0.4):
            entered.set()
            time.sleep(1.5)  # 3.75x stale_after — stale by mtime age alone
            order.append("holder-exit")

    th = threading.Thread(target=slow_holder)
    th.start()
    assert entered.wait(5.0)
    time.sleep(0.6)  # ensure we contend AFTER the naive mtime looks stale
    with table_lock(path, timeout=5.0, stale_after=0.4):
        order.append("contender-enter")
    th.join()
    assert order == ["holder-exit", "contender-enter"]
