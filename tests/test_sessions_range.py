"""Batch sessionization and banded range join: boundary semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrf_etl_spark.operators.rangejoin import range_join
from mrf_etl_spark.operators.sessions import session_stats, sessionize


def test_sessionize_gap_boundary(spark):
    # gap=100: dt == 100 stays in-session, dt == 101 starts a new one
    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 201), (2, 0)], "uid long, ts long"
    )
    got = {
        (r.uid, r.ts): r.session_seq
        for r in sessionize(df, "uid", "ts", 100).collect()
    }
    assert got == {(1, 0): 1, (1, 100): 1, (1, 201): 2, (2, 0): 1}


def test_session_stats_shape(spark):
    df = spark.createDataFrame(
        [(1, 0, 5.0), (1, 50, 7.0), (1, 500, 1.0)], "uid long, ts long, v double"
    )
    rows = {
        (r.uid, r.session_seq): (r.n, float(r.vs))
        for r in session_stats(
            df, "uid", "ts", 100,
            [F.count("*").alias("n"), F.sum("v").alias("vs")],
        ).collect()
    }
    assert rows == {(1, 1): (2, 12.0), (1, 2): (1, 1.0)}


def test_range_join_exact_and_band_edges(spark):
    # width=10; matches at |dt| <= 10 inclusive, including pairs whose
    # bands differ by one (ts 9 vs 11 straddle the 10-band boundary)
    left = spark.createDataFrame([(1, 9, "L1"), (1, 50, "L2")], "k long, lt long, lv string")
    right = spark.createDataFrame(
        [(1, 11, "inband"), (1, 19, "edge"), (1, 20, "out"), (1, 60, "far-ok"), (2, 9, "wrongkey")],
        "k long, rt long, rv string",
    )
    out = range_join(left, right, on="k", left_ts="lt", right_ts="rt", width=10)
    got = sorted((r.lv, r.rv) for r in out.collect())
    assert got == [("L1", "edge"), ("L1", "inband"), ("L2", "far-ok")]
    # no duplicate pairs from the 3-band fan-out
    assert len(got) == out.count()


def test_range_join_plan_is_equi_join(spark):
    left = spark.createDataFrame([(1, 9)], "k long, lt long")
    right = spark.createDataFrame([(1, 11)], "k long, rt long")
    plan = range_join(
        left, right, on="k", left_ts="lt", right_ts="rt", width=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
