"""As-of join semantics: inclusive equal-ts match, per-key isolation,
unmatched-left nulls, forward direction."""

from __future__ import annotations

from mrf_etl_spark.operators.asof import asof_join


def _rows(df, *cols):
    return sorted(tuple(getattr(r, c) for c in cols) for r in df.collect())


def test_asof_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "early"), (2, 7, "c"), (3, 1, "lonely")],
        "k long, t long, v string",
    )
    right = spark.createDataFrame(
        [(1, 10, "X"), (1, 15, "Y"), (2, 7, "Z"), (2, 99, "late")],
        "k long, t long, p string",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["p"])
    assert _rows(out, "k", "t", "v", "p_asof") == [
        (1, 5, "early", None),  # before any right row
        (1, 10, "a", "X"),  # equal ts matches (inclusive)
        (1, 20, "b", "Y"),  # latest ≤ 20 is 15/Y, not 10/X
        (2, 7, "c", "Z"),  # key-isolated; 99/late ignored
        (3, 1, "lonely", None),  # key absent from right
    ]


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 10, "a"), (1, 99, "b")], "k long, t long, v string")
    right = spark.createDataFrame([(1, 10, "X"), (1, 15, "Y")], "k long, t long, p string")
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_cols=["p"], direction="forward",
    )
    assert _rows(out, "k", "t", "v", "p_asof") == [
        (1, 10, "a", "X"),  # equal ts matches; earliest ≥ wins
        (1, 99, "b", None),
    ]


def test_asof_tiebreak_backward(spark):
    # Two right rows at the SAME (key, ts): the highest tiebreak must win
    # deterministically (ADVICE r6: without it, F.last picks by partition
    # order). Shuffle-width 32 over 4 rows makes arbitrary order likely
    # to differ from insertion order if the tiebreak were ignored.
    left = spark.createDataFrame([(1, 10, "q")], "k long, t long, v string")
    right = spark.createDataFrame(
        [(1, 10, 2, "v2"), (1, 10, 5, "v5"), (1, 10, 3, "v3"), (1, 4, 9, "old")],
        "k long, t long, ver long, p string",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_cols=["ver", "p"], tiebreak="ver",
    )
    assert _rows(out, "k", "t", "ver_asof", "p_asof") == [(1, 10, 5, "v5")]


def test_asof_tiebreak_forward(spark):
    left = spark.createDataFrame([(1, 10, "q")], "k long, t long, v string")
    right = spark.createDataFrame(
        [(1, 10, 1, "v1"), (1, 10, 7, "v7"), (1, 12, 9, "later")],
        "k long, t long, ver long, p string",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_cols=["ver", "p"], direction="forward", tiebreak="ver",
    )
    assert _rows(out, "k", "t", "ver_asof", "p_asof") == [(1, 10, 7, "v7")]


def test_asof_tiebreak_multi_column(spark):
    # Lexicographic precedence: (major, minor) — major dominates.
    left = spark.createDataFrame([(1, 10, "q")], "k long, t long, v string")
    right = spark.createDataFrame(
        [(1, 10, 1, 9, "a"), (1, 10, 2, 0, "b"), (1, 10, 2, 1, "c")],
        "k long, t long, major long, minor long, p string",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_cols=["p"], tiebreak=["major", "minor"],
    )
    assert _rows(out, "k", "t", "p_asof") == [(1, 10, "c")]
