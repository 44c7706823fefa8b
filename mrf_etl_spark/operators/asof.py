"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is at or
before the left timestamp (direction='backward'; 'forward' = earliest at
or after), matching DuckDB/pandas `ASOF JOIN` semantics with equal
timestamps included.

Spark-first plan — the union-and-carry trick, NOT a range join:

    tag left/right → unionByName → one window per key ordered by
    (ts, side) → last(right_payload, ignorenulls=True) carries the most
    recent right payload forward → keep left rows.

Cost is ONE shuffle on the join key plus a linear window pass — the same
partitioning a groupBy(key) would need. The naive alternatives both die
at scale: an inequality (range) join explodes to |L|·|R| per key before
filtering, and per-key collect loops aren't distributed. Late/skewed
keys behave like any windowed agg (AQE skew handling applies).

Reference parity: the reference has no as-of operator (closest shape:
latest-per-key scans, utils_nppes.py:230-246); this is part of the
beyond-reference training-pipeline surface (event-state attribution,
point-in-time feature joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Left as-of join. Every ``left`` row survives; matched ``right_cols``
    arrive as nullable ``<col><suffix>`` columns.

    ``on`` — equality key(s); ``left_ts``/``right_ts`` — orderable columns
    (timestamps, epoch longs); ``direction`` — 'backward' (right_ts ≤
    left_ts, latest wins) or 'forward' (right_ts ≥ left_ts, earliest wins).
    ``tiebreak`` — right column(s) ordering right rows tied on (key, ts):
    the HIGHEST tiebreak wins in both directions. Without it, ties
    resolve to an arbitrary (partition-order-dependent) right row — pass
    a unique column (version, event id) whenever same-instant right rows
    can exist."""
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    backward = direction == "backward"
    if not backward and direction != "forward":
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tb_cols = (
        [] if tiebreak is None
        else [tiebreak] if isinstance(tiebreak, str)
        else list(tiebreak)
    )
    # Tie-break rides inside the window ORDER as a struct so multi-column
    # precedence is lexicographic; left rows carry null (sorted below any
    # right row by *_nulls_first/last placement, which never matters:
    # side already separates left from right at equal ts).
    tb_expr = (
        F.struct(*[F.col(c) for c in tb_cols]) if tb_cols else F.lit(0)
    )

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            right.select(payload).schema["_r"].dataType.simpleString()
        ).alias("_r"),
        F.lit(None).cast(
            right.select(tb_expr.alias("_tb")).schema["_tb"].dataType.simpleString()
        ).alias("_tb"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields if f.name not in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        payload,
        tb_expr.alias("_tb"),
    ).select(*l_tag.columns)

    u = l_tag.unionByName(r_tag)
    if backward:
        # right row sorts BEFORE a left row at the same ts (side 0 < 1),
        # so last() at the left row sees it — the inclusive `<=` match.
        # Among tied right rows, _tb asc puts the HIGHEST tiebreak last,
        # which is the one last() carries.
        order = [
            F.col("_ts").asc(),
            F.col("_is_left").asc(),
            F.col("_tb").asc_nulls_last(),
        ]
        frame = Window.unboundedPreceding, Window.currentRow
        pick = F.last("_r", ignorenulls=True)
    else:
        # first() scans forward: _tb desc puts the highest tiebreak first
        # among right rows tied at the same ts.
        order = [
            F.col("_ts").asc(),
            F.col("_is_left").desc(),
            F.col("_tb").desc_nulls_first(),
        ]
        frame = Window.currentRow, Window.unboundedFollowing
        pick = F.first("_r", ignorenulls=True)
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)

    matched = (
        u.withColumn("_match", pick.over(w))
        .filter(F.col("_is_left") == 1)
        .drop("_ts", "_is_left", "_r", "_tb")
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return matched.select(*out_cols)
