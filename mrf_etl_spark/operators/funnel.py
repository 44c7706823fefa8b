"""Ordered event-funnel analysis — the windowFunnel-class operator.

Given an event log and an ordered list of step event types, compute for
each actor the timestamp at which it completed each step IN ORDER (step
i+1 counts only strictly after step i), then roll up how many actors
reached each depth. The per-actor part is N chained unbounded-window
minima over ONE hash partitioning (the actor key), so the whole operator
costs a single exchange regardless of corpus size; the rollup is a
constant-size conditional aggregation on top.

Scale shape: the exchange is keyed by actor — uniform unless one actor
owns a pathological share of events, and even then the window frame is
unbounded-min (no sort needed beyond the hash partition). All counts are
integers, so cross-engine parity is exact.

Reference parity: beyond-reference (the reference has no event-funnel
operator); the capability matches ClickHouse ``windowFunnel`` /
Amplitude-style ordered funnels, a standard large-scale product-analytics
query shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_steps(
    df: DataFrame,
    actor_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """One row per actor: ``step_1_ts .. step_N_ts`` (epoch in ``ts_col``'s
    unit; NULL once a step was never reached — later steps are then NULL
    too, by construction of the strictly-after chain)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(actor_col)
    out = df.select(actor_col, type_col, ts_col)
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"step_{i}_ts"
        # each withColumn adds a Window projection, but all share the one
        # partitioning: a single exchange feeds the whole chain
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    step_cols = [f"step_{i}_ts" for i in range(1, len(steps) + 1)]
    # window results are constant per actor: collapse to one row each
    return out.groupBy(actor_col).agg(
        *[F.min(c).alias(c) for c in step_cols]
    )


def funnel_counts(
    df: DataFrame,
    actor_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Single-row funnel rollup: total actors, actors reaching each step
    in order, and the overall conversion (last step / first step) — the
    one float, produced by a single correctly-rounded division of two
    exact integers on both engines."""
    per_actor = funnel_steps(df, actor_col, type_col, ts_col, steps)
    n = len(steps)
    aggs = [F.count("*").alias("n_actors")] + [
        F.sum(
            F.when(F.col(f"step_{i}_ts").isNotNull(), 1).otherwise(0)
        ).alias(f"n_step_{i}")
        for i in range(1, n + 1)
    ]
    out = per_actor.agg(*aggs)
    return out.withColumn(
        "conversion",
        F.when(
            F.col("n_step_1") > 0,
            F.col(f"n_step_{n}").cast("double") / F.col("n_step_1"),
        ).otherwise(F.lit(None).cast("double")),
    )
