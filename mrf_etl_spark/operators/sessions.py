"""Batch sessionization — gap-based session assignment over event logs.

The classic lag+cumsum formulation, all window functions over ONE
partitioning (the session key), so the whole operator costs a single
shuffle + sort per key regardless of corpus size:

    new_session = (ts - lag(ts) > gap) OR first row of key
    session_seq = running sum of new_session within key

The streaming twin (`streaming/ingest.py` session windows) handles live
data; this batch form is for backfills and training-data preparation
(conversation/visit segmentation), and its output is deterministic given
a total per-key order — pass ``tiebreak`` columns to break ts ties.

Reference parity: beyond-reference (the reference has no sessionizer);
semantics match SQL `SESSION` windows and the st2 streaming entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str | Column,
    gap: int | float,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Append a ``session_seq`` column (1-based per key).

    ``ts_col`` must be numeric (epoch micros/nanos or any monotone
    clock) and ``gap`` in the same unit: a row starts a new session when
    its ts is more than ``gap`` after the previous row of the same key."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    order = [ts.asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(ts).over(w)
    new_sess = F.when(prev.isNull() | (ts - prev > gap), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    gap: int | float,
    agg_exprs: list[Column],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per (key, session_seq) with the
    caller's aggregate expressions — the common 'visit table' shape."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tagged = sessionize(df, keys, ts_col, gap, tiebreak)
    return tagged.groupBy(*keys, "session_seq").agg(*agg_exprs)
