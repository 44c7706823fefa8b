"""Banded range join — equality keys + a bounded time/value interval.

``left ⋈ right ON keys AND |left_ts - right_ts| <= width`` is an
inequality join: executed naively Spark falls back to
BroadcastNestedLoopJoin / cartesian-per-key, which is quadratic in the
rows per key and dead at 100 TB. The banding trick makes it an EQUI-join:

    band = ts div width  (integer bucket)
    right explodes to {band-1, band, band+1}
    join on (keys..., band)  →  filter the exact interval predicate

Every true match lands in one of the three neighbor bands, so the
equi-join + filter is exact (no recall loss), and the cost is 3·|R|
shuffle rows instead of a per-key cross product — the same plan shape
Spark's own optimizer produces for range-join hints in other engines
(cf. interval joins in Flink / range-join binning in Databricks docs).

Beyond-reference: the reference has no interval join; this is the batch
primitive for event-correlation shapes (click↔view attribution windows,
sensor alignment) and pairs with operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    width: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs (all left columns + all non-key right columns) where the two
    timestamps are within ``width`` of each other (inclusive), matched per
    equality key. ``left_ts``/``right_ts`` must be integer-valued (epoch
    micros/nanos); ``width`` in the same unit."""
    keys = [on] if isinstance(on, str) else list(on)
    if width < 0:
        raise ValueError(f"width must be >= 0, got {width}")
    # width=0 means exact timestamp equality; band on the raw ts (div 0
    # would null every band and silently return zero rows — caught by the
    # hypothesis brute-force property)
    band_width = max(width, 1)
    # integer `div`, not float `/`: double division of epoch integers can
    # round across an exact band boundary and silently drop edge matches
    band_l = F.expr(f"{left_ts} div {band_width}")
    band_r = F.expr(f"{right_ts} div {band_width}")
    # right rows fan out to the 3 candidate bands; dropDuplicates is not
    # needed — each (l, r) true pair meets in exactly one band because l's
    # band is fixed and r appears once per distinct band value
    r_fan = right.withColumn(
        "_band", F.explode(F.array(band_r - 1, band_r, band_r + 1))
    )
    l_band = left.withColumn("_band", band_l)
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys] + [
        F.col("l._band") == F.col("r._band"),
        F.abs(F.col(f"l.{left_ts}") - F.col(f"r.{right_ts}")) <= width,
    ]
    joined = l_band.alias("l").join(r_fan.alias("r"), cond, how)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"{c}_r")
        for c in right.columns
        if c not in keys
    ]
    return joined.select(*out_cols)
