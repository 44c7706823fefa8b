"""Spatial radius join via grid bucketing.

The reference enriches rates with provider lat/lon (Census geocode,
`utils_census.py`) and its dashboards answer "providers near X" by
post-filtering small result sets. At lake scale the naive form is a
cross join with a distance predicate — O(|L| x |R|). The standard
distributed shape (the one every Spark geo library builds on) is:

  1. quantize each point to a grid cell of side ``radius`` —
     ``(floor(lat/r), floor(lon/r))``;
  2. expand the LEFT side to its 3x3 neighborhood of cells (any point
     within ``radius`` of a left point lies in one of those 9 cells —
     the pigeonhole that makes the equi-join complete);
  3. equi-join on the cell key (a plain shuffle/broadcast join Catalyst
     can optimize), then verify the exact distance predicate.

Candidate volume is bounded by local point density x 9 cells instead of
|L| x |R|; the join key is a pair of small ints, so AQE's skew handling
applies if a metro cell runs hot.

Distance here is SQUARED EUCLIDEAN in coordinate units. That is the
right verify-stage metric for two reasons: at sub-degree radii it is
monotone with great-circle distance (the use case is "within ~r of"),
and it is pure multiply/add — bit-identical across engines, where
haversine's sin/cos would diverge in the last ulp and break value-hash
parity (the same reason the rate formulas avoid libm, see
functions/hashing.rate_4f).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with squared-euclidean distance
    <= radius**2, via the 3x3 grid-neighborhood equi-join. Right-side
    lat/lon columns are renamed with ``suffix``; a ``dist2`` column
    carries the exact squared distance. Columns other than lat/lon must
    not collide between the sides."""

    def cell(c: Column) -> Column:
        return F.floor(c / F.lit(radius)).cast("long")

    l9 = (
        left.withColumn("_di", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("_dj", F.explode(F.array(*[F.lit(j) for j in (-1, 0, 1)])))
        .withColumn("_ci", cell(F.col(lat_col)) + F.col("_di"))
        .withColumn("_cj", cell(F.col(lon_col)) + F.col("_dj"))
        .drop("_di", "_dj")
    )
    r = right.withColumnsRenamed({lat_col: lat_col + suffix, lon_col: lon_col + suffix})
    r = r.withColumn("_ci", cell(F.col(lat_col + suffix))).withColumn(
        "_cj", cell(F.col(lon_col + suffix))
    )
    dlat = F.col(lat_col) - F.col(lat_col + suffix)
    dlon = F.col(lon_col) - F.col(lon_col + suffix)
    return (
        l9.join(r, ["_ci", "_cj"])
        .withColumn("dist2", dlat * dlat + dlon * dlon)
        .filter(F.col("dist2") <= F.lit(radius) * F.lit(radius))
        .drop("_ci", "_cj")
    )
