"""Count-min sketch — mergeable heavy-hitter counting for streams.

The CMS is the classic sublinear frequency sketch (Cormode & Muthukrishnan
2005, public literature): ``depth`` hash rows of ``width`` counters; an
item's estimate is the MIN of its counters, which can NEVER undercount
(every update incremented all of an item's cells) and overcounts only by
hash collisions, bounded by e/width x N per row with high probability.

Why it earns a place at 100 TB: the sketch is (depth x width) integers
REGARDLESS of item cardinality, and two sketches over disjoint data merge
by cellwise ADDITION — so per-partition sketches combine map-side, stream
micro-batches fold into a running sketch (the st9/q7 incremental-rollup
shape), and a day's heavy hitters come from a constant-size table instead
of a billion-key groupBy.

Everything here is engine-replayable arithmetic (the d2/d12 doctrine):
items hash through the shared 60-bit md5 domain, rows use the
``seed_mix_expr`` universal-hash family, and cells are ``& (width-1)`` —
so an ANSI oracle reproduces every counter exactly, collisions included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrf_etl_spark.operators.dedup import seed_mix_expr, shingle_hash_expr


def _cell(h: Column, j: int, width: int) -> Column:
    return seed_mix_expr(h, j).bitwiseAND(F.lit(width - 1))


def countmin_table(
    df: DataFrame, item_col: str, width: int = 256, depth: int = 3
) -> DataFrame:
    """Build the (j, pos, c) counter table — one row per NON-EMPTY cell
    (at most depth x width rows, the dense sketch's sparse form; absent
    cells are zero). One explode by ``depth`` + one (j, pos)-keyed count
    with map-side partial aggregation: the only shuffle moves at most
    depth x width partial counters per task, never the items."""
    if width & (width - 1) != 0:
        raise ValueError("width must be a power of two")
    # hash ONCE per row as a named column — inlining the md5 inside the
    # depth structs would evaluate it depth times per row (no CSE outside
    # whole-stage codegen)
    hashed = df.select(
        shingle_hash_expr(F.col(item_col).cast("string")).alias("_h")
    )
    cells = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cell(F.col("_h"), j, width).alias("pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.j", "cell.pos")
        .groupBy("j", "pos")
        .agg(F.count("*").alias("c"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches over disjoint data: cellwise addition (the
    algebraic merge that makes per-partition / per-batch builds exact)."""
    return (
        a.unionByName(b)
        .groupBy("j", "pos")
        .agg(F.sum("c").alias("c"))
    )


def countmin_estimate(
    items: DataFrame,
    cms: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Estimate each item's frequency from the sketch: min over the
    depth counters at the item's cells (missing cell -> 0, though a
    present item always has all its cells). ``items`` is the candidate
    set (e.g. exact or sampled heavy hitters) — constant-sized, so the
    cms join broadcasts."""
    hashed = items.select(
        item_col, shingle_hash_expr(F.col(item_col).cast("string")).alias("_h")
    )
    probes = hashed.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cell(F.col("_h"), j, width).alias("pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.j", "cell.pos")
    joined = probes.join(F.broadcast(cms), ["j", "pos"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est")
    )
