"""Deterministic sampling / dataset-split operators.

A training-data pipeline needs REPRODUCIBLE splits: `rand()`-based
sampling changes under retries, re-partitioning, and re-runs, and cannot
be replayed by another engine. These operators derive every decision from
an md5 hash of the row's id (the same engine-neutral 60-bit recipe the
minhash family uses — operators/dedup.shingle_hash_expr), so:

  * re-running assigns every row the SAME split — a new batch appended to
    the corpus never reshuffles existing rows' assignments;
  * any engine can replay the assignment (DuckDB oracles verify it);
  * at 100 TB the split is a stateless per-row projection — no shuffle,
    no sampling pass, no driver-side coordination.

Buckets are `hash % 10_000` (basis-point resolution), so fractions are
exact to 0.01%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000): first 15 hex chars of
    md5(salt || id) parsed base-16, mod 10000. The salt decorrelates
    independent splits over the same ids (e.g. a dedup-sample vs a
    train/val split)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15), 16, 10)
    return (h.cast("long") % BUCKETS).alias("bucket")


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a split-name column from cumulative weight thresholds.

    weights: ordered {name: fraction} summing to 1.0, e.g.
    {"train": 0.9, "val": 0.05, "test": 0.05}. Assignment is a pure
    per-row expression — appended data never disturbs existing rows."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    b = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cut = int(round(acc * BUCKETS))
        expr = F.when(b < cut, name) if expr is None else expr.when(b < cut, name)
    out = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, out)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling (the reproducible `sampleBy`):
    keep a row iff its hash bucket falls under its stratum's fraction.
    Strata absent from `fractions` use `default_fraction`. Stateless
    per-row predicate — at scale it pushes straight into the scan."""
    b = hash_bucket(id_col, salt)
    cut = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        val = F.lit(int(round(frac * BUCKETS)))
        cut = F.when(cond, val) if cut is None else cut.when(cond, val)
    cut = (
        F.lit(int(round(default_fraction * BUCKETS)))
        if cut is None
        else cut.otherwise(int(round(default_fraction * BUCKETS)))
    )
    return df.filter(b < cut)


def temporal_split(
    df: DataFrame,
    ts_col: str,
    cutoff,
    gap=0,
) -> DataFrame:
    """Leakage-safe temporal split: rows strictly before ``cutoff`` are
    'train', rows at/after ``cutoff + gap`` are 'test', and rows inside
    the gap get 'holdout_gap' (drop them — they are the leakage buffer
    for features computed over trailing windows: a trailing-N-day
    feature of an early test row would otherwise read train-period
    events, and vice versa).

    ``ts_col``/``cutoff``/``gap`` share whatever numeric time domain the
    caller uses (epoch micros here, matching the events table). A pure
    per-row projection: no shuffle, pushes into the scan, reproducible
    on any engine — the temporal analog of ``assign_split``.
    """
    c = F.col(ts_col)
    return df.withColumn(
        "split",
        F.when(c < F.lit(cutoff), F.lit("train"))
        .when(c >= F.lit(cutoff) + F.lit(gap), F.lit("test"))
        .otherwise(F.lit("holdout_gap")),
    )
