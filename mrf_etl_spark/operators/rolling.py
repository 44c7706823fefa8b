"""Rolling / cumulative window metrics over an ordered event log.

Beyond-reference: the reference's dashboards recompute aggregate stats per
request (webapp/backend/main.py); a training-data or metrics pipeline needs
per-entity running state — cumulative totals, trailing-N averages — which
Spark expresses as ONE window shuffle on the entity key. No iteration, no
self-join: the frame spec (`rowsBetween`) turns "last N rows" into a
streaming pass within each key partition.

Scale: one shuffle on ``key``, then a sort within partitions. Hot keys
(one user with millions of events) serialize within their partition —
callers with known whales should pre-split by a coarse time bucket and
carry state across buckets, or cap history. For the 100 TB design the
key space (users/providers) is huge and near-uniform, so the window
parallelizes cleanly.

Cross-engine determinism: running sums in floating point are
order-dependent AND engines disagree on sliding-frame evaluation
(DuckDB uses segment trees — a different addition order). Sums therefore
run in DECIMAL (exact, associative) and only convert to double at the
edge; the ordering key must be made unique by a tie-break column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_metrics(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    trailing_rows: int = 5,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Append per-key running metrics to ``df``:

    ``cum_sum``   — exact cumulative sum of ``value`` (decimal domain)
    ``cum_n``     — running row count
    ``roll_sum``  / ``roll_avg`` — trailing ``trailing_rows``-row sum/avg
                    (frame includes the current row)

    ``order`` must be a UNIQUE ordering within each key (pass a tie-break
    id); a non-deterministic order makes every downstream value
    non-reproducible across runs and engines.
    """
    v: Column = F.col(value).cast(decimal_type)
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order])
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trail = w.rowsBetween(-(trailing_rows - 1), Window.currentRow)
    return (
        df.withColumn("cum_sum", F.sum(v).over(cum).cast("double"))
        .withColumn("cum_n", F.count("*").over(cum))
        .withColumn("roll_sum", F.sum(v).over(trail).cast("double"))
        .withColumn(
            # ONE double division of exact operands — decimal division
            # scale rules differ across engines, so divide in double
            "roll_avg",
            F.sum(v).over(trail).cast("double")
            / F.count("*").over(trail).cast("double"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_us_col: str,
    cents_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Exact per-key time-weighted average (the hypertable ``time_weight``
    rollup): each sample weighted by the integer microseconds until the
    key's NEXT sample (last-observation-carried-forward), so irregular
    sampling can't bias the level the way a plain mean does.

    ``cents_col`` must already be an integer money representation — the
    weighted sum runs as decimal(18,0)×decimal(18,0) (exact up to 38
    digits), and the ONLY float operation is the final division, which is
    IEEE-identical on every engine. Keys with a single sample (or all
    samples at one instant) have no elapsed time and are dropped —
    returning an arbitrary sample as "the average" would be a lie.

    One key-partitioned window shuffle, reused by the rollup (the
    aggregation groups on the same keys the window partitioned by).
    Returns (*keys, n_gaps, total_us, twap) with twap in currency units.
    """
    w = Window.partitionBy(*keys).orderBy(ts_us_col, *order_tiebreak)
    d = df.withColumn(
        "_gap_us", F.lead(ts_us_col).over(w) - F.col(ts_us_col)
    ).filter(F.col("_gap_us").isNotNull())
    agg = d.groupBy(*keys).agg(
        F.count("*").alias("n_gaps"),
        F.sum("_gap_us").alias("total_us"),
        F.sum(
            F.col(cents_col).cast("decimal(18,0)")
            * F.col("_gap_us").cast("decimal(18,0)")
        ).alias("_wsum"),
    )
    return agg.filter(F.col("total_us") > 0).select(
        *keys,
        "n_gaps",
        "total_us",
        (
            F.col("_wsum").cast("double") / (F.col("total_us").cast("double") * 100)
        ).alias("twap"),
    )


def burst_flags(
    daily: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    n_col: str = "n",
    base_days: int = 7,
    z: int = 3,
) -> DataFrame:
    """Flag count bursts against a trailing baseline: for each (key, day)
    count, compare against the previous ``base_days`` ACTIVE days and
    flag when the one-sided z-score exceeds ``z``. The z-test is a
    SQUARED RATIONAL INEQUALITY over exact integer sums —
    b*n - s1 > 0 AND (b*n - s1)^2 > z^2 * (b*s2 - s1^2) — so no sqrt
    crosses any engine-compare surface; a zero-variance baseline makes
    ANY uptick a burst (deterministic, documented). Rows without a full
    baseline are dropped. int64-exact up to (b*n)^2 < 2^63 (~1.1e9/day
    at b=7); pre-scale counts beyond that.

    Output: (key, day, n, base_sum, base_sumsq, burst)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(-base_days, -1)
    )
    base = daily.select(
        key_col,
        day_col,
        n_col,
        F.sum(n_col).over(w).alias("base_sum"),
        F.sum(F.col(n_col) * F.col(n_col)).over(w).alias("base_sumsq"),
        F.count("*").over(w).alias("_base_n"),
    ).filter(F.col("_base_n") == base_days)
    dev = F.lit(base_days) * F.col(n_col) - F.col("base_sum")
    var_b = F.lit(base_days) * F.col("base_sumsq") - F.col("base_sum") * F.col(
        "base_sum"
    )
    return base.select(
        key_col,
        day_col,
        n_col,
        "base_sum",
        "base_sumsq",
        ((dev > 0) & (dev * dev > F.lit(z * z) * var_b)).alias("burst"),
    )


def ewma_momentum(
    daily: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    n_col: str = "n",
    horizon: int = 7,
) -> DataFrame:
    """Exponentially-decayed activity baseline as EXACT scaled integers —
    the trend-following complement to burst_flags' z-test: weights halve
    per step back, so the H-term EWMA scaled by 2^(H-1) is
    S = Σ_{k=0..H-1} c_{d-k} · 2^(H-1-k) — pure int64 arithmetic, no
    float decay factor to drift across engines (the sketch-bound
    lesson: keep libm out of the compare surface). Terms come from
    ``lag(n, k, 0)`` over ACTIVE days, so gaps decay by position in the
    active series (documented; a calendar-true decay would first
    gap-fill with w9's spine).

    ``momentum`` flags a day whose count more than DOUBLES the decayed
    baseline of the preceding terms: c_d · (2^(H-1) − 1) > 2 · B where
    B = S − c_d · 2^(H-1) and 2^(H-1) − 1 is B's total weight — an
    integer cross-multiplication, no division. int64-exact while
    c · 2^H < 2^62 (~10^14/day at H=7; pre-scale beyond).

    Output: (key, day, n, ewma_s, momentum). ONE daily-count shuffle
    upstream; this is a key-partitioned window over the tiny
    (key, day) table — w21's metadata-scale shape."""
    from pyspark.sql.window import Window

    if horizon < 2:
        raise ValueError(f"horizon must be >= 2, got {horizon}")
    w = Window.partitionBy(key_col).orderBy(day_col)
    top = 1 << (horizon - 1)
    s = F.col(n_col).cast("long") * F.lit(top)
    for k in range(1, horizon):
        s = s + F.lag(F.col(n_col), k, 0).over(w).cast("long") * F.lit(
            1 << (horizon - 1 - k)
        )
    out = daily.select(
        key_col, day_col, F.col(n_col).cast("long").alias(n_col)
    ).withColumn("ewma_s", s)
    base = F.col("ewma_s") - F.col(n_col) * F.lit(top)
    return out.withColumn(
        "momentum", F.col(n_col) * F.lit(top - 1) > F.lit(2) * base
    )
