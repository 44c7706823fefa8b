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
