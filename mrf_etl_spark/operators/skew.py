"""Skew-mitigation join primitives.

AQE's skew-join splitting (on by default in session.py) handles most hot
keys by splitting oversized shuffle partitions, but it only helps
sort-merge joins AFTER a shuffle materializes, and it can't split a
single key's hash-aggregation state. Salting is the plan-level fix: the
skewed (fact) side spreads each join key over ``n_salt`` sub-keys using a
deterministic hash of a high-cardinality column, and the modest (build)
side replicates ``n_salt``× so every sub-key still finds its match. The
shuffle then distributes a hot key over ``n_salt`` reducers instead of
melting one.

Cost model: replicating the right side multiplies its shuffle volume by
``n_salt`` — salting pays when (hot-key row share × fact size) dominates
(right size × n_salt). It is a FACT⋈MEDIUM-DIM tool; for tiny dims use
broadcast (no shuffle at all), for fact⋈fact let AQE split.

The salt is internal plumbing and collapses before any output, so
results are byte-identical to the unsalted join — which is exactly how
the parity oracle checks it (plain SQL join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_col: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (skewed fact) with ``right`` (modest dim) on the
    ``on`` keys, spreading each key across ``n_salt`` shuffle sub-keys.

    ``salt_col`` must be a high-cardinality LEFT column (a row id) so the
    hot key's rows land uniformly across its sub-keys; the salt is
    deterministic (xxhash64) so task retries reproduce the same layout.
    Row-identical to ``left.join(right, on, how)`` for inner/left joins
    (asserted in tests); right/full joins would need null-salt handling
    on the replicated side and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    keys = [*on, "_salt"]
    l = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l.join(r, keys, how).drop("_salt")
