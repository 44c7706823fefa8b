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


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    m_bits: int = 1 << 17,
    n_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicit Bloom runtime filter: the dim side's
    join keys compile into a constant-size bitset (16 KiB at the default
    m — built by ONE tiny job over the dim) and the FACT side drops
    non-candidate rows AT THE SCAN, before its shuffle. At 100 TB the
    shuffle is the cost: when the dim is selective (a filtered dimension
    slice), most fact rows can never match, and shipping them to the
    join reducers is pure waste — the bitset prunes them for three int64
    probes per row, no extra exchange, no broadcast of the dim itself.

    This is the plan-level form of Spark's runtime bloom-filter
    injection (spark.sql.optimizer.runtime.bloomFilter.*), usable when
    the optimizer can't prove the dim selective (opaque UDF filters,
    pre-computed dim snapshots, reuse of one bitset across many joins).

    Bloom has no false negatives, so every matching fact row survives
    the prune; false positives are eliminated by the exact join that
    follows — the result is ROW-IDENTICAL to ``fact.join(dim, on, how)``
    (the parity oracle is the plain join). Inner and left-semi only: any
    fact-preserving join would have to keep the pruned rows.

    The prune never reaches the result (the exact join re-checks every
    key), so unlike d12's oracle-replayed bitset the hash here does NOT
    need an engine-neutral domain — it is xxhash64 over the '|'-joined
    STRING form of the keys (canonical across int/long/string key
    types), one JVM hash per row instead of an md5. Equal keys hash
    equally on both sides, which is all no-false-negatives needs. The
    hash is materialized as a named column before the filter so it
    evaluates ONCE per row even when the probe expression falls out of
    whole-stage codegen (the interpreted evaluator has no
    common-subexpression elimination)."""
    from mrf_etl_spark.operators.textops import bloom_bitset_words, bloom_member

    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError("bloom_pruned_join supports inner/left-semi joins only")
    if "_bloom_h__" in fact.columns:
        raise ValueError(
            "fact already has a column named _bloom_h__ (internal name)"
        )

    def _key_hash() -> F.Column:
        # masked to the nonneg 60-bit domain bloom_positions assumes
        # (h + j*h2 must not overflow int64, which would throw under ANSI)
        return F.xxhash64(
            F.concat_ws("|", *[F.col(k).cast("string") for k in on])
        ).bitwiseAND(F.lit((1 << 60) - 1))

    dim_hashes = dim.select(_key_hash().alias("h")).distinct()
    words = bloom_bitset_words(dim_hashes, m_bits, n_hashes)
    pruned = (
        fact.withColumn("_bloom_h__", _key_hash())
        .filter(bloom_member(F.col("_bloom_h__"), words, m_bits, n_hashes))
        .drop("_bloom_h__")
    )
    return pruned.join(dim, list(on), how)
