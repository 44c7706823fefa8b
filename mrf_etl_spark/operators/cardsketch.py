"""Mergeable corpus-card sketch state — the incremental-ingest twin of
the q2 corpus card.

q2 computes exact per-(source, lang) percentiles in one pass, which is
right for a release build but wrong for a lake that ingests batches
continuously: exact percentiles are holistic (not algebraic), so keeping
a card fresh would rescan the whole corpus per batch. This module keeps
a SMALL algebraic state instead:

    state(docs) = per (keys, bucket): (n, words_sum, chars_sum)
    bucket      = floor(16 * log2(n_words))   — log-spaced, ratio 2^(1/16)

Counts and sums are plain additions, so

    state(A ∪ B) == merge(state(A), state(B))      -- EXACTLY

(the classic mergeable-summary property; same family as the q-digest /
moment-sketch line of work, specialized to a fixed log grid). The card
derived from the state has exact n_docs / words_total / chars_avg and
quantile BUCKETS whose edges bracket the true quantile within a
2^(1/16) ≈ 4.4% relative envelope — the dataset-documentation use case
(\"median doc length ~480 words\") never needs tighter.

The bucket function is integer-safe across engines: floor(16·log2(w))
can only land ON an integer when w is a power of two (where IEEE log2
is exact), so Spark and the DuckDB oracle bucket identically — the same
argument that keeps a20/a21's sketch-bound booleans hash-stable.

State size: |keys| × ~200 buckets ceiling (words ≤ ~10^9 in 16ths of a
doubling) — constant per key, independent of corpus size; merge cost is
O(state), never O(corpus). At 100 TB the per-batch work is one map-side
combinable rollup of the BATCH plus a state-sized merge, matching the
incremental story of d9/st9/refresh_market_rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mrf_etl_spark.operators.textops import token_count_ws

STATE_KEYS = ["source", "lang"]


def _bucket(words) -> F.Column:
    return F.floor(F.lit(16) * F.log2(words.cast("double"))).cast("int")


def card_rows(
    docs: DataFrame, text_col: str = "text", keys: list[str] | None = None
) -> DataFrame:
    """Per-document projection onto the sketch grid: (keys..., _w, _c,
    bucket). The ONE place the grid (log base, resolution 16, the
    zero-word exclusion) is defined on the Spark side — both the batch
    state rollup and the st11 streaming prep build on this, so the
    streamed state can never land on a different grid than
    :func:`corpus_card_from_state` assumes. Documents with zero words
    are excluded (a log grid has no cell for 0; empty docs are a
    quality-gate concern, not a length-distribution one)."""
    keys = list(keys or STATE_KEYS)
    w = token_count_ws(text_col).cast("long")
    return (
        docs.select(
            *keys,
            w.alias("_w"),
            F.col("n_chars").cast("long").alias("_c"),
        )
        .filter(F.col("_w") >= 1)
        .withColumn("bucket", _bucket(F.col("_w")))
    )


def corpus_card_state(
    docs: DataFrame, text_col: str = "text", keys: list[str] | None = None
) -> DataFrame:
    """One map-side-combinable rollup of a document batch into sketch
    state rows (keys..., bucket, n, words_sum, chars_sum)."""
    keys = list(keys or STATE_KEYS)
    per = card_rows(docs, text_col, keys)
    return per.groupBy(*keys, "bucket").agg(
        F.count("*").alias("n"),
        F.sum("_w").alias("words_sum"),
        F.sum("_c").alias("chars_sum"),
    )


def merge_card_states(*states: DataFrame) -> DataFrame:
    """Exact merge: union + re-sum on (keys, bucket). Associative and
    commutative, so states can be persisted per batch and folded in any
    order (or kept as one running state parquet updated per micro-batch,
    the st9 incremental-MV shape)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    group = [c for c in out.columns if c not in ("n", "words_sum", "chars_sum")]
    return out.groupBy(*group).agg(
        F.sum("n").alias("n"),
        F.sum("words_sum").alias("words_sum"),
        F.sum("chars_sum").alias("chars_sum"),
    )


def corpus_card_from_state(
    state: DataFrame,
    percentiles: list[tuple[float, str]] | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Derive the card from state only: exact n_docs / words_total /
    chars_avg, and per requested percentile the smallest bucket whose
    cumulative count reaches rank ceil(q·n) — the discrete quantile's
    bucket. No access to the raw corpus."""
    keys = list(keys or STATE_KEYS)
    percentiles = percentiles or [(0.5, "p50_bucket"), (0.9, "p90_bucket")]
    # ONE window pass derives everything: cumulative count in bucket
    # order plus per-key totals as unbounded windows (no totals join —
    # the state is already key-partitioned by the window shuffle), then
    # one grouped agg picks every percentile's bucket via min(when(...)).
    by_key = Window.partitionBy(*keys)
    cum = (
        state.withColumn("cum", F.sum("n").over(by_key.orderBy("bucket")))
        .withColumn("n_docs", F.sum("n").over(by_key))
        .withColumn("words_total", F.sum("words_sum").over(by_key))
        .withColumn("chars_total", F.sum("chars_sum").over(by_key))
    )
    picks = [
        F.min(
            F.when(
                F.col("cum")
                >= F.ceil(F.lit(q) * F.col("n_docs").cast("double")),
                F.col("bucket"),
            )
        ).alias(name)
        for q, name in percentiles
    ]
    return cum.groupBy(*keys).agg(
        F.first("n_docs").alias("n_docs"),
        F.first("words_total").alias("words_total"),
        (F.first("chars_total").cast("double") / F.first("n_docs")).alias(
            "chars_avg"
        ),
        *picks,
    )
