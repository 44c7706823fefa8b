"""Event-funnel ordering semantics and exact-k quota sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrf_etl_spark.operators.funnel import funnel_counts, funnel_steps
from mrf_etl_spark.operators.sampling import quota_sample, shard_hash

STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(rows, "uid long, et string, ts long")


def test_funnel_requires_strict_order(spark):
    # u1 completes in order; u2 clicks BEFORE its first view (click must
    # not count), then never clicks again -> depth 1; u3 view+click but
    # its purchase predates the click -> depth 2.
    df = _ev(
        spark,
        [
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "click", 5), (2, "view", 10),
            (3, "view", 10), (3, "purchase", 15), (3, "click", 20),
        ],
    )
    got = {r.uid: (r.step_1_ts, r.step_2_ts, r.step_3_ts)
           for r in funnel_steps(df, "uid", "et", "ts", STEPS).collect()}
    assert got[1] == (10, 20, 30)
    assert got[2] == (10, None, None)
    assert got[3] == (10, 20, None)


def test_funnel_same_ts_not_counted(spark):
    # strictly-after: a click at exactly the view's ts does not advance
    df = _ev(spark, [(1, "view", 10), (1, "click", 10)])
    row = funnel_steps(df, "uid", "et", "ts", STEPS).collect()[0]
    assert (row.step_1_ts, row.step_2_ts) == (10, None)


def test_funnel_takes_earliest_valid_step(spark):
    # two clicks after the view: the EARLIER one is the step ts, and the
    # purchase between them still counts (after click#1)
    df = _ev(
        spark,
        [(1, "view", 10), (1, "click", 20), (1, "purchase", 25), (1, "click", 30)],
    )
    row = funnel_steps(df, "uid", "et", "ts", STEPS).collect()[0]
    assert (row.step_1_ts, row.step_2_ts, row.step_3_ts) == (10, 20, 25)


def test_funnel_counts_rollup(spark):
    df = _ev(
        spark,
        [
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "view", 10),
            (3, "click", 10),  # never views: counted as actor, depth 0
        ],
    )
    row = funnel_counts(df, "uid", "et", "ts", STEPS).collect()[0]
    assert (row.n_actors, row.n_step_1, row.n_step_2, row.n_step_3) == (3, 2, 1, 1)
    assert row.conversion == 0.5


def test_funnel_single_exchange(spark):
    """The chained windows must share ONE user-keyed exchange."""
    df = _ev(spark, [(1, "view", 10)])
    plan = funnel_counts(df, "uid", "et", "ts", STEPS)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, plan


def test_quota_sample_exact_k_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(60)], "doc_id long, lang string"
    )
    out1 = quota_sample(df, "doc_id", "lang", k=5, salt="s").collect()
    out2 = quota_sample(df, "doc_id", "lang", k=5, salt="s").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_lang = {}
    for r in out1:
        by_lang.setdefault(r.lang, []).append(r)
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 5, "fr": 5}
    # ranks are 1..k within each stratum, ordered by the salted hash
    for lang, rows in by_lang.items():
        assert sorted(r.sample_rank for r in rows) == [1, 2, 3, 4, 5]


def test_quota_sample_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "xx")], "doc_id long, lang string"
    )
    out = quota_sample(df, "doc_id", "lang", k=10).collect()
    assert len(out) == 3


def test_quota_sample_rank_follows_hash_order(spark):
    df = spark.createDataFrame([(i, "en") for i in range(10)], "doc_id long, lang string")
    hashes = {
        r.doc_id: r.h
        for r in df.select("doc_id", shard_hash("doc_id", "z").alias("h")).collect()
    }
    out = quota_sample(df, "doc_id", "lang", k=10, salt="z").collect()
    ranked = sorted(out, key=lambda r: r.sample_rank)
    expect = sorted(hashes, key=lambda d: (hashes[d], d))
    assert [r.doc_id for r in ranked] == expect


def test_ohlc_single_exchange(spark):
    """w10's two mirrored windows AND the rollup agg must share one
    (key, day) exchange — grouping on the formatted day string instead of
    the raw keys would silently re-shuffle."""
    from mrf_etl_spark.plans.parity import REGISTRY

    df = REGISTRY["w10_ohlc_downsample"].spark_fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_quota_sample_plans_window_group_limit(spark):
    """The rank<=k filter must reach the Window as a group limit
    (WindowGroupLimit): each partition keeps a running top-k instead of
    fully sorting its stratum — the property that makes exact-k viable on
    a skewed 100 TB stratum."""
    import mrf_etl_spark.plans.parity_llm  # noqa: F401  (registers sp9)
    from mrf_etl_spark.plans.parity import REGISTRY

    df = REGISTRY["sp9_quota_sample"].spark_fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_ohlc_is_input_order_invariant(spark):
    """Repartitioning/shuffling the event input must not change any OHLC
    output — open/close come from the (ts, event_id) total order, not
    arrival order."""
    import __spark_entry__ as e

    q = e.queries()["w10_ohlc_downsample"]
    a = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    # same computation over a deliberately re-shuffled reader: rebuild via
    # the registry but with a different shuffle width to perturb layout
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_weighted_median_semantics(spark):
    """Lower weighted median: smallest value whose cumulative weight
    reaches half the total — checked against hand-computed cases
    including an exact-half boundary."""
    from mrf_etl_spark.plans.parity import REGISTRY  # noqa: F401

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def wmedian(rows):
        df = spark.createDataFrame(rows, "g string, v double, q long")
        wc = (
            Window.partitionBy("g")
            .orderBy("v", "q")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("g")
        c = df.select(
            "g", "v",
            F.sum("q").over(wc).alias("cum"),
            F.sum("q").over(wt).alias("tot"),
        )
        out = (
            c.filter(F.col("cum") * 2 >= F.col("tot"))
            .groupBy("g")
            .agg(F.min("v").alias("m"))
            .collect()
        )
        return {r.g: r.m for r in out}

    # weights 1,1,1 -> plain median
    assert wmedian([("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 1)]) == {"a": 2.0}
    # heavy low value dominates
    assert wmedian([("b", 1.0, 10), ("b", 100.0, 1)]) == {"b": 1.0}
    # exact half boundary: cum(1.0)=2, tot=4 -> 2*2 >= 4 qualifies (lower median)
    assert wmedian([("c", 1.0, 2), ("c", 5.0, 2)]) == {"c": 1.0}


def test_weighted_median_plans_agree(spark, monkeypatch):
    """a16's size-gated plans (row-level window for small inputs,
    pre-aggregated two-phase for large) must produce identical rows —
    run both against the same data by flipping the byte threshold."""
    import mrf_etl_spark.plans.parity as parity

    fn = parity.REGISTRY["a16_weighted_median"].spark_fn
    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(parity, "_A16_TWO_PHASE_BYTES", 1 << 60)
    small_plan = sorted(map(tuple, fn(spark, sf).collect()))
    monkeypatch.setattr(parity, "_A16_TWO_PHASE_BYTES", 0)
    large_plan = sorted(map(tuple, fn(spark, sf).collect()))
    assert small_plan == large_plan
    assert small_plan  # non-vacuous


def test_diversified_topk_cap(spark):
    """No supplier may exceed the per-group cap in the final page, and
    the page is the best available under that constraint."""
    import __spark_entry__ as e
    from mrf_etl_spark.plans.parity import K6_PER_GROUP, K6_TOTAL

    rows = e.queries()["k6_diversified_topk"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == K6_TOTAL
    per = {}
    for r in rows:
        per[r.l_suppkey] = per.get(r.l_suppkey, 0) + 1
    assert max(per.values()) <= K6_PER_GROUP
    prices = [r.price for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_temperature_mix_upweights_small_sources(spark):
    """alpha=0.5 mixing: quotas apportion by sqrt(n), so a source 100x
    smaller gets ~10x less (not 100x less) — the up-weighting that
    raw-proportional mixing lacks. Quotas sum EXACTLY to total_k
    (largest-remainder), realized rows == quota when subscribed."""
    from pyspark.sql import functions as F

    from mrf_etl_spark.operators.sampling import temperature_mix

    big = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit("big").alias("source")
    )
    small = spark.range(100).select(
        (F.col("id") + 1_000_000).alias("doc_id"), F.lit("small").alias("source")
    )
    df = big.unionByName(small)
    k = 505
    out = temperature_mix(df, "doc_id", "source", k)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] + counts["small"] == k
    # sqrt weights: 100 vs 10 -> small gets ~1/11 of k (46), vs ~5 raw-proportional
    assert counts["small"] == 46 and counts["big"] == 459
    # deterministic: a second run reproduces the exact membership
    again = {r["doc_id"] for r in temperature_mix(df, "doc_id", "source", k).collect()}
    assert again == {r["doc_id"] for r in out.collect()}
