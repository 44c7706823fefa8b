"""Serving-latency bench: time the MV-backed dashboard endpoints against
the reference's published 50-200 ms materialized-view envelope
(reference webapp/DASHBOARD_OPTIMIZATION_GUIDE.md:15-19: unoptimized
queries 2-5 s, materialized views 50-200 ms).

Builds an sf-proportional StarLake from the driver testdata (lineitem ->
fact_rate with the parity CPT-code recipe, part -> dim_code/_cat,
supplier -> dim_npi + xrefs), materializes the search index MV once
(StarLake.materialize_search_index — the reference's
comprehensive_search_index), then times N repetitions of each endpoint
family over the MV and reports p50/p95 milliseconds per family.

Timed families (one representative query each, the reference's hot
paths):

* search_code        — /api/search/code  (eq filter + identity rollup)
* search_payer_ilike — /api/search/payer (ILIKE fan-out + rollup)
* explore_avail      — /api/explore/data-availability (category rollup)
* explore_drill      — /api/explore/drill-down (category rollup + source)
* explore_stats      — /api/explore/category-stats (distinct counts)
* market_rates_mv    — partition-pruned read of the materialized
                       market-rates rollup (mv1 serving path)

Usage: python scripts/bench_serving.py [sf_dir] [reps]
Prints one JSON line {"serving_ms": {family: {p50, p95, n}}, "sf": ...}
and, when run from the repo root with BENCH_DETAIL.json present, merges
the serving_ms section into it.
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def build_lake(spark, sf_dir: str):
    """sf-proportional star: every table's cardinality scales with the
    scale factor, so MV size and endpoint cost scale like the real lake's.

    Reuses the parity CPT-code recipe so codes (and the categorizer's
    vocabulary over them) match the rest of the harness."""
    from mrf_etl_spark.plans.parity import _cpt_code_expr, t
    from mrf_etl_spark.plans.queries import StarLake

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")

    state = (
        F.when(F.col("l_suppkey") % 4 == 0, "GA")
        .when(F.col("l_suppkey") % 4 == 1, "FL")
        .when(F.col("l_suppkey") % 4 == 2, "TN")
        .otherwise("AL")
    )
    payer = F.concat(F.lit("payer_"), (F.col("l_orderkey") % 7).cast("string"))
    fact = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("fact_uid"),
        state.alias("state"),
        F.concat(
            F.lit("2025-0"), ((F.col("l_orderkey") % 3) + 1).cast("string")
        ).alias("year_month"),
        payer.alias("payer_slug"),
        F.when(F.col("l_linestatus") == "F", "professional")
        .otherwise("institutional")
        .alias("billing_class"),
        F.lit("CPT").alias("code_type"),
        _cpt_code_expr("l_partkey").alias("code"),
        F.concat(F.lit("pg"), F.col("l_suppkey").cast("string")).alias("pg_uid"),
        F.col("l_extendedprice").alias("negotiated_rate"),
        F.initcap(payer).alias("reporting_entity_name"),
        F.lit("negotiated").alias("negotiated_type"),
        F.lit("ffs").alias("negotiation_arrangement"),
        F.lit("9999-12-31").alias("expiration_date"),
    )
    dim_code = part.select(
        F.lit("CPT").alias("code_type"),
        _cpt_code_expr("p_partkey").alias("code"),
        F.col("p_name").alias("code_description"),
    ).dropDuplicates(["code_type", "code"])
    from mrf_etl_spark.functions.categorizer import categorize_expr

    codes = dim_code.select(F.col("code").alias("proc_cd"))
    dim_code_cat = codes.select(
        "proc_cd",
        categorize_expr(F.col("proc_cd"), 0).alias("proc_set"),
        categorize_expr(F.col("proc_cd"), 1).alias("proc_class"),
        categorize_expr(F.col("proc_cd"), 2).alias("proc_group"),
    )
    npi = (F.lit(1000000000) + F.col("s_suppkey")).cast("string")
    dim_npi = supp.select(
        npi.alias("npi"),
        F.upper(F.col("s_name")).alias("organization_name"),
        F.lit(None).cast("string").alias("first_name"),
        F.lit(None).cast("string").alias("last_name"),
        F.concat(F.lit("Taxonomy "), (F.col("s_nationkey") % 12).cast("string")).alias(
            "primary_taxonomy_desc"
        ),
        F.lit("NPI-2").alias("enumeration_type"),
        F.lit("A").alias("status"),
    )
    xref_npi = supp.select(
        F.concat(F.lit("pg"), F.col("s_suppkey").cast("string")).alias("pg_uid"),
        npi.alias("npi"),
    )
    xref_tin = supp.select(
        F.concat(F.lit("pg"), F.col("s_suppkey").cast("string")).alias("pg_uid"),
        F.lit("ein").alias("tin_type"),
        F.lpad((F.col("s_suppkey") * 7919 % 1000000000).cast("string"), 9, "0").alias(
            "tin_value"
        ),
    )
    return StarLake(
        fact=fact,
        dim_code=dim_code,
        dim_code_cat=dim_code_cat,
        dim_npi=dim_npi,
        xref_npi=xref_npi,
        xref_tin=xref_tin,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from mrf_etl_spark.session import get_spark

    spark = get_spark(app_name="mrf-etl-serving-bench")
    lake = build_lake(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="serving_bench_")
    mv_lake = lake.materialize_search_index(f"{tmp}/search_mv")
    mr_path = f"{tmp}/market_rates"
    mr = lake.materialize_market_rates(mr_path)
    # round-8: third-tier head for the page fetch — top-100 per state
    # pre-ranked, so the request reads exactly 100 rows
    mr_head_path = f"{tmp}/market_rates_head"
    lake.materialize_market_rates_head(mr, mr_head_path, k=100)
    # second-tier MVs (pre-aggregated per-endpoint rollups): built from
    # the materialized index, so the build is one agg job per endpoint
    mv2_lake = (
        mv_lake.materialize_search_rollups(
            f"{tmp}/rollup_mv", search_types=["payer", "billing_code"]
        )
        .materialize_category_stats(f"{tmp}/stats_mv")
        .materialize_category_rollups(
            f"{tmp}/cat_mv", categories=["procedure_set"]
        )
    )

    # one sample code/payer that actually exists, picked deterministically
    sample = mv_lake.search_index().select("code", "payer_slug").first()
    code_val, payer_val = sample["code"], sample["payer_slug"]

    def run_family(fn):
        # warm once (plan compile + codegen), then time reps
        fn().collect()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().collect()
            times.append((time.perf_counter() - t0) * 1000)
        times.sort()
        # nearest-rank p95: the ceil(0.95*n)-th order statistic (index
        # ceil(0.95*n)-1); int(n*0.95) lands one rank high and reports
        # the MAXIMUM at n=20
        p95_idx = max(0, math.ceil(len(times) * 0.95) - 1)
        return {
            "p50": round(statistics.median(times), 1),
            "p95": round(times[p95_idx], 1),
            "n": reps,
        }

    families = {
        # Spark's per-request floor on this session: ONE trivial job
        # (range(1) -> collect). Everything an endpoint costs above this
        # is query work; the floor itself is scheduler + Py4J + Arrow
        # round-trip latency, the part a resident serving tier pays per
        # request no matter how small the data.
        "spark_job_floor": lambda: spark.range(1),
        "search_code": lambda: mv_lake.search_rollup(
            "billing_code", code_val, "GA", "2025-01"
        ),
        "search_payer_ilike": lambda: mv_lake.search_rollup(
            "payer", payer_val[:5], "GA", "2025-01"
        ),
        "explore_avail": lambda: mv_lake.category_rollup(
            "GA", "2025-01", "procedure_set"
        ),
        "explore_drill": lambda: mv_lake.category_rollup(
            "GA", "2025-01", "procedure", source=("payer", payer_val)
        ),
        "explore_stats": lambda: mv_lake.category_statistics("GA", "2025-01"),
        # second-tier pre-aggregated MVs: the same two requests served
        # from per-endpoint rollups (the families above them re-aggregate
        # the pruned index slice per request)
        "search_payer_ilike_mv2": lambda: mv2_lake.search_rollup(
            "payer", payer_val[:5], "GA", "2025-01"
        ),
        "explore_stats_mv2": lambda: mv2_lake.category_statistics(
            "GA", "2025-01"
        ),
        "search_code_mv2": lambda: mv2_lake.search_rollup(
            "billing_code", code_val, "GA", "2025-01"
        ),
        "explore_avail_mv2": lambda: mv2_lake.category_rollup(
            "GA", "2025-01", "procedure_set"
        ),
        # the dashboard page fetch: pruned partition -> top-100 by volume
        # (collecting the WHOLE state slice would bench Arrow transfer of
        # the full rollup, not the serving path a dashboard request takes).
        # Both plans are PREPARED once — the StarLake MV2 endpoints memoize
        # constructed plans per (endpoint, args) (queries.py _memo_plan),
        # so these raw-read families must measure the same serving shape:
        # repeated requests pay execution, not per-request py4j+analysis.
        "market_rates_mv": (
            lambda df: (lambda: df)
        )(
            spark.read.parquet(mr_path)
            .filter(F.col("state") == "GA")
            .orderBy(F.col("p50").desc(), F.col("code"))
            .limit(100)
        ),
        # the same page served from the pre-ranked head: pruned read of
        # exactly k rows, latency tracks k not corpus size
        "market_rates_mv2": (
            lambda df: (lambda: df)
        )(
            spark.read.parquet(mr_head_path)
            .filter(F.col("state") == "GA")
            .orderBy(F.col("p50").desc(), F.col("code"))
            .limit(100)
        ),
    }
    out = {"serving_ms": {}, "sf": float(sf), "reps": reps}
    for name, fn in families.items():
        out["serving_ms"][name] = run_family(fn)
    print(json.dumps(out))

    # Durable sidecar, keyed by sf so multi-scale runs accumulate;
    # bench.py folds this file into BENCH_DETAIL.json on its next run.
    sidecar = Path(__file__).resolve().parents[1] / "BENCH_SERVING.json"
    acc = {}
    if sidecar.is_file():
        try:
            acc = json.loads(sidecar.read_text())
        except ValueError:
            acc = {}
    acc[f"sf{sf}"] = {"reps": reps, **out["serving_ms"]}
    sidecar.write_text(json.dumps(acc, indent=1))

    detail = Path(__file__).resolve().parents[1] / "BENCH_DETAIL.json"
    if detail.is_file():
        d = json.loads(detail.read_text())
        d["serving_ms"] = acc
        detail.write_text(json.dumps(d, indent=1))


if __name__ == "__main__":
    main()
