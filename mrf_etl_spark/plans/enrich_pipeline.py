"""Wide-table enrichment pipeline (SURVEY §3.1) — the reference's
`HealthcareRateETL.run_full_pipeline()` 13-phase chain (main.py:54-164)
re-expressed as named DataFrame → DataFrame functions composed into ONE
lazy Spark plan.

Reference phase order (main.py:59-73):

    extract+merge (J1) → billing-code filter (P4) → rename (P1) → drop (P2)
    → GA-WC init (P3) → NPPES enrich (S8+J2) → state filter (P5)
    → census geocode (S9) → NPPES col cleanup (P2) → GA-WC merge (J3)
    → categorize (when-chain) → benchmark join (J7) → load (S11)

The reference's generator-of-chunks IR maps 1:1 onto Spark's lazy
transformations; the one pipeline-breaker it has (materializing all chunks
to collect distinct NPIs, geocoder.py:33-68) disappears — the cached-lookup
operator does `distinct()` inside the same job.

Scale notes:
  * providers, GA-WC fee schedule, and benchmark tables are dims →
    broadcast joins; the fact table is never shuffled by this pipeline.
  * The state filter (P5) runs BEFORE geocoding in the reference; we keep
    that order so the expensive external-lookup phases see the pruned set.
  * With `fact` hive-partitioned on (state, ...), Catalyst turns the
    billing-code + state filters into partition pruning + parquet predicate
    pushdown — worth `df.explain()`-checking when wiring real inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mrf_etl_spark.plans.benchmarks import join_benchmarks

# config/settings.py:83-96 (ColumnMapping)
RENAME_DICT = {
    "negotiated_rate": "rate",
    "last_updated_on_x": "rate_updated_on",
    "reporting_entity_name_x": "payer",
    "reporting_entity_type_x": "payer_type",
    "npi": "prov_npi",
    "description": "code_desc",
}
DROP_COLUMNS = [
    "provider_reference_id", "version_x", "provider_group_id",
    "reporting_entity_name_y", "reporting_entity_type_y",
    "last_updated_on_y", "version_y", "expiration_date",
]
GA_WC_INIT_COLUMNS = ["GA_PROF_MAR", "GA_OP_MAR", "GA_ASC_MAR"]  # main.py:264-275
# J2 cleanup (main.py:313-328) — drop the join key + error marker
NPPES_DROP_AFTER_JOIN = ["npi", "error"]
# J3 temp columns (main.py:370-378)
GA_WC_RATE_MAPPING = [("PROF MAR", "GA_PROF_MAR"), ("OP MAR", "GA_OP_MAR"), ("ASC MAR", "GA_ASC_MAR")]
GA_WC_DROP = ["CODE", "MOD", "DESCRIPTION", "FUD", "APC", "SI", "PI"]


@dataclass
class PipelineConfig:
    target_state: str = "GA"  # settings.py:23
    billing_codes: set[str] | None = None  # from cpt_codes.txt (S7)
    rate_min: float = 0.01  # settings.py:77-79 (P7)
    rate_max: float = 50000.0
    drop_columns: list[str] = field(default_factory=lambda: list(DROP_COLUMNS))


def extract_and_merge(rates: DataFrame, providers: DataFrame) -> DataFrame:
    """J1 (main.py:166-187): rates LEFT JOIN providers on
    provider_reference_id = provider_group_id, with pandas-merge `_x`/`_y`
    suffixing of overlapping columns reproduced explicitly (the downstream
    rename/drop maps are written against those names)."""
    overlap = (set(rates.columns) & set(providers.columns)) - {"provider_group_id"}
    left = rates
    right = providers
    for c in sorted(overlap):
        left = left.withColumnRenamed(c, f"{c}_x")
        right = right.withColumnRenamed(c, f"{c}_y")
    # providers is sf-proportional (grows with the MRF): no forced
    # broadcast — stats/AQE pick the strategy (it broadcasts when small)
    return left.join(
        right,
        on=left["provider_reference_id"] == right["provider_group_id"],
        how="left",
    )


def filter_billing_codes(df: DataFrame, codes: set[str] | None) -> DataFrame:
    """P4 (main.py:205-216): keep rows whose billing_code (as string) is in
    the file-driven set; missing file → passthrough. The literal IN-list
    compiles to a broadcast-free hash-set probe in codegen."""
    if not codes:
        return df
    return df.filter(F.col("billing_code").cast("string").isin(sorted(codes)))


def rename_columns(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    """P1 (main.py:220-242): rename only columns that exist."""
    mapping = mapping or RENAME_DICT
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P2 (main.py:244-262): drop only columns that exist (errors='ignore')."""
    return df.drop(*[c for c in cols if c in df.columns])


def init_ga_wc_columns(df: DataFrame) -> DataFrame:
    """P3 (main.py:264-275): literal-null GA WC rate columns."""
    out = df
    for c in GA_WC_INIT_COLUMNS:
        out = out.withColumn(c, F.lit(None).cast("double"))
    return out


def filter_state(df: DataFrame, target_state: str) -> DataFrame:
    """P5 (main.py:286-302): state == TARGET_STATE; no state column →
    passthrough (the reference logs a warning and keeps going)."""
    if "state" not in df.columns:
        return df
    return df.filter(F.col("state") == target_state)


def merge_ga_wc(df: DataFrame, ga_wc: DataFrame) -> DataFrame:
    """J3 (main.py:330-378, ga_wc_processor.py:32-81): LEFT join the GA
    Workers'-Comp fee schedule on billing_code = CODE (both as strings),
    then `combine_first` each MAR column into its GA_* destination —
    coalesce(src, dest) in exactly that argument order (SURVEY §7.3-4) —
    and drop the temp columns. The fee schedule is NOT deduped on CODE:
    duplicate codes multiply rows, faithfully to the reference."""
    right = ga_wc.withColumn("CODE", F.col("CODE").cast("string"))
    joined = df.withColumn("billing_code", F.col("billing_code").cast("string")).join(
        broadcast(right), on=F.col("billing_code") == F.col("CODE"), how="left"
    )
    for src, dest in GA_WC_RATE_MAPPING:
        if src in right.columns and dest in joined.columns:
            joined = joined.withColumn(
                dest, F.coalesce(F.col(f"`{src}`").cast("double"), F.col(dest))
            )
    return drop_columns(joined, GA_WC_DROP + [s for s, _ in GA_WC_RATE_MAPPING])


def filter_taxonomy_whitelist(df: DataFrame, phrases: list[str]) -> DataFrame:
    """P8 (src/transformers/taxonomy_filter.py:45-107): keep rows whose
    lowercase `primary_taxonomy_desc` contains ANY whitelist phrase; empty
    whitelist or missing column → passthrough (the reference warns and
    keeps going). For phrase lists this size an OR-chain of `contains`
    compiles into one codegen'd predicate; for thousands of phrases prefer
    an exploded contains-join."""
    if not phrases or "primary_taxonomy_desc" not in df.columns:
        return df
    desc = F.lower(F.coalesce(F.col("primary_taxonomy_desc"), F.lit("")))
    pred = F.lit(False)
    for p in phrases:
        pred = pred | desc.contains(p.lower())
    return df.filter(pred)


def build_dim_code_cat(crosswalk: DataFrame) -> DataFrame:
    """dim_code_cat from the CMS BETOS 2020 crosswalk
    (prod_etl/create_dim_proc_cat.ipynb cells 1-6): rename
    HCPCS/Level1/Level2/Level3 → proc_cd/proc_set/proc_class/proc_group,
    one row per proc_cd."""
    mapping = {
        "HCPCS": "proc_cd",
        "Level1": "proc_set",
        "Level2": "proc_class",
        "Level3": "proc_group",
    }
    out = crosswalk.withColumnsRenamed(
        {k: v for k, v in mapping.items() if k in crosswalk.columns}
    )
    return out.select("proc_cd", "proc_set", "proc_class", "proc_group").dropDuplicates(
        ["proc_cd"]
    )


def categorize(df: DataFrame, code_col: str = "billing_code") -> DataFrame:
    """Categorizer phase (main.py:1019-1160 / categorizer.py:69-254
    canonical): three derived columns from ONE struct-valued when()-chain
    over staged code attributes — rule conditions evaluate once, inside
    whole-stage codegen, no Python in the hot path."""
    from mrf_etl_spark.functions.categorizer import with_categories

    return with_categories(df, code_col)


def prepare_benchmark_keys(df: DataFrame) -> DataFrame:
    """Map the wide table's column vocabulary onto the benchmark join key
    (state, year_month, code_type, code) expected by J7."""
    out = df
    if "code" not in out.columns:
        out = out.withColumn("code", F.col("billing_code").cast("string"))
    if "code_type" not in out.columns:
        out = out.withColumn("code_type", F.col("billing_code_type"))
    if "year_month" not in out.columns and "rate_updated_on" in out.columns:
        out = out.withColumn(
            "year_month", F.date_format(F.to_date("rate_updated_on"), "yyyy-MM")
        )
    return out


def run_pipeline(
    spark: SparkSession,
    rates: DataFrame,
    providers: DataFrame,
    dim_npi: DataFrame,
    ga_wc: DataFrame | None = None,
    benches: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    cfg: PipelineConfig | None = None,
    geocode_cache: str | None = None,
    output_path: str | None = None,
) -> DataFrame:
    """Compose the 13 phases into one lazy plan. Enrichment runs offline:
    NPPES via dim_npi join (the production fallback), geocoding only when a
    cache path is supplied. Returns the final wide DataFrame; writes it
    when ``output_path`` is given (S11)."""
    from mrf_etl_spark.operators.enrichment import enrich_census_geocode, enrich_nppes

    cfg = cfg or PipelineConfig()

    df = extract_and_merge(rates, providers)  # J1
    df = filter_billing_codes(df, cfg.billing_codes)  # P4
    df = rename_columns(df)  # P1
    df = drop_columns(df, cfg.drop_columns)  # P2
    df = init_ga_wc_columns(df)  # P3
    df = enrich_nppes(spark, df, "prov_npi", dim_npi=dim_npi)  # S8 + J2
    df = drop_columns(df, NPPES_DROP_AFTER_JOIN)
    df = filter_state(df, cfg.target_state)  # P5
    if geocode_cache is not None:  # S9
        df = enrich_census_geocode(spark, df, cache_path=geocode_cache)
    if ga_wc is not None:
        df = merge_ga_wc(df, ga_wc)  # J3
    df = categorize(df)  # when-chain
    if benches is not None:  # J7
        df = join_benchmarks(prepare_benchmark_keys(df), *benches)
    if output_path is not None:  # S11
        df.write.mode("overwrite").parquet(output_path)
        return spark.read.parquet(output_path)
    return df
