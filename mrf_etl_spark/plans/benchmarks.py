"""Medicare benchmark builder + joiner (SURVEY §2 A1/A2/A3/A12, J7;
reference: build_medicare_benchmarks.py:100-500,
src/transformers/benchmark_joiner.py:56-198).

Build side — three benchmark dimension tables, each the cross product
state × code enriched with CMS reference data and rate formulas:

  professional:  (w_rvu*w_gpci + pe_rvu*pe_gpci + mp_rvu*mp_gpci) * CF
                 (build_medicare_benchmarks.py:486-500; null RVU→0, null GPCI→1)
  OPPS:          national = rel_wt * 89.169;  stateavg = national *
                 (0.60 * state_wage_index_avg + 0.40)
  ASC:           national = nat_rate;         stateavg = national *
                 (0.50 * state_wage_index_avg + 0.50)
                 (constants: config/settings.py:60-68, CY2025)

Join side (J7) — billing-class split: `professional` rows join the
professional bench; `institutional` rows join OPPS then ASC; anything else
passes through. The reference's positional writeback
(benchmark_joiner.py:121-123) silently assumes 1:1 benchmark keys — here we
make first-match explicit by deduping the bench on its key before joining
(SURVEY §7.3 watch-item 5).

Scale design: every bench table is a dim (50 states × ~10⁴ codes ≈ 5·10⁵
rows ≈ tens of MB) → the class-split joins are broadcast hash joins with no
shuffle of the fact; the split-then-union plan reads the fact once per
branch but both branches prune to their class at the scan via the pushed
`billing_class = ...` filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# CY2025 CMS constants (config/settings.py:60-68, main.py:685-688)
OPPS_CF = 89.169
ASC_CF = 54.895
OPPS_LABOR_SHARE = 0.60
ASC_LABOR_SHARE = 0.50

BENCH_KEY = ["state", "year_month", "code_type", "code"]


def _norm_code(col) -> F.Column:
    """strip/upper HCPCS normalization (rate_calculator.py:78,231)."""
    return F.upper(F.trim(F.col(col).cast("string")))


def state_gpci_averages(gpci: DataFrame, meta: DataFrame) -> DataFrame:
    """State-averaged GPCI triple (A2): GPCI ⋈ locality meta on
    locality_code, state = first 2 uppercase letters of state_name, then
    mean per state (build_medicare_benchmarks.py:434-456)."""
    with_state = gpci.join(
        broadcast(meta.select("state_name", "locality_code").dropDuplicates()),
        on="locality_code",
        how="left",
    ).withColumn("state", F.regexp_extract(F.trim(F.col("state_name")), r"^([A-Z]{2})", 1))
    return (
        with_state.filter(F.col("state") != "")
        .groupBy("state")
        .agg(
            F.avg("work_gpci").alias("work_gpci"),
            F.avg("pe_gpci").alias("pe_gpci"),
            F.avg("mp_gpci").alias("mp_gpci"),
        )
    )


def national_gpci_averages(gpci: DataFrame) -> DataFrame:
    """Whole-table GPCI means (A3, build_medicare_benchmarks.py:316-319)."""
    return gpci.select(
        F.avg("work_gpci").alias("nat_work_gpci"),
        F.avg("pe_gpci").alias("nat_pe_gpci"),
        F.avg("mp_gpci").alias("nat_mp_gpci"),
    )


def state_wage_index_averages(df_wi: DataFrame, wi_col: str = "wage_index") -> DataFrame:
    """State-averaged wage index (A1): 5-digit CBSA rows only, non-rural
    when flagged (build_medicare_benchmarks.py:458-480)."""
    wi = (
        df_wi.withColumn("cbsa_5", F.regexp_extract(F.col("cbsa").cast("string"), r"(\d{5})", 1))
        .withColumn("state_up", F.upper(F.col("state").cast("string")))
        .filter(F.col("cbsa_5") != "")
    )
    if "is_state_rural" in df_wi.columns:
        wi = wi.filter(F.col("is_state_rural").isNull() | (F.col("is_state_rural") == 0))
    return wi.groupBy(F.col("state_up").alias("state")).agg(
        F.avg(wi_col).alias("state_wage_index_avg")
    )


def _combinations(states: DataFrame, codes: DataFrame, code_type: str, year: int) -> DataFrame:
    """state × code cross product (A12, build_medicare_benchmarks.py:137-147).
    Both sides are small dims: the cross join stays on a handful of tasks."""
    return (
        states.crossJoin(codes)
        .withColumn("year_month", F.lit(f"{year}-01"))
        .withColumn("code_type", F.lit(code_type))
    )


def _prof_rate(work_gpci, pe_gpci, mp_gpci) -> F.Column:
    """(w_rvu*w_gpci + pe_rvu*pe_gpci + mp_rvu*mp_gpci) * CF with the
    reference's null policy: RVU null→0, GPCI null→1 (main.py:495-510)."""
    z = lambda c: F.coalesce(F.col(c).cast("double"), F.lit(0.0))  # noqa: E731
    o = lambda c: F.coalesce(c.cast("double"), F.lit(1.0))  # noqa: E731
    return (
        z("work_rvu") * o(work_gpci)
        + z("practice_expense_rvu") * o(pe_gpci)
        + z("malpractice_rvu") * o(mp_gpci)
    ) * F.col("conversion_factor")


def build_professional(
    rvu: DataFrame, gpci: DataFrame, meta: DataFrame, cf: DataFrame, year: int = 2025
) -> DataFrame:
    """bench_medicare_professional: states from locality meta × RVU codes,
    national + state-averaged professional rate
    (build_medicare_benchmarks.py:122-161,294-337)."""
    states = (
        meta.select(
            F.regexp_extract(F.trim(F.col("state_name")), r"^([A-Z]{2})", 1).alias("state")
        )
        .filter(F.col("state") != "")
        .distinct()
    )
    codes = rvu.select(F.col("procedure_code").cast("string").alias("code")).distinct()
    combos = _combinations(states, codes, "CPT", year)

    rvu_lut = rvu.select(
        F.col("procedure_code").cast("string").alias("code"),
        "work_rvu",
        "practice_expense_rvu",
        "malpractice_rvu",
    ).dropDuplicates(["code"])
    cf_val = cf.select(F.col("conversion_factor").cast("double")).limit(1)
    nat = national_gpci_averages(gpci)

    bench = (
        combos.join(broadcast(rvu_lut), on="code", how="left")
        .join(broadcast(state_gpci_averages(gpci, meta)), on="state", how="left")
        .crossJoin(broadcast(cf_val))
        .crossJoin(broadcast(nat))
    )
    return (
        bench.withColumn(
            "medicare_prof_national",
            _prof_rate(F.col("nat_work_gpci"), F.col("nat_pe_gpci"), F.col("nat_mp_gpci")),
        )
        .withColumn(
            "medicare_prof_stateavg",
            _prof_rate(F.col("work_gpci"), F.col("pe_gpci"), F.col("mp_gpci")),
        )
        .withColumn("benchmark_type", F.lit("professional"))
        .withColumn("data_year", F.lit(year).cast("long"))
        .drop("nat_work_gpci", "nat_pe_gpci", "nat_mp_gpci")
    )


def build_opps(opps_b: DataFrame, df_wi: DataFrame, year: int = 2025, wi_col: str = "wage_index") -> DataFrame:
    """bench_medicare_opps: states from wage index × OPPS addendum-B codes
    (build_medicare_benchmarks.py:163-205,339-385)."""
    states = (
        df_wi.select(F.upper(F.col("state").cast("string")).alias("state"))
        .filter(F.col("state").isNotNull())
        .distinct()
    )
    codes = opps_b.select(_norm_code("hcpcs").alias("code")).distinct()
    combos = _combinations(states, codes, "HCPCS", year)

    lut = (
        opps_b.select(
            _norm_code("hcpcs").alias("code"),
            F.col("rel_wt").cast("double").alias("opps_weight"),
            F.col("si").alias("opps_si"),
            F.col("short_desc").alias("opps_short_desc"),
        ).dropDuplicates(["code"])  # explicit LUT dedup (rate_calculator.py:81)
    )
    bench = combos.join(broadcast(lut), on="code", how="left").join(
        broadcast(state_wage_index_averages(df_wi, wi_col)), on="state", how="left"
    )
    return (
        bench.withColumn("medicare_opps_national", F.col("opps_weight") * F.lit(OPPS_CF))
        .withColumn(
            "opps_adj_factor_stateavg",
            F.lit(OPPS_LABOR_SHARE) * F.col("state_wage_index_avg")
            + F.lit(1 - OPPS_LABOR_SHARE),
        )
        .withColumn(
            "medicare_opps_stateavg",
            F.col("medicare_opps_national") * F.col("opps_adj_factor_stateavg"),
        )
        .withColumn("benchmark_type", F.lit("opps"))
        .withColumn("data_year", F.lit(year).cast("long"))
    )


def build_asc(asc_aa: DataFrame, df_wi: DataFrame, year: int = 2025, wi_col: str = "wage_index") -> DataFrame:
    """bench_medicare_asc: states from wage index × ASC addendum-AA codes
    (build_medicare_benchmarks.py:207-247,387-430)."""
    states = (
        df_wi.select(F.upper(F.col("state").cast("string")).alias("state"))
        .filter(F.col("state").isNotNull())
        .distinct()
    )
    codes = asc_aa.select(_norm_code("hcpcs").alias("code")).distinct()
    combos = _combinations(states, codes, "CPT", year)

    lut = asc_aa.select(
        _norm_code("hcpcs").alias("code"),
        F.col("asc_ind").alias("asc_pi"),
        F.col("nat_rate").cast("double").alias("asc_nat_rate"),
        F.col("short_desc").alias("asc_short_desc"),
    ).dropDuplicates(["code"])
    bench = combos.join(broadcast(lut), on="code", how="left").join(
        broadcast(state_wage_index_averages(df_wi, wi_col)), on="state", how="left"
    )
    return (
        bench.withColumn("medicare_asc_national", F.col("asc_nat_rate"))
        .withColumn(
            "asc_adj_factor_stateavg",
            F.lit(ASC_LABOR_SHARE) * F.col("state_wage_index_avg")
            + F.lit(1 - ASC_LABOR_SHARE),
        )
        .withColumn(
            "medicare_asc_stateavg",
            F.col("medicare_asc_national") * F.col("asc_adj_factor_stateavg"),
        )
        .withColumn("benchmark_type", F.lit("asc"))
        .withColumn("data_year", F.lit(year).cast("long"))
    )


def build_comprehensive(prof: DataFrame, opps: DataFrame, asc: DataFrame) -> DataFrame:
    """UNION ALL of the three tables, schema-tolerant
    (build_medicare_benchmarks.py:249-281)."""
    return prof.unionByName(opps, allowMissingColumns=True).unionByName(
        asc, allowMissingColumns=True
    )


# ---------------------------------------------------------------------------
# J7 — billing-class-split benchmark join
# ---------------------------------------------------------------------------

_PROF_COLS = ["medicare_prof_national", "medicare_prof_stateavg",
              "work_rvu", "practice_expense_rvu", "malpractice_rvu", "conversion_factor"]
_OPPS_COLS = ["medicare_opps_national", "medicare_opps_stateavg",
              "opps_weight", "opps_si", "opps_short_desc",
              "state_wage_index_avg", "opps_adj_factor_stateavg"]
_ASC_COLS = ["medicare_asc_national", "medicare_asc_stateavg",
             "asc_pi", "asc_nat_rate", "asc_short_desc", "asc_adj_factor_stateavg"]


def join_benchmarks(
    fact: DataFrame,
    prof: DataFrame,
    opps: DataFrame,
    asc: DataFrame,
    rate_col: str = "rate",
) -> DataFrame:
    """J7 (benchmark_joiner.py:56-198): split the fact by billing_class,
    left-join the class's bench table(s) on (state, year_month, code_type,
    code), compute pct-of-medicare, union the branches back.

    `pct_of_medicare = rate / medicare_prof_stateavg` for professional;
    institutional gets `pct_of_medicare_opps` and `pct_of_medicare_asc`
    plus `benchmark_type='institutional'`. Division by zero/null yields
    null (Spark semantics ≡ the reference's NULLIF guard,
    Data_Schema.md:263). Bench sides are deduped on the key → first-match,
    never row multiplication."""
    rate = F.col(rate_col).cast("double")

    prof_b = broadcast(
        prof.select(*BENCH_KEY, *[c for c in _PROF_COLS if c in prof.columns])
        .dropDuplicates(BENCH_KEY)
    )
    opps_b = broadcast(
        opps.select(*BENCH_KEY, *[c for c in _OPPS_COLS if c in opps.columns])
        .dropDuplicates(BENCH_KEY)
    )
    asc_b = broadcast(
        asc.select(*BENCH_KEY, *[c for c in _ASC_COLS if c in asc.columns])
        .dropDuplicates(BENCH_KEY)
    )

    professional = (
        fact.filter(F.col("billing_class") == "professional")
        .join(prof_b, on=BENCH_KEY, how="left")
        .withColumn(
            "pct_of_medicare",
            F.when(F.col("medicare_prof_stateavg") != 0.0, rate / F.col("medicare_prof_stateavg")),
        )
        .withColumn("benchmark_type", F.lit("professional"))
    )
    institutional = (
        fact.filter(F.col("billing_class") == "institutional")
        .join(opps_b, on=BENCH_KEY, how="left")
        .join(asc_b, on=BENCH_KEY, how="left")
        .withColumn(
            "pct_of_medicare_opps",
            F.when(F.col("medicare_opps_stateavg") != 0.0, rate / F.col("medicare_opps_stateavg")),
        )
        .withColumn(
            "pct_of_medicare_asc",
            F.when(F.col("medicare_asc_stateavg") != 0.0, rate / F.col("medicare_asc_stateavg")),
        )
        .withColumn("benchmark_type", F.lit("institutional"))
    )
    other = fact.filter(
        ~F.col("billing_class").isin("professional", "institutional")
        | F.col("billing_class").isNull()
    )
    return professional.unionByName(institutional, allowMissingColumns=True).unionByName(
        other, allowMissingColumns=True
    )


def coverage_stats(joined: DataFrame) -> DataFrame:
    """A13 (benchmark_joiner.py:200-247): benchmarked vs total counts per
    billing class in ONE aggregate pass of conditional sums."""
    has_prof = F.col("medicare_prof_stateavg").isNotNull() if "medicare_prof_stateavg" in joined.columns else F.lit(False)
    has_inst = (
        (F.col("medicare_opps_stateavg").isNotNull() | F.col("medicare_asc_stateavg").isNotNull())
        if "medicare_opps_stateavg" in joined.columns
        else F.lit(False)
    )
    return joined.agg(
        F.count("*").alias("total_rows"),
        F.sum(F.when(F.col("billing_class") == "professional", 1).otherwise(0)).alias("professional_rows"),
        F.sum(F.when((F.col("billing_class") == "professional") & has_prof, 1).otherwise(0)).alias("professional_benchmarked"),
        F.sum(F.when(F.col("billing_class") == "institutional", 1).otherwise(0)).alias("institutional_rows"),
        F.sum(F.when((F.col("billing_class") == "institutional") & has_inst, 1).otherwise(0)).alias("institutional_benchmarked"),
    )
