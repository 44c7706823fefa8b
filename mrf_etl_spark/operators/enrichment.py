"""Cached external-lookup enrichment operators (SURVEY §2.1 S8-S10, S17).

The reference enriches rows from three REST sources — the NPPES registry
(src/transformers/geocoder.py:94-258), the Census geocoder
(geocoder.py:330-405), and the HUD ZIP→CBSA crosswalk
(src/utils/api_clients.py:262-307) — with a JSON-file cache
(geocoder.py:260-277) and ThreadPoolExecutor fan-out.

Spark-first re-expression — one reusable operator shape:

    distinct keys → anti-join persisted cache → mapInPandas fetch over the
    MISSES only (rate-limited, bounded parallelism) → latest-merge results
    into the cache table → left-join the cache back to the fact flow.

Scale design:
  * The fetch job's parallelism is bounded by ``fetch_partitions`` (the
    reference's 5-10 worker cap), independent of cluster size — you do not
    want 1000 executors hammering a public API. ``coalesce`` (not
    repartition) avoids an extra shuffle of the tiny miss set.
  * The cache is a normal table: the anti-join reads only its key column
    (Catalyst prunes), so re-runs cost O(distinct keys), and the
    latest-merge (W1 window) keeps exactly one newest row per key.
  * The join-back is a plain left join on the key; the cache for NPPES-scale
    data (~millions of providers) broadcasts if small, shuffles if not —
    left to AQE.

The build environment has no network, so every source has an OFFLINE
deterministic fetcher (fixture-backed fake, same output schema); the online
fetchers are written against public API shapes but gated behind import-try
and never exercised in tests. Offline mode for NPPES additionally supports
"join an existing dim_npi" (the reference's own production fallback —
prod_etl/utils/utils_nppes.py keeps dim_npi as the source of truth).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mrf_etl_spark.io.writers import latest_merge

# A fetcher maps a batch of string keys → a pandas DataFrame of parsed
# records (one row per key, schema = the operator's result schema).
Fetcher = Callable[[list[str]], pd.DataFrame]


@dataclass
class LookupConfig:
    """Knobs mirroring the reference's API etiquette
    (batch_size=50, workers=5, 2s inter-batch — geocoder.py:234-258)."""

    batch_size: int = 50
    fetch_partitions: int = 5  # == max concurrent API clients cluster-wide
    inter_batch_sleep_s: float = 0.0  # 2.0 for real APIs; 0 for offline


def _empty_like(schema: T.StructType) -> pd.DataFrame:
    return pd.DataFrame({f.name: pd.Series(dtype="object") for f in schema.fields})


def cached_lookup(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    cache_path: str,
    fetcher: Fetcher,
    result_schema: T.StructType,
    cfg: LookupConfig | None = None,
    order_col: str = "last_updated",
) -> DataFrame:
    """Enrich ``df`` with one row of ``result_schema`` per ``key_col`` value,
    fetching only keys absent from the cache table at ``cache_path``.

    Returns ``df`` left-joined with the refreshed cache. Idempotent: a
    second run with the same data fetches nothing (cache hit via anti-join),
    matching the reference's resumable-fetch flag semantics
    (prod_etl/fetch_npi_data_fast.py:49-81).
    """
    cfg = cfg or LookupConfig()
    keys = df.select(F.col(key_col).cast("string").alias(key_col)).filter(
        F.col(key_col).isNotNull()
    ).distinct()

    import os

    if os.path.exists(cache_path):
        cache = spark.read.parquet(cache_path)
        misses = keys.join(cache.select(key_col), on=key_col, how="left_anti")
    else:
        misses = keys

    batch_size, sleep_s = cfg.batch_size, cfg.inter_batch_sleep_s

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            vals = pdf[key_col].tolist()
            for i in range(0, len(vals), batch_size):
                out = fetcher(vals[i : i + batch_size])
                yield out if len(out) else _empty_like(result_schema)
                if sleep_s and i + batch_size < len(vals):
                    time.sleep(sleep_s)

    fetched = misses.coalesce(cfg.fetch_partitions).mapInPandas(
        fetch_partition, schema=result_schema
    )
    # Persist results; newest record wins per key (W1 window inside).
    latest_merge(spark, fetched, cache_path, keys=[key_col], order_col=order_col)

    cache = spark.read.parquet(cache_path)
    return df.join(cache, on=key_col, how="left")


# ---------------------------------------------------------------------------
# NPPES registry (S8)
# ---------------------------------------------------------------------------

NPPES_RESULT = T.StructType(
    [
        T.StructField("npi", T.StringType()),
        T.StructField("enumeration_type", T.StringType()),
        T.StructField("org_name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("primary_taxonomy_code", T.StringType()),
        T.StructField("primary_taxonomy_desc", T.StringType()),
        T.StructField("address_purpose", T.StringType()),
        T.StructField("address_type", T.StringType()),
        T.StructField("address_1", T.StringType()),
        T.StructField("address_2", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("telephone_number", T.StringType()),
        T.StructField("fax_number", T.StringType()),
        T.StructField("last_updated", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def parse_nppes_payload(npi: str, payload: dict | None) -> dict:
    """Flatten an NPPES API v2.1 payload to one record — LOCATION-preferred
    address, primary taxonomy (geocoder.py:156-217 semantics; also
    api_clients.py:81-140)."""
    out = {f.name: None for f in NPPES_RESULT.fields}
    out["npi"] = str(npi)
    if not payload or (isinstance(payload, dict) and payload.get("error")):
        out["error"] = payload.get("error") if isinstance(payload, dict) else "no_payload"
        return out
    if not payload.get("result_count"):
        out["error"] = "no_results"
        return out
    res = payload["results"][0]
    out["enumeration_type"] = res.get("enumeration_type")
    basic = res.get("basic") or {}
    out["org_name"] = basic.get("organization_name")
    out["status"] = basic.get("status")
    out["last_updated"] = basic.get("last_updated")
    addrs = res.get("addresses") or []
    loc = next(
        (a for a in addrs if (a.get("address_purpose") or "").upper() == "LOCATION"),
        addrs[0] if addrs else {},
    )
    for k in (
        "address_purpose", "address_type", "address_1", "address_2", "city",
        "state", "postal_code", "country_code", "telephone_number", "fax_number",
    ):
        out[k] = loc.get(k)
    prim = next((t for t in (res.get("taxonomies") or []) if t.get("primary")), None)
    if prim:
        out["primary_taxonomy_code"] = prim.get("code")
        out["primary_taxonomy_desc"] = prim.get("desc")
    return out


def fake_nppes_payload(npi: str) -> dict:
    """Deterministic fake NPPES v2.1 payload keyed off the NPI digits —
    shared by the offline fetcher and the dim-builder tests so the cached
    lookup and dim_npi/dim_npi_address agree on the same record."""
    # 60-bit md5 prefix: the SAME integer DuckDB computes as
    # CAST('0x' || substring(md5(npi), 1, 15) AS BIGINT), so parity
    # oracles can replay every derived field exactly
    h = int(hashlib.md5(str(npi).encode()).hexdigest()[:15], 16)
    org = h % 3 == 0  # NPI-2 organizations vs NPI-1 individuals
    return {
        "result_count": 1,
        "results": [
            {
                "enumeration_type": "NPI-2" if org else "NPI-1",
                "basic": {
                    "organization_name": f"PROVIDER GROUP {h % 997}" if org else None,
                    "first_name": None if org else f"FIRST{h % 53}",
                    "last_name": None if org else f"LAST{h % 101}",
                    "credential": None if org else ("MD" if h % 2 else "DO"),
                    "status": "A",
                    "sole_proprietor": "NO" if org else "YES",
                    "enumeration_date": "20%02d-01-15" % (10 + h % 14),
                    "last_updated": "2024-0%d-01" % (h % 9 + 1),
                    "replacement_npi": None,
                },
                "addresses": [
                    {"address_purpose": "MAILING", "address_1": "PO BOX 1"},
                    {
                        "address_purpose": "LOCATION",
                        "address_type": "DOM",
                        "address_1": f"{h % 9000 + 100} MAIN ST",
                        "city": "ATLANTA",
                        "state": "GA",
                        "postal_code": f"{30000 + h % 400:05d}",
                        "country_code": "US",
                        "telephone_number": f"404-555-{h % 10000:04d}",
                    },
                ],
                "taxonomies": [
                    {
                        "code": f"20{h % 10}X00000X",
                        "desc": "Internal Medicine",
                        "state": "GA",
                        "license": f"L{h % 100000:05d}",
                        "primary": True,
                    },
                    {"code": "999", "desc": "other", "primary": False},
                ],
            }
        ],
    }


def offline_nppes_fetcher(npis: list[str]) -> pd.DataFrame:
    """Deterministic fake NPPES source: synthesizes a realistic payload from
    the NPI digits and runs it through the REAL parser, so the parse path is
    exercised end-to-end without network."""
    records = [parse_nppes_payload(npi, fake_nppes_payload(npi)) for npi in npis]
    return pd.DataFrame(records, columns=[f.name for f in NPPES_RESULT.fields])


def make_online_nppes_fetcher(timeout: int = 15) -> Fetcher:
    """Real NPPES API fetcher (public endpoint, geocoder.py:105-152
    etiquette: retry with backoff, 429 handling). Never called in tests —
    the build environment is offline."""

    def fetch(npis: list[str]) -> pd.DataFrame:
        import time

        import requests  # gated: only needed online

        records = []
        for npi in npis:
            payload, tries = None, 0
            while tries < 4:
                tries += 1
                try:
                    r = requests.get(
                        "https://npiregistry.cms.hhs.gov/api/",
                        params={"number": npi, "version": "2.1"},
                        timeout=timeout,
                    )
                    if r.status_code == 429:
                        time.sleep(min(5.0, 1.5 * tries))
                        continue
                    r.raise_for_status()
                    payload = r.json()
                    break
                except Exception as e:  # noqa: BLE001 — log-and-continue policy
                    payload = {"error": str(e)}
                    time.sleep(1.2 * tries)
            records.append(parse_nppes_payload(npi, payload))
        return pd.DataFrame(records, columns=[f.name for f in NPPES_RESULT.fields])

    return fetch


def enrich_nppes(
    spark: SparkSession,
    df: DataFrame,
    npi_col: str,
    cache_path: str | None = None,
    fetcher: Fetcher | None = None,
    dim_npi: DataFrame | None = None,
    cfg: LookupConfig | None = None,
) -> DataFrame:
    """NPPES enrichment (S8 + J2). Two modes:

    * ``dim_npi`` given → pure offline: left join the existing dim table
      (utils_nppes.py production path; no fetch at all).
    * else → cached_lookup with ``fetcher`` (offline fake by default).

    Matches the reference's J2 shape: left join, then the `error` column is
    the caller's to drop (main.py:313-328).
    """
    if dim_npi is not None:
        right = dim_npi.withColumnRenamed("npi", npi_col) if npi_col != "npi" else dim_npi
        return df.join(right, on=npi_col, how="left")
    assert cache_path is not None
    fetcher = fetcher or offline_nppes_fetcher
    renamed = NPPES_RESULT if npi_col == "npi" else T.StructType(
        [T.StructField(npi_col if f.name == "npi" else f.name, f.dataType) for f in NPPES_RESULT.fields]
    )

    def keyed_fetch(keys: list[str]) -> pd.DataFrame:
        out = fetcher(keys)
        return out.rename(columns={"npi": npi_col}) if npi_col != "npi" else out

    return cached_lookup(
        spark, df, npi_col, cache_path, keyed_fetch, renamed, cfg=cfg
    )


# ---------------------------------------------------------------------------
# Census geocoder (S9)
# ---------------------------------------------------------------------------

GEOCODE_RESULT = T.StructType(
    [
        T.StructField("geocode_key", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("cbsa_geoid", T.StringType()),
        T.StructField("cbsa_name", T.StringType()),
        T.StructField("last_updated", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def geocode_key_expr(
    address_1: str = "address_1",
    city: str = "city",
    state: str = "state",
    postal_code: str = "postal_code",
) -> F.Column:
    """Deterministic cache key for an address — md5 of the normalized
    oneline form the reference sends to the API (geocoder.py:355-359:
    'address_1, city, state zip5')."""
    oneline = F.concat_ws(
        ", ",
        F.trim(F.col(address_1)),
        F.trim(F.col(city)),
        F.concat_ws(" ", F.trim(F.col(state)), F.substring(F.trim(F.col(postal_code)), 1, 5)),
    )
    return F.md5(F.lower(oneline))


def offline_census_fetcher(keys: list[str]) -> pd.DataFrame:
    """Deterministic fake geocoder: stable lat/lon in the GA bounding box +
    a CBSA drawn from a small fixed set, keyed off the address hash."""
    rows = []
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)  # 60-bit, oracle-replayable
        cbsas = [
            ("12060", "Atlanta-Sandy Springs-Roswell, GA Metro Area"),
            ("42340", "Savannah, GA Metro Area"),
            ("12260", "Augusta-Richmond County, GA-SC Metro Area"),
            (None, None),  # ~25% no_match, like real geocoding
        ]
        geoid, name = cbsas[h % 4]
        rows.append(
            {
                "geocode_key": k,
                "lat": None if geoid is None else 30.0 + (h % 5_000_000) / 1_000_000,
                "lon": None if geoid is None else -85.0 + (h % 4_000_000) / 1_000_000,
                "cbsa_geoid": geoid,
                "cbsa_name": name,
                "last_updated": "2024-01-01",
                "error": "no_match" if geoid is None else None,
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in GEOCODE_RESULT.fields])


def enrich_census_geocode(
    spark: SparkSession,
    df: DataFrame,
    cache_path: str,
    fetcher: Fetcher | None = None,
    cfg: LookupConfig | None = None,
) -> DataFrame:
    """Address → lat/lon/CBSA enrichment (S9). Keys on the md5 of the
    normalized address so the distinct-addresses dedup (geocoder.py:459-470)
    falls out of the cached_lookup shape for free."""
    keyed = df.withColumn("geocode_key", geocode_key_expr())
    return cached_lookup(
        spark,
        keyed,
        "geocode_key",
        cache_path,
        fetcher or offline_census_fetcher,
        GEOCODE_RESULT,
        cfg=cfg,
    )


# ---------------------------------------------------------------------------
# HUD ZIP → CBSA (S10)
# ---------------------------------------------------------------------------

HUD_RESULT = T.StructType(
    [
        T.StructField("zip", T.StringType()),
        T.StructField("cbsa", T.StringType()),
        T.StructField("cbsaname", T.StringType()),
        T.StructField("tot_ratio", T.DoubleType()),
        T.StructField("last_updated", T.StringType()),
    ]
)


def offline_hud_fetcher(zips: list[str]) -> pd.DataFrame:
    """Deterministic fake HUD crosswalk. Emits 1-3 candidate CBSA rows per
    ZIP with ratios, exactly like the real API — the best-per-key window
    below must pick the highest tot_ratio (api_clients.py:301-306)."""
    rows = []
    for z in zips:
        h = int(hashlib.md5(str(z).encode()).hexdigest()[:15], 16)  # 60-bit, oracle-replayable
        n = h % 3 + 1
        ratios = [round(0.5 + 0.4 * (i + 1) / n, 3) for i in range(n)]
        for i, r in enumerate(ratios):
            rows.append(
                {
                    "zip": z,
                    "cbsa": f"{10000 + (h + i) % 900:05d}",
                    "cbsaname": f"CBSA {(h + i) % 900}",
                    "tot_ratio": r,
                    "last_updated": "2024-01-01",
                }
            )
    return pd.DataFrame(rows, columns=[f.name for f in HUD_RESULT.fields])


def zip_to_cbsa(
    spark: SparkSession,
    df: DataFrame,
    zip_col: str,
    cache_path: str,
    fetcher: Fetcher | None = None,
    cfg: LookupConfig | None = None,
) -> DataFrame:
    """ZIP → single best CBSA (S10 + W2): cached fetch of candidate rows,
    then keep the highest-`tot_ratio` row per ZIP before joining back."""
    fetcher = fetcher or offline_hud_fetcher

    def keyed(keys: list[str]) -> pd.DataFrame:
        return fetcher(keys)

    keys = df.select(F.col(zip_col).cast("string").alias("zip")).filter(
        F.col("zip").isNotNull()
    ).distinct()

    import os

    if os.path.exists(cache_path):
        cache = spark.read.parquet(cache_path)
        misses = keys.join(cache.select("zip"), on="zip", how="left_anti")
    else:
        misses = keys
    cfg = cfg or LookupConfig()
    fetched = misses.coalesce(cfg.fetch_partitions).mapInPandas(
        lambda it: (keyed(p["zip"].tolist()) for p in it), schema=HUD_RESULT
    )
    # Cache keeps ALL candidate rows (key = zip+cbsa); best-per-zip is a view.
    latest_merge(spark, fetched, cache_path, keys=["zip", "cbsa"], order_col="last_updated")
    cache = spark.read.parquet(cache_path)
    from pyspark.sql.window import Window

    w = Window.partitionBy("zip").orderBy(F.col("tot_ratio").desc(), F.col("cbsa").asc())
    best = (
        cache.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("zip", "cbsa", "cbsaname")
    )
    right = best.withColumnRenamed("zip", zip_col) if zip_col != "zip" else best
    return df.join(right, on=zip_col, how="left")
