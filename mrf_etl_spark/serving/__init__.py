"""Thin JSON serving layer over the StarLake query vocabulary (SURVEY
§3.3) — the Spark counterpart of the reference's FastAPI backend."""

from mrf_etl_spark.serving.api import RateAPI, serve

__all__ = ["RateAPI", "serve"]
