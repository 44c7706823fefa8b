from mrf_etl_spark.plans.parity import REGISTRY, ParityQuery

__all__ = ["REGISTRY", "ParityQuery"]
