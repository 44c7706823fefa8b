"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in `mrf_etl_spark.plans.parity` (+ parity_llm),
where every SURVEY §2 operator is registered as a (Spark fn, oracle SQL)
pair generated together — see that module for the determinism contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry():
    import mrf_etl_spark.plans.parity as parity

    # LLM-data-pipeline + streaming operators register on import. These
    # imports must be LOUD: round 1 wrapped them in `except ImportError:
    # pass`, which is exactly the failure shape that silently truncates the
    # catalog from 69 to 50 entries with no signal.
    import mrf_etl_spark.plans.parity_llm  # noqa: F401
    import mrf_etl_spark.plans.parity_streaming  # noqa: F401

    return parity.REGISTRY


def _portable(name: str, fn):
    """Wrap a catalog fn so the session-portability confs (nanos-as-long,
    ANSI off, UTC) are applied to whatever SparkSession the caller built —
    the driver's default session otherwise crashes on the TIMESTAMP(NANOS)
    events read and on non-ANSI casts (8+1 red rows in round 1)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mrf_etl_spark.plans.parity import ensure_session_confs

        ensure_session_confs(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = name
    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the multi-hop broadcast
    join chain + aggregation (j4, the Medicare-locality-chain shape)."""
    reg = _registry()
    return _portable("j4_join_chain", reg["j4_join_chain"].spark_fn)(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _portable(name, q.spark_fn) for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}
