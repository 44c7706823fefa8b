"""SparkSession builders.

Local test mode mirrors the cluster defaults that matter for plan shape
(AQE, adaptive coalesce/skew-join, broadcast threshold) so the plans we
verify on local[32] are the plans a 1000-executor cluster would run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults shared between local tests and a real cluster. Everything here
# affects the *logical/physical plan*, not machine sizing.
_PLAN_CONFS = {
    # AQE: runtime re-planning — coalesce small shuffle partitions, convert
    # sort-merge to broadcast when a side turns out small, split skewed
    # partitions. Essential at 100 TB where static stats are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dims in the star schema are KB-MB scale — let them broadcast freely.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for any pandas interchange (mapInPandas enrichment operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Exact ANSI-ish casts stay off (reference is tolerant / coercing).
    "spark.sql.ansi.enabled": "false",
    # Spark has no native parquet TIMESTAMP(NANOS) type; read as long and
    # convert explicitly (see plans/parity.t for the events table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # PySpark 4's per-API-call stack inspection (error call-site capture)
    # costs ~6 ms × every Column/DataFrame op — measured 0.55 s of a single
    # operator's 2 s plan build. Pure driver-side Python overhead; the JVM
    # error messages are unaffected.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(
    app_name: str = "mrf_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a cluster, ``master`` comes from spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]`` and size shuffle partitions to the core
    count (200 default partitions on a 32-core local run just adds task
    overhead; on a real cluster AQE coalesce makes the initial number soft).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # Size the local driver JVM for the machine instead of Spark's 1g
    # default: with 32 executor threads in one JVM, a 1g heap throttles
    # every shuffle/write into 95%-of-heap MemoryManager scaling and
    # spills. Only applies when WE create the JVM (ignored by getOrCreate
    # on an existing session, and never forced on a real cluster where
    # spark-submit owns sizing).
    if "SPARK_MASTER" not in os.environ and master is None:
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
    for k, v in _PLAN_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
