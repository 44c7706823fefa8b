"""Cluster sizing: turn (data volume, cluster shape) into session confs.

Local runs hard-code sensible smalls (session.py); a 100 TB run needs the
three volume-coupled knobs derived, not guessed:

  * ``spark.sql.shuffle.partitions`` — the INITIAL shuffle width. Too low
    → partitions overflow executor memory and spill (a 100 TB shuffle at
    the 200 default = 500 GB per partition); too high only costs
    scheduling, and AQE coalesce heals it downward at runtime. So derive
    from bytes: one partition per ~128 MB of the largest expected
    shuffle, floored at 2 tasks per core for scheduling overlap.
  * ``spark.sql.files.maxPartitionBytes`` — scan split size. 128 MB
    aligns with parquet row-group practice; raising it to 256-512 MB
    reduces task count on pure-scan pipelines but hurts skew/failure
    granularity — stay at 128 MB unless tasks are provably scan-bound.
  * ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` — what AQE
    coalesces TOWARD; keep it equal to the shuffle target so pre- and
    post-AQE plans agree.

Everything else that matters at scale is volume-independent and already
in session._PLAN_CONFS (AQE + skew join, broadcast threshold, Arrow).

The helper returns plain conf dicts so callers compose them into
``get_spark(extra_conf=...)`` or spark-submit ``--conf`` lines; nothing
here talks to a cluster manager.
"""

from __future__ import annotations

TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def cluster_plan(
    input_tb: float,
    executors: int,
    cores_per_executor: int = 4,
    shuffle_fraction: float = 0.5,
) -> dict[str, str]:
    """Session confs for a cluster of ``executors`` × ``cores_per_executor``
    processing ``input_tb`` terabytes.

    ``shuffle_fraction`` estimates the largest single shuffle relative to
    input size (joins/aggs over pre-filtered, column-pruned data rarely
    shuffle the full input; 0.5 is conservative for this catalog, where
    dims broadcast and facts pre-filter before their one shuffle join).
    """
    if input_tb <= 0 or executors <= 0 or cores_per_executor <= 0:
        raise ValueError("input_tb, executors, cores_per_executor must be > 0")
    total_cores = executors * cores_per_executor
    shuffle_bytes = input_tb * 1e12 * shuffle_fraction
    by_bytes = int(shuffle_bytes // TARGET_PARTITION_BYTES) + 1
    partitions = max(2 * total_cores, by_bytes)
    return {
        "spark.sql.shuffle.partitions": str(partitions),
        "spark.sql.files.maxPartitionBytes": str(TARGET_PARTITION_BYTES),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            TARGET_PARTITION_BYTES
        ),
        # one in-flight task wave queued behind the running wave
        "spark.default.parallelism": str(2 * total_cores),
    }
