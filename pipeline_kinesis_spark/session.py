"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same conf set is what
we would ship to a 1000-executor cluster (AQE, skew-join handling, partial
aggregation, Arrow for the few Pandas-UDF paths). Nothing here is
local-mode-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Per-session defaults. On a real cluster, shuffle partitions scale with
# cores × executors (AQE coalesces down); locally 2× cores is plenty.
_DEFAULTS = {
    # Adaptive execution: runtime re-planning, partition coalescing and
    # skew-join splitting — essential at 100 TB where static planning is
    # always wrong somewhere.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier/part/customer at most SFs)
    # should broadcast: saves a shuffle per join.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Scan granularity: 128 MB input splits keeps task count sane at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Arrow transfer for the (rare) pandas-UDF paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps across Spark and the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Quieter Ivy/UI in test environments.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def _default_driver_mem() -> str:
    """Driver heap: in local mode the driver JVM IS the executor, and
    PySpark's default is 1 GiB regardless of host RAM — the sf1
    scaling probe hit notEnoughMemoryToBuildAndBroadcastTable at
    exactly that ceiling (r10). Size it from the HOST's RAM (~3/8,
    floor 2g, cap 48g) rather than hardcoding one target box: Xmx is
    not reserved up front, so a fixed 48g on a smaller machine starts
    fine but OOM-kills the host under load instead of failing cleanly
    inside Spark (ADVICE r10 #2). SPARK_GRAFT_DRIVER_MEM overrides;
    only effective for the process that launches the JVM — a second
    getOrCreate in the same process reuses the running heap, and on a
    real cluster spark-submit's --driver-memory/--executor-memory
    govern."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        total_gib = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) // (1 << 30)
    except (ValueError, OSError, AttributeError):
        total_gib = 0
    return f"{max(2, min(48, (total_gib * 3) // 8))}g"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pipeline_kinesis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard conf."""
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    conf["spark.driver.memory"] = _default_driver_mem()
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
