"""SparkSession factory.

The reference outsourced planning/execution to a remote warehouse
(epa_ingestion.py:872-878 builds a Snowflake connection); here Spark itself
is the engine, so session construction is where the scale posture is set:
AQE on (runtime coalescing + skew-join handling), Arrow on (vectorized
Python interchange), UTC session time, shuffle partitions sized to the
local core count but overridable for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sf-epa-data-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale notes (100 TB posture):
    - AQE enabled: runtime shuffle-partition coalescing, skew-join
      splitting, and dynamic join-strategy switching replace hand-tuning.
    - ``spark.sql.files.maxPartitionBytes`` left at 128 MB: scan tasks
      stay memory-bounded regardless of total input size.
    - Broadcast threshold left at default 10 MB; dimension tables in this
      workload (region/nation/supplier analogs) are far below it, so
      star joins resolve to broadcast-hash without shuffles.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
