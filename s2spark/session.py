"""SparkSession builder tuned for the s2spark engine."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "s2spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build a session with the engine's scale-oriented defaults.

    Defaults mirror what we would ship on a real cluster: AQE on (runtime
    coalescing + skew-join splitting), partition sizes tuned so a task's
    working set stays comfortably in executor memory, and Arrow enabled
    for the few pandas-UDF paths.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or int(cpus) * 2))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8k-row Arrow batches: a pandas-UDF kernel's temporaries stay
        # ~2 MB per worker, so 32 concurrent workers fit in L3 instead
        # of thrashing it (measured 2.8x on the encode kernel vs 64k)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
