"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the configuration below is chosen so the
same code is correct and fast on a multi-executor cluster:

* AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB the
  optimizer's static shuffle-partition guess is always wrong; AQE re-plans.
* ``spark.sql.session.timeZone=UTC`` — parquet timestamps are naive; the
  DuckDB oracle treats them as UTC-naive, so Spark must too.
* Arrow enabled — vectorized toPandas()/createDataFrame and Pandas UDFs.
* Shuffle partitions default to the local core count; on a real cluster this
  is overridden (or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fuel-analytics-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Pin the Python workers to THIS interpreter unless the caller
    # already chose one: PySpark otherwise resolves `python3` from
    # PATH, and a PATH where another distribution shadows the driver's
    # python fails every task with PYTHON_VERSION_MISMATCH (observed
    # locally: conda 3.13 shadowing the 3.11 driver). sys.executable
    # is by definition version-matched to the driver.
    import sys

    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet uses TIMESTAMP(NANOS); Spark reads it as long
        # (nanos since epoch) under this flag — sources/readers converts
        # back to TimestampType losslessly (values are µs-aligned).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # static conf: the generated-class cache defaults to 100 entries,
        # which a 50-query workload overflows — evicted wide expressions
        # (language-ID WHEN chains, 64-agg MinHash) pay janino recompiles
        # of ~5 s on their next run.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
