"""SparkSession factory with scale-oriented defaults.

The reference hard-codes ``local[5]`` and ``repartition(5)``
(``distributed_er_pipeline.py:16,47,88,91``).  We instead size shuffle
parallelism from the session's core count and lean on AQE to coalesce /
split partitions at runtime, which is what survives a 1000-executor
cluster: the same code runs unchanged under ``spark-submit --py-files``
against a real cluster master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB target, not the local test box:
#  - AQE on: runtime partition coalescing, skew-join splitting, and
#    dynamic broadcast conversion replace the reference's magic
#    repartition(5) calls.
#  - 128 MiB scan partitions (the reference sets the same at
#    distributed_er_pipeline.py:31) keep scan tasks memory-bounded.
#  - Arrow on: every Python crossing is a vectorized Arrow batch.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
    "spark.ui.enabled": "false",
    "spark.driver.extraJavaOptions": "-Djava.io.tmpdir=/tmp",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def ensure_parallelism(df, min_parts: int | None = None):
    """Fan a narrow scan out to the session's parallelism.

    A small parquet file arrives as ONE scan partition
    (``maxPartitionBytes`` ≫ file size), so every expensive per-row
    expression downstream (shingling, md5, array builds) runs in a
    single task no matter how many cores exist — the scaling killer
    measured in BENCH.md.  At 100 TB the scan is already thousands of
    partitions and this is a no-op (the guard avoids the shuffle);
    locally it buys near-linear fan-out for a few-MB shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "entity-resolution-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master=None`` defers to spark-submit / an existing session so the
    identical code runs on a multi-executor cluster; tests pass
    ``local[N]`` explicitly.
    """
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cores}]")

    conf = dict(_BASE_CONF)
    # Shuffle parallelism ~ 2x cores locally; on a real cluster this is
    # set per-job (or left to AQE's initialPartitionNum) instead.
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or 2 * cores)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
