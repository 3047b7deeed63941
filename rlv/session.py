"""SparkSession factory with the engine's tuned defaults.

Local mode stands in for the multi-executor cluster: ``local[N]`` = one JVM, N
executor threads.  The same configs apply cluster-side via spark-submit --conf.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def make_session(
    cpus: int,
    app: str = "rlv",
    shuffle_partitions: int | None = None,
    driver_mem: str = "48g",
) -> SparkSession:
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # long token arrays: keep Arrow batches big enough to amortize the
        # Python-side per-batch fixed costs, small enough to fit worker memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
