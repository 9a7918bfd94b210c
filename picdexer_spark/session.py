"""SparkSession factory tuned for the engine.

Local mode is the sandbox stand-in for a multi-executor cluster; every knob
here is chosen to also be right at cluster scale (AQE on, shuffle partitions
sized to cores locally / would be 2-3x total cores on a cluster, Arrow on
for the pandas-UDF boundary, UTC pinned for oracle comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _ensure_pythonpath() -> None:
    """Make the package importable in Spark's Python UDF workers.

    Local mode workers inherit the driver env, so exporting PYTHONPATH
    before the JVM starts is enough; on a real cluster the job ships the
    package via ``spark-submit --py-files`` (the north-rule deployment).
    """
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_root not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + current if current else "")
        )


def get_spark(
    app_name: str = "picdexer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    _ensure_pythonpath()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = cpus if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces by shuffle BYTES; our post-shuffle stages (Arrow
        # encode, pandas extract) are CPU-bound on small bytes — keep at
        # least core-count partitions so coalescing can't serialize them
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64kb"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
