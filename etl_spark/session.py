"""SparkSession builders.

Local-mode sessions are parameterized on core count so the same job can run
at two parallelism levels (local[8] vs local[32]) to evidence the N→4N
scaling-efficiency criterion (reference cluster shape: 8 replicas × 15 CPU,
/root/reference/k8s/data-pipeline/deployments/parser.yml:7,81-87).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "etl_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    Design note: in local mode there is one JVM; ``spark.driver.memory``
    is the only memory knob. On a real cluster the same code runs under
    ``spark-submit --py-files`` with executor counts N and 4N — nothing
    here assumes single-process execution (all logic is DataFrame-plan
    level; partitioning is explicit where it matters).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.ignoreCorruptFiles", "false")  # fail loud, cf. SURVEY §2.9
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
