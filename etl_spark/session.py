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
    executors: int | None = None,
    executor_cores: int = 8,
    executor_mem_mb: int = 16384,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    Two shapes:
      * ``cores`` → ``local[cores]``: one JVM, N threads. Simple, but a
        single JVM stops scaling past ~8 cores (GC/allocator/lock
        contention — the reason real deployments cap executors at 5-8
        cores).
      * ``executors`` → ``local-cluster[executors, executor_cores, mem]``:
        separate executor JVMs on this machine — the faithful stand-in for
        a multi-executor cluster and the shape the N-vs-4N scaling
        evidence uses.

    On a real cluster the same code runs under ``spark-submit --py-files``
    with executor counts N and 4N — nothing here assumes single-process
    execution (all logic is DataFrame-plan level; partitioning is explicit
    where it matters).
    """
    if executors is not None:
        total = executors * executor_cores
        if shuffle_partitions is None:
            # 4 waves of reduce tasks per stage: the dedup/window exchange
            # keys on the table bucket, and Zipf-hot buckets straggle if the
            # stage is a single wave (measured: 0.55 core utilization at
            # 1 wave; multi-wave scheduling backfills the idle cores).
            # AQE's parallelismFirst keeps this count (it only coalesces
            # below-1-MiB slivers).
            shuffle_partitions = max(4 * total, 16)
        master = f"local-cluster[{executors},{executor_cores},{executor_mem_mb}]"
        # executor JVMs spawn their own Python workers, which must be able
        # to import this package (the local analog of --py-files)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra_conf = dict(extra_conf or {})
        prev = extra_conf.get("spark.executorEnv.PYTHONPATH", "")
        extra_conf["spark.executorEnv.PYTHONPATH"] = (
            f"{repo_root}:{prev}" if prev else repo_root
        )
        # CRITICAL: without this, executors get Spark's 1 GiB default heap,
        # OOM under real batches, and are silently killed+relaunched in a
        # loop (observed: 100+ executor incarnations per app, whole-stage
        # stalls of 30-75 s). Size the heap to the worker allowance minus
        # overhead headroom.
        extra_conf.setdefault(
            "spark.executor.memory", f"{max(1024, executor_mem_mb - 4096)}m"
        )
        # Each executor JVM sizes GC/JIT/netty pools as if it owned EVERY
        # host core (os.cpu_count()), so N executors spawn N*~30 background
        # threads that thrash each other. Cap them to the executor's core
        # share — on a real cluster the container runtime does this for us.
        gc_threads = max(2, executor_cores)
        extra_conf.setdefault(
            "spark.executor.extraJavaOptions",
            f"-XX:ParallelGCThreads={gc_threads} -XX:ConcGCThreads=2 "
            f"-XX:CICompilerCount=2 "
            f"-XX:ActiveProcessorCount={executor_cores}",
        )
        extra_conf.setdefault("spark.shuffle.io.serverThreads", str(executor_cores))
        extra_conf.setdefault("spark.shuffle.io.clientThreads", str(executor_cores))
    else:
        if cores is None:
            cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
        total = cores
        if shuffle_partitions is None:
            shuffle_partitions = max(cores, 8)
        master = f"local[{cores}]"
    cores = total
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default) carries NO parquet column statistics;
        # TIMESTAMP_MICROS makes ts min/max available to manifest file
        # metrics and row-group skipping (and is the Iceberg-spec type)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # CDC inputs live in object storage (no data locality exists) and
        # lake buckets are hash-placed, so a 3 s locality wait per task is
        # pure scheduling stall — measured: multi-second "scan" phases on
        # multi-executor runs whose map work is <1 s. Standard setting for
        # storage-disaggregated clusters.
        .config("spark.locality.wait", "0s")
        # File-index listing: above this many paths Spark launches a
        # whole Spark JOB just to stat the files (default threshold 32).
        # MOR tables pass hundreds of explicit delta-file paths per read,
        # and the listing job was measured at 0.5-1.2s of pure overhead
        # per micro-batch (growing with table age). Driver-side listing
        # of a few thousand paths is microseconds on a filesystem and one
        # batched LIST on object storage — keep the job for truly huge
        # file sets only.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
        # PySpark 4 wraps every DataFrame/Column call to capture the
        # Python call site for error enrichment: getActiveSession +
        # conf.get + two extra py4j round-trips PER API CALL. Measured at
        # ~1s of pure driver time per CDC micro-batch (≈2.8ms × ~400
        # calls) — a fixed tax on every plan build. Ingest is a
        # long-running service, not a notebook; trade the prettier
        # tracebacks for per-batch latency.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
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
