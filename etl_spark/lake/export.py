"""Hive-partitioned export sink: publish lake state (or any curated
DataFrame) as a directory-partitioned dataset downstream consumers read
without this engine.

Reference analog: the pipeline's terminal sink is a date-partitioned
BigQuery table loaded from per-day GCS prefixes, re-loadable one
partition at a time (/root/reference/etl/globals.go:231-306 — table$DATE
partition decorators; /root/reference/storage/rowwriter.go:83-171 —
per-prefix atomic objects). The Spark-native equivalent is a
``partitionBy`` parquet write with DYNAMIC partition overwrite: a re-run
of one day replaces exactly that day's directory and leaves every other
partition byte-identical — the same "reprocess one date, never clobber
the table" contract the reference gets from partition decorators.

Scale notes:
  * dynamic mode (spark.sql.sources.partitionOverwriteMode=dynamic)
    stages the write and deletes ONLY partitions present in the incoming
    frame at commit — re-running a daily export is idempotent and
    partition-scoped, not a full-table truncate (static mode's behavior).
  * one output file per (partition, bucket-task): callers repartition by
    the partition columns so writers don't fan out |tasks| × |partitions|
    small files — at 10^10 rows the repartition IS the sort-shuffle that
    makes each partition directory a few large files.
  * export formats: parquet (default), orc, json, csv — whatever Spark
    ships; the format string is passed through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def export_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    dynamic: bool = True,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` Hive-partitioned by ``partition_cols``.

    ``dynamic=True`` → overwrite replaces only the partitions present in
    ``df`` (daily re-export semantics); ``dynamic=False`` → classic full
    overwrite. ``files_per_partition`` controls the pre-write shuffle:
    rows are repartitioned on the partition columns (+ a stable spread
    key when >1 file is wanted) so each partition directory gets a
    bounded number of files regardless of input parallelism."""
    spark = df.sparkSession
    from pyspark.sql import functions as F

    if files_per_partition <= 1:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        spread = (F.xxhash64(*df.columns) % files_per_partition).alias("__spread")
        out = (
            df.withColumn("__spread", spread)
            .repartition(*([F.col(c) for c in partition_cols] + [F.col("__spread")]))
            .drop("__spread")
        )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, None)
    spark.conf.set(mode_key, "dynamic" if dynamic else "static")
    try:
        (
            out.write.format(fmt)
            .mode("overwrite")
            .partitionBy(*partition_cols)
            .save(path)
        )
    finally:
        if prev is not None:
            spark.conf.set(mode_key, prev)


def read_export(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned export back (partition columns come from the
    directory layout — partition pruning applies to filters on them)."""
    return spark.read.format(fmt).load(path)
