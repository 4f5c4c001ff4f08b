"""Catalog-bucketed tables: shuffle-free co-located joins (SMB pattern).

The lake's own MERGE already exploits physical bucketing (identity slot
partitioning — lake/merge.py), but that layout is invisible to Catalyst
when two INDEPENDENT datasets are joined: plain parquet scans declare no
output partitioning, so every big join pays two exchanges. Registering
the datasets as catalog bucketed tables (`bucketBy` + `sortBy` on the
join key) lets the planner prove both sides are already hash-distributed
and clustered the same way, and the join compiles to a SortMergeJoin with
ZERO Exchange and ZERO per-task Sort — the single biggest shuffle
eliminator for repeated fact⋈fact joins at 100 TB (both sides are
bucket-pruned, co-located, and streamed).

Reference analog: the pipeline's two long-lived outputs (per-test rows
and annotation rows) are both keyed by test UUID and joined downstream on
it (/root/reference/etl/globals.go:231-306 — standard table pairs;
SURVEY §2.6 J1); materializing both sides bucketed by that key is how a
Spark deployment makes that recurring join exchange-free.

Requirements the helpers encode:
  * both tables bucketed by the SAME columns into the SAME bucket count
    (or an integer multiple — Spark coalesces bucket scans when
    spark.sql.bucketing.coalesceBucketsInJoin.enabled);
  * `sortBy` the join key so the merge phase needs no per-task sort;
  * one file per bucket per write (writers repartition on the bucket
    expression first) — bucketed reads open |buckets| tasks, so stray
    small files multiply read tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as an external catalog table bucketed (and
    sorted) by ``bucket_cols`` — the write shuffles once on the bucket
    key; every later equi-join between tables sharing this layout is
    exchange-free."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (a path-based
    spark.read.parquet would drop the bucket metadata and re-shuffle)."""
    return spark.table(table_name)
