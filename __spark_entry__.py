"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship CDC query; ``queries()`` /
``oracle_sql()`` expose the oracle-checked operator registry
(etl_spark/queries.py). The CDC engine itself (LakeTable, merge, streaming
driver) is exercised end-to-end by ``cdc_replay_state`` and by
``python -m pytest tests/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark import queries as _q
from etl_spark.ops.cdcq import cdc_lww_state

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive a CDC change feed, reduce to final transcript state
    with last-writer-wins (the engine's in-batch dedup path)."""
    return cdc_lww_state(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
