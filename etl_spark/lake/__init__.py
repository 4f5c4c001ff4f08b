from etl_spark.lake.table import CommitConflictError, LakeTable
from etl_spark.lake.merge import merge_into, MergeStats
from etl_spark.lake.catalog import LakeCatalog, TableNotFoundError

__all__ = [
    "LakeTable",
    "CommitConflictError",
    "merge_into",
    "MergeStats",
    "LakeCatalog",
    "TableNotFoundError",
]
