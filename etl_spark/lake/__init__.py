from etl_spark.lake.table import LakeTable
from etl_spark.lake.merge import merge_into, MergeStats
from etl_spark.lake.catalog import LakeCatalog, TableNotFoundError

__all__ = [
    "LakeTable",
    "merge_into",
    "MergeStats",
    "LakeCatalog",
    "TableNotFoundError",
]
