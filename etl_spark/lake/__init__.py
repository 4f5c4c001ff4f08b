from etl_spark.lake.table import LakeTable
from etl_spark.lake.merge import merge_into, MergeStats

__all__ = ["LakeTable", "merge_into", "MergeStats"]
