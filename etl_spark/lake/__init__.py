from etl_spark.lake.table import CommitConflictError, LakeTable
from etl_spark.lake.merge import merge_into, MergeStats
from etl_spark.lake.catalog import LakeCatalog, TableNotFoundError
from etl_spark.lake.export import export_partitioned, read_export
from etl_spark.lake.meta import metadata_df
from etl_spark.lake.txn import CatalogTransaction, TxnAbortedError

__all__ = [
    "metadata_df",
    "CatalogTransaction",
    "TxnAbortedError",
    "LakeTable",
    "CommitConflictError",
    "merge_into",
    "MergeStats",
    "LakeCatalog",
    "TableNotFoundError",
    "export_partitioned",
    "read_export",
]
