"""LakeBackend — the table-format seam the CDC engine writes through.

North-star wording says "Iceberg lake table". This container ships NO
Iceberg (or Delta/Hudi) runtime jars — probed 2026-08-17: pyspark 4.1.2's
``jars/`` has no iceberg/delta/hudi artifact, there is no ~/.ivy2 or ~/.m2
cache, and the sandbox has no network for ``spark.jars.packages`` to
resolve from — so the repo ships its own Iceberg-shaped format
(``LakeTable``: versioned manifests, atomic pointer swap, schema eras,
snapshot expiry, COW/MOR, time travel).

This module pins the SWAP POINT: ``LakeBackend`` is the complete surface
``merge_into`` / ``apply_batch`` / ``run_stream`` are allowed to touch
(enforced by tests/test_backend_seam.py, which replays a feed through an
attribute-recording proxy and fails on any access outside this Protocol).
An Iceberg adapter therefore slots in by implementing these methods and
nothing else:

| Protocol method        | Iceberg mapping                                    |
|------------------------|----------------------------------------------------|
| is_committed/commit_log| snapshot summary properties (commit metadata)      |
| committed_segments     | snapshot property map / marker table               |
| committed_inputs       | snapshot property map (partial-segment ledger)     |
| user_schema/next_schema_id | table schema + schema-id evolution             |
| column_renames         | name mapping / field-ID rename history             |
| storage_schema         | schema + engine system columns                     |
| bucket_expr            | bucket[N] partition transform                      |
| load_bloom             | puffin sidecar / statistics file                   |
| has_files              | snapshot manifest scan (file counts)               |
| read/read_storage      | table scan (MOR merge = positional/equality deletes)|
| write_bucket_files     | data-file write via the format's writer            |
| file_row_count         | manifest entry record_count                        |
| commit_version         | transaction commit (atomic snapshot swap)          |
| current_version        | current snapshot id (OCC base for commits)         |
| high_watermark_us      | snapshot property                                  |
| metrics_df/lineage_df  | a companion metrics table                          |
| constraints            | table properties (CHECK-expectation map)           |
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

from pyspark.sql import Column, DataFrame, SparkSession


@runtime_checkable
class LakeBackend(Protocol):
    # ---- identity / commit ledger
    def is_committed(self, batch_id: str) -> bool: ...
    def constraints(self) -> dict[str, dict[str, str]]: ...
    def current_version(self) -> int: ...
    def committed_segments(self) -> dict[str, str]: ...
    def committed_inputs(self) -> set[str]: ...
    def commit_log(self) -> dict[str, dict[str, Any]]: ...
    def high_watermark_us(self) -> int | None: ...

    # ---- schema
    def user_schema(self): ...
    def storage_schema(self, user_schema=None): ...
    def next_schema_id(self, user_schema) -> str: ...
    def column_renames(self) -> dict[str, str]: ...

    # ---- layout
    def bucket_expr(self, conv_col: str = "conv_id") -> Column: ...
    def has_files(self, buckets: list[int] | None = None) -> bool: ...

    # ---- seen-set
    def load_bloom(self): ...

    # ---- IO
    def read(self, spark: SparkSession, include_system: bool = False,
             version: int | None = None) -> DataFrame: ...
    def read_storage(self, spark: SparkSession,
                     buckets: list[int] | None = None,
                     reduced: bool | None = None) -> DataFrame: ...
    def write_bucket_files(self, storage_df: DataFrame, version_tag: str,
                           schema_id: str | None = None,
                           pre_clustered: bool = False) -> dict: ...
    def file_row_count(self, rel_path: str) -> int: ...

    # ---- atomic commit
    def commit_version(self, new_files_by_bucket, touched_buckets, batch_id,
                       commit_record, **kwargs): ...
