"""Iceberg-style metadata tables over a :class:`LakeTable`.

Iceberg exposes a table's own bookkeeping as queryable relations
(``table$files``, ``$snapshots``, ``$history``, ``$partitions``,
``$refs``). The reference pipeline keeps the equivalent facts in its
task/annotation datastore and the warehouse's own table metadata
(/root/reference/etl/globals.go task-state tracking; the per-datatype
table registry in /root/reference/schema/schema.go); a standalone
engine wants them as DataFrames so ops queries ("which files hold
bucket 7?", "when did v12 become current?", "how big is each
partition?") compose with the rest of the query surface.

Everything here is DRIVER-SIDE over the manifest JSONs — no data-file
scan, no Spark job beyond ``createDataFrame`` of a few hundred rows.
At 100 TB the manifests are still per-table metadata (one JSON per
retained snapshot, file entries with footer stats recorded at write
time), so these stay O(history x files-per-manifest) on the driver,
exactly like Iceberg's avro manifest reads. The returned DataFrames
are ordinary relations: filter/join/aggregate them with Catalyst.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_spark.lake.table import LakeTable

__all__ = [
    "files_df",
    "snapshots_df",
    "history_df",
    "partitions_df",
    "refs_df",
    "metadata_df",
    "METADATA_TABLES",
]


def _iso(unix: float | None) -> str | None:
    if unix is None:
        return None
    return (
        _dt.datetime.fromtimestamp(float(unix), tz=_dt.timezone.utc)
        .isoformat(timespec="milliseconds")
        .replace("+00:00", "Z")
    )


def _size(table: LakeTable, rel: str) -> int | None:
    try:
        return os.path.getsize(os.path.join(table.path, rel))
    except OSError:
        return None


def files_df(
    table: LakeTable, spark: SparkSession, version: int | None = None
) -> DataFrame:
    """One row per LIVE data file of a snapshot (default: current) —
    the ``table$files`` analog. Carries the manifest's footer stats
    (the same entries the pruned-read planner uses) plus the physical
    size and the version that first referenced the file, so
    compaction/audit queries never have to touch the data."""
    m = table.manifest(version)
    # first version that referenced each live path (added_version): walk
    # retained history ascending once; O(versions x files), metadata-sized
    added: dict[str, int] = {}
    for v in table.versions():
        if version is not None and v > m.version:
            break
        try:
            hist = table.manifest(v)
        except Exception:  # expired mid-walk
            continue
        for fl in hist.files.values():
            for fe in fl:
                added.setdefault(fe["path"], v)
    rows: list[dict[str, Any]] = []
    for b, fl in sorted(m.files.items(), key=lambda kv: int(kv[0])):
        for fe in fl:
            st = fe.get("stats") or {}
            rows.append(
                {
                    "bucket": int(b),
                    "path": fe["path"],
                    "rows": fe.get("rows"),
                    "size_bytes": _size(table, fe["path"]),
                    "schema_id": fe.get("schema_id"),
                    "conv_min": st.get("conv_min"),
                    "conv_max": st.get("conv_max"),
                    "ts_min_us": st.get("ts_min_us"),
                    "ts_max_us": st.get("ts_max_us"),
                    "added_version": added.get(fe["path"]),
                }
            )
    schema = (
        "bucket int, path string, rows long, size_bytes long, "
        "schema_id string, conv_min string, conv_max string, "
        "ts_min_us long, ts_max_us long, added_version long"
    )
    return spark.createDataFrame(rows, schema=schema)


def snapshots_df(table: LakeTable, spark: SparkSession) -> DataFrame:
    """One row per RETAINED snapshot — the ``$snapshots`` analog.
    ``operation`` comes from the commit record that created the
    version (merge mode / maintenance), ``summary`` counts are totals
    over the manifest's live file entries."""
    rows: list[dict[str, Any]] = []
    for v in table.versions():
        try:
            m = table.manifest(v)
        except Exception:
            continue
        batch_id, op = None, "maintenance"
        for bid, c in table.full_commits(m).items():
            if c.get("version") == v:
                batch_id, op = bid, c.get("mode", "cow")
                break
        n_files = sum(len(fl) for fl in m.files.values())
        known = [
            fe["rows"]
            for fl in m.files.values()
            for fe in fl
            if fe.get("rows") is not None
        ]
        rows.append(
            {
                "version": v,
                "parent": m.parent,
                "committed_at": _iso(m.created_unix),
                "operation": op,
                "batch_id": batch_id,
                "n_files": n_files,
                "total_rows": int(sum(known)) if known else None,
                "n_buckets": m.n_buckets,
                "schema_id": m.current_schema_id,
                "needs_reduce": bool(m.needs_reduce),
                "has_bloom": m.bloom is not None,
                "watermark_us": m.watermark_us,
            }
        )
    schema = (
        "version long, parent long, committed_at string, operation string, "
        "batch_id string, n_files int, total_rows long, n_buckets int, "
        "schema_id string, needs_reduce boolean, has_bloom boolean, "
        "watermark_us long"
    )
    return spark.createDataFrame(rows, schema=schema)


def history_df(table: LakeTable, spark: SparkSession) -> DataFrame:
    """Linear ref history — the ``$history`` analog: when each retained
    version became current on this ref. This engine's history is a
    reflog (every commit, including a rollback, points at the previous
    tip), so parent-pointer ancestry never orphans anything; the
    Iceberg-meaningful question is CONTENT ancestry — "is this
    snapshot's applied work contained in current?" A version undone by
    a rollback carries batches absent from the current ledger and
    reads ``is_current_ancestor = false`` until a re-replay re-applies
    them."""
    cur_batches = set(table.full_commits())
    rows = []
    for ver in table.versions():
        try:
            m = table.manifest(ver)
        except Exception:
            continue
        rows.append(
            {
                "version": ver,
                "made_current_at": _iso(m.created_unix),
                "parent": m.parent,
                "is_current_ancestor": set(table.full_commits(m)) <= cur_batches,
            }
        )
    schema = (
        "version long, made_current_at string, parent long, "
        "is_current_ancestor boolean"
    )
    return spark.createDataFrame(rows, schema=schema)


def partitions_df(
    table: LakeTable, spark: SparkSession, version: int | None = None
) -> DataFrame:
    """Per-bucket rollup of the live files — the ``$partitions``
    analog (buckets are this table's partitions). Superset of
    ``stats_df``: adds bytes and last-modifying version, the two
    numbers a compaction planner sorts by."""
    m = table.manifest(version)
    files = files_df(table, spark, version=version)
    # driver-side rollup would be fine, but the files relation is already
    # a DataFrame — let Catalyst do it (also demonstrates composability)
    from pyspark.sql import functions as F

    out = (
        files.groupBy("bucket")
        .agg(
            F.count("*").cast("int").alias("n_files"),
            F.sum("rows").alias("n_rows"),
            F.sum("size_bytes").alias("size_bytes"),
            F.min("conv_min").alias("conv_min"),
            F.max("conv_max").alias("conv_max"),
            F.min("ts_min_us").alias("ts_min_us"),
            F.max("ts_max_us").alias("ts_max_us"),
            F.max("added_version").alias("last_updated_version"),
        )
        .orderBy("bucket")
    )
    _ = m  # manifest fetched to fail fast on a bad version
    return out


def refs_df(table: LakeTable, spark: SparkSession) -> DataFrame:
    """Branches + tags + the published head — the ``$refs`` analog."""
    rows: list[dict[str, Any]] = [
        {"name": "main", "type": "current", "version": table.current_version()}
    ]
    for name, v in sorted(table.list_branches().items()):
        rows.append({"name": name, "type": "branch", "version": v})
    for name, v in sorted(table.list_tags().items()):
        rows.append({"name": name, "type": "tag", "version": v})
    return spark.createDataFrame(rows, schema="name string, type string, version long")


def constraints_df(table: LakeTable, spark: SparkSession) -> DataFrame:
    """Declared CHECK expectations — name, expression, policy."""
    rows = [
        {"name": n, "expr": c["expr"], "policy": c["policy"]}
        for n, c in sorted(table.constraints().items())
    ]
    return spark.createDataFrame(
        rows, schema="name string, expr string, policy string"
    )


METADATA_TABLES = {
    "files": files_df,
    "snapshots": snapshots_df,
    "history": history_df,
    "partitions": partitions_df,
    "refs": refs_df,
    "constraints": constraints_df,
}


def metadata_df(
    table: LakeTable, spark: SparkSession, name: str, version: int | None = None
) -> DataFrame:
    """Dispatch ``table$<name>`` style: ``metadata_df(t, spark, "files")``.
    ``version`` applies to the snapshot-scoped relations (files,
    partitions) and is rejected for the history-scoped ones."""
    if name not in METADATA_TABLES:
        raise ValueError(
            f"unknown metadata table {name!r}; one of {sorted(METADATA_TABLES)}"
        )
    fn = METADATA_TABLES[name]
    if name in ("files", "partitions"):
        return fn(table, spark, version=version)
    if version is not None:
        raise ValueError(f"metadata table {name!r} is not snapshot-scoped")
    return fn(table, spark)
