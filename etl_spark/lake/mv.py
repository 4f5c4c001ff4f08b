"""Incrementally-maintained materialized view over a LakeTable.

The downstream-consumer pattern the reference exists to serve: its stable
dedup/join keys are there so the external job service can keep *derived*
tables in sync with the incoming feed (planned incoming → deduplicated
base_tables flow, /root/reference/schema/README.md:6-10). Here the engine
closes that loop itself: a per-conversation rollup that is refreshed from
the table's changelog instead of recomputed from scratch.

Maintenance algorithm (delta-scoped partial recompute):

1. Diff the table between the MV's last-synced snapshot and the current one
   (``changes_between`` — manifest-pruned to touched buckets).
2. The affected-key set = distinct conv_id in the diff. Counts/max/sum over
   a conversation are NOT incrementally invertible under LWW updates and
   deletes (an update replaces a row's contribution; max can't be
   decremented), so the MV re-aggregates exactly the affected
   conversations from the current snapshot — scanning only their hash
   buckets — and keeps every other MV row verbatim.
3. New rollups replace old rows via anti-join; conversations whose last
   live turn was deleted drop out naturally (no new rollup row).

Cost per refresh: O(changed keys + their buckets), independent of table
size — the property that makes a 10^10-event lake's derived tables
maintainable per micro-batch. The affected-key set is one micro-batch's
key set, so it broadcasts.

Storage: the MV is itself snapshot-versioned (parquet dir per refresh +
atomic pointer swap), recording which table version it reflects, so MV
refresh is idempotent/resumable exactly like the main table's commits.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.lake.table import LakeTable, _atomic_write

_PTR = "CURRENT"


def conv_summary(state: DataFrame) -> DataFrame:
    """The view definition: per-conversation rollup of the live LWW state
    (same shape as ops.cdcq.CONV_STATS_SQL, the full-recompute oracle)."""
    return state.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_turns"),
        F.max("ts").alias("last_ts"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


class KeyedMV:
    """A materialized view keyed by ``conv_id`` kept in sync with a
    LakeTable via changelog-scoped partial recompute.

    ``view_fn(state_df) -> DataFrame`` defines the view: any aggregation
    producing EXACTLY ONE row per conv_id (the delta-maintenance algebra
    re-aggregates affected conversations in isolation, which is only sound
    when the view's group key equals the table's partition key — a view
    keyed by anything else, e.g. per-tool totals, would need contributions
    from unaffected conversations and must full-refresh instead)."""

    def __init__(self, path: str, view_fn=None):
        self.path = path
        self.view_fn = view_fn if view_fn is not None else conv_summary
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------- state
    def _meta(self) -> dict | None:
        p = os.path.join(self.path, _PTR)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.loads(f.read())

    @property
    def table_version(self) -> int | None:
        """Table snapshot this MV currently reflects (None = never built)."""
        m = self._meta()
        return None if m is None else m["table_version"]

    def read(self, spark: SparkSession) -> DataFrame:
        m = self._meta()
        if m is None:
            raise ValueError(f"MV at {self.path} has never been refreshed")
        return spark.read.parquet(os.path.join(self.path, m["data"]))

    def _commit(self, df: DataFrame, table_version: int) -> None:
        rel = f"v{table_version}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        old = self._meta()
        _atomic_write(
            os.path.join(self.path, _PTR),
            json.dumps({"table_version": table_version, "data": rel}),
        )
        if old is not None:
            shutil.rmtree(os.path.join(self.path, old["data"]), ignore_errors=True)

    # ----------------------------------------------------------- refresh
    def full_refresh(self, spark: SparkSession, table: LakeTable,
                     version: int | None = None) -> None:
        """Recompute the view from a full snapshot scan (bootstrap path)."""
        v = table.current_version() if version is None else version
        self._commit(self.view_fn(table.read(spark, version=v)), v)

    def refresh(
        self, spark: SparkSession, table: LakeTable, to_version: int | None = None
    ) -> int:
        """Incremental refresh to ``to_version`` (default: the table's
        current snapshot). Returns the number of affected conversations
        re-aggregated (0 = already current, -1 = bootstrapped). Falls back
        to full_refresh when the MV was never built."""
        v_from = self.table_version
        v_to = table.current_version() if to_version is None else to_version
        if v_from is None:
            self.full_refresh(spark, table, v_to)
            return -1
        if v_from == v_to:
            return 0
        changes = table.changes_between(spark, v_from, v_to)
        # affected keys of one refresh interval are micro-batch-sized:
        # persist them (the changelog join runs once), derive the bucket
        # list driver-side (bounded by n_buckets ints, never key data),
        # and broadcast the key set into both joins — the MV and the table
        # are never shuffled.
        affected = changes.select("conv_id").distinct().persist()
        try:
            # bucket ids must follow the TARGET snapshot's layout (the
            # table may have been rebucketed after v_to)
            n_buckets_to = table.manifest(v_to).n_buckets
            per_bucket = affected.select(
                table.bucket_expr(n_buckets=n_buckets_to).alias("b")
            ).groupBy("b").count().collect()
            n_affected = int(sum(r["count"] for r in per_bucket))
            if n_affected == 0:
                # nothing changed: advance the synced version without
                # rewriting the view data (pointer-only commit)
                meta = self._meta()
                _atomic_write(
                    os.path.join(self.path, _PTR),
                    json.dumps(
                        {"table_version": v_to, "data": meta["data"]}
                    ),
                )
                return 0
            buckets = sorted(int(r["b"]) for r in per_bucket)
            aff_df = F.broadcast(affected)
            scoped = table.read(spark, version=v_to, buckets=buckets).join(
                aff_df, "conv_id"
            )
            new_rollup = self.view_fn(scoped)
            kept = self.read(spark).join(aff_df, "conv_id", "left_anti")
            self._commit(kept.unionByName(new_rollup), v_to)
        finally:
            affected.unpersist()
        return n_affected


class ConvSummaryMV(KeyedMV):
    """The stock per-conversation rollup view (n_turns, n_tool_turns,
    last_ts, total_chars) — see ``conv_summary`` for the definition and
    ops.cdcq.CONV_STATS_SQL for its full-recompute oracle."""

    def __init__(self, path: str):
        super().__init__(path, conv_summary)
