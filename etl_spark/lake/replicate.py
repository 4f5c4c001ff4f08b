"""Cross-table incremental replication over the changelog (CDC-out).

A *replica* LakeTable follows a *source* LakeTable by applying the
source's changelog diffs as ordinary CDC batches — the read-side dual of
the ingest path, and the engine analog of the reference's "dedup copies
the daily delta into the stable table" flow
(/root/reference/etl/globals.go:147-168, where gardener moves parsed
rows batch-table -> dedup -> stable): downstream systems never re-read
the whole source, they consume exactly the keys that changed.

Design:

* **State lives in the replica's own commit ledger.** Each sync applies
  one batch whose id encodes the source snapshot it lands
  (``repl:<src-digest>:v<N>``); the highest committed id IS the synced
  version. Crash-safe with zero extra state files — the ledger commits
  atomically with the data, so a killed sync either fully landed (next
  run no-ops on idempotence) or left the replica untouched.
* **Bootstrap preserves LWW metadata.** The first sync copies the
  source's live snapshot with each row's ORIGINAL ``(ts, op_seq)`` — so
  later incremental diffs (whose events carry source op_seqs) compare
  correctly against bootstrapped rows.
* **Deletes replay the winning tombstone.** ``changes_between(...,
  emit_meta=True)`` emits the tombstone's own ``(ts, op_seq)``; applying
  it to the replica wins against the replaced row by the same (ts,
  op_seq) order the source used. A tombstone already expired at the
  source (past the changelog horizon) surfaces as
  :class:`ReplicaHorizonError` — never a silent skip (the Delta-CDF
  "vacuumed past the reader" contract).
* **Scale.** Incremental sync cost is O(buckets changed between the two
  source snapshots) on the source side (manifest-pruned changelog scan)
  plus one key-hash merge on the replica side — independent of total
  table size. Bootstrap is one full scan -> bucketed append (the merge's
  empty-table fast path; no join).

Replicas are managed solely through :func:`sync_replica`; writing to a
replica out-of-band voids convergence (same single-writer contract as
the rest of the engine).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.lake.merge import BatchFailedError, MergeStats
from etl_spark.lake.table import LakeTable

__all__ = ["ReplicaHorizonError", "sync_replica", "synced_version"]


class ReplicaHorizonError(RuntimeError):
    """The source no longer retains what this replica needs to advance
    incrementally (expired snapshot or expired tombstones inside the sync
    window). Remedy: recreate the replica and bootstrap afresh."""


def _src_digest(src: LakeTable) -> str:
    """Stable 8-hex id of the source table, namespacing ledger entries so
    one replica can't confuse sync state across different sources."""
    return hashlib.md5(os.path.abspath(src.path).encode()).hexdigest()[:8]


def _bid(src: LakeTable, version: int) -> str:
    return f"repl:{_src_digest(src)}:v{version}"


_BID_RE = re.compile(r"^repl:([0-9a-f]{8}):v(\d+)$")


def synced_version(dst: LakeTable, src: LakeTable) -> int | None:
    """Highest source version this replica has fully applied, from the
    replica's commit ledger; None if never synced from ``src``."""
    d = _src_digest(src)
    best: int | None = None
    for bid in dst.commit_log():
        m = _BID_RE.match(bid)
        if m and m.group(1) == d:
            v = int(m.group(2))
            if best is None or v > best:
                best = v
    return best


def _feed_cols(src: LakeTable, version: int) -> list[str]:
    """User columns AS OF the sync-target snapshot (the head schema may
    have evolved past a pinned ``to_version``)."""
    from etl_spark.schema import schema_from_json

    return [
        f.name
        for f in schema_from_json(src.manifest(version).schema_json).fields
    ]


def _bootstrap_feed(spark: SparkSession, src: LakeTable, cur: int) -> DataFrame:
    """The source's live snapshot at ``cur`` as an insert feed, keeping
    each row's original (ts, op_seq) so later diffs LWW-compare right."""
    snap = src.read(spark, include_system=True, version=cur)
    return snap.select(
        F.lit("I").alias("op"),
        *_feed_cols(src, cur),
        F.col("op_seq"),
        F.lit(f"repl:{src.path}@v{cur}").alias("source_file"),
    )


def _changes_feed(
    spark: SparkSession, src: LakeTable, v_from: int, v_to: int
) -> DataFrame:
    ch = src.changes_between(spark, v_from, v_to, emit_meta=True)
    return ch.select(
        "op",
        *_feed_cols(src, v_to),
        "op_seq",
        F.lit(f"repl:{src.path}@v{v_from}-v{v_to}").alias("source_file"),
    )


def sync_replica(
    spark: SparkSession,
    src: LakeTable,
    dst: LakeTable,
    mode: str = "mor",
    to_version: int | None = None,
) -> MergeStats:
    """Advance ``dst`` to the source's current snapshot: bootstrap on the
    first call, changelog-incremental afterwards. Idempotent — re-running
    against an unchanged source no-ops via the ledger. Returns the
    applied batch's MergeStats (``skipped_idempotent`` on no-op).

    ``to_version`` pins the sync target to a retained source snapshot
    (e.g. ``src.resolve_tag("release-1")``) instead of the head —
    reproducible replicas of tagged releases. Syncing to a version at or
    below the replica's synced frontier is a no-op (replicas only move
    forward; LWW would make a backward apply a no-op anyway).

    The replica's schema evolves automatically: a source column added or
    widened between syncs rides the change feed into ``apply_batch``'s
    ordinary evolution path.
    """
    from etl_spark.cdc.apply import apply_batch

    cur = src.current_version() if to_version is None else to_version
    synced = synced_version(dst, src)
    if synced is not None and synced > cur:
        s = MergeStats(batch_id=_bid(src, cur))
        s.skipped_idempotent = True
        return s
    bid = _bid(src, cur)
    if synced == cur or dst.is_committed(bid):
        s = MergeStats(batch_id=bid)
        s.skipped_idempotent = True
        return s
    if synced is None:
        feed = _bootstrap_feed(spark, src, cur)
    else:
        try:
            feed = _changes_feed(spark, src, synced, cur)
        except (OSError, ValueError) as e:
            raise ReplicaHorizonError(
                f"source no longer retains v{synced} (last synced) — "
                f"recreate the replica and bootstrap afresh: {e}"
            ) from e
    # Stage the feed to parquet before applying: apply_batch's contract is
    # FILE-BACKED micro-batches (it re-scans the batch instead of caching,
    # and its validation counters ride the write job as an Observation —
    # an Observation node inside a join subtree that AQE empty-propagates
    # away is never filled). Staging makes the diff a plain scan: computed
    # once, re-scanned cheaply, Observation always executes. The staging
    # dir doubles as the sync's spill boundary; a crashed attempt's
    # leftovers are overwritten by the next run and removed on success.
    # NOTE: no leading underscore — Spark's file index treats _*/.*
    # paths as hidden and would ignore the staged files entirely
    staging = os.path.join(dst.path, "repl-staging")
    feed.write.mode("overwrite").parquet(staging)
    try:
        staged = spark.read.parquet(staging)
        # fail_threshold=0: ANY invalid change row aborts — the only
        # producer of invalid rows here is a NULL-(ts,op_seq) delete,
        # i.e. a tombstone expired at the source inside the sync window
        return apply_batch(spark, dst, staged, bid, mode=mode, fail_threshold=0.0)
    except BatchFailedError as e:
        raise ReplicaHorizonError(
            f"sync v{synced}->v{cur} carried deletes whose tombstones the "
            f"source already expired (changelog horizon passed); recreate "
            f"the replica and bootstrap afresh. ({e})"
        ) from e
    finally:
        shutil.rmtree(staging, ignore_errors=True)
