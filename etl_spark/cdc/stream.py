"""Structured Streaming driver: tail the feed directory, apply micro-batches
through the same ``apply_batch`` used in batch mode.

Reference analog: the Gardener poll → streamToPending → throttled RunAll
loop (/root/reference/active/poller.go:147-216, active/active.go:163-203,
active/throttle.go:9-81). Spark replaces every piece:

  * job discovery + offsets  → file-source checkpointed offsets
  * streamToPending channel  → micro-batch planning
  * semaphore max_active     → maxFilesPerTrigger + executor cores
  * Gardener heartbeat/state → checkpoint + our commit manifest
  * graceful SIGTERM + resume (parser.yml:28-30) → query.stop() +
    restart from checkpointLocation

Exactly-once: Spark's file-source checkpoint is at-least-once across
failures (a batch can be re-delivered after a crash between sink write and
offset commit). We therefore fingerprint each micro-batch by its INPUT FILES
(``input_file_name()``) and let the commit manifest no-op replays — the same
composition the reference uses (at-least-once parse + key-dedup + atomic
output visibility, /root/reference/storage/rowwriter.go:83-171).

Late/out-of-order data: correctness is carried by ts-based LWW in the MERGE,
not by a watermark — the reference ASSUMES in-order timestamps and panics
otherwise (/root/reference/parser/ndt.go:226-238); we must not (north rule).
No stateful streaming operator exists in this pipeline, so no watermark is
required for state cleanup.

Schema evolution mid-stream: the file source pins its schema at query start,
so when the feed gains columns the query is restarted with the merged schema
(detect_feed_schema) — checkpointed offsets make the restart seamless. This
mirrors the reference's out-of-band update-schema deploy step
(/root/reference/cmd/update-schema/update.go:112-161).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from etl_spark.cdc.apply import _segment_relative, apply_batch, batch_fingerprint
from etl_spark.lake.table import LakeTable

# Default per-bucket data-file bound for the streaming loop. A MOR
# stream appends one delta file per touched bucket per trigger, so an
# UNBOUNDED stream grows read amplification linearly with uptime until
# an operator intervenes — the wrong default for a service. 16 keeps
# point-read fan-in small while amortizing the rewrite to ~1/16 extra
# write volume per trigger (compact_small_files rewrites only offending
# buckets). Pass None to opt OUT (operator-scheduled maintenance).
DEFAULT_COMPACT_FILES = 16


def detect_feed_schema(spark: SparkSession, feed_dir: str) -> T.StructType:
    """Union-of-eras feed schema from parquet footers (mergeSchema reads
    footers only, not data)."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{feed_dir}/*")
        .schema
    )


def run_stream(
    spark: SparkSession,
    table: LakeTable,
    feed_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    fail_threshold: float = 0.10,
    late_watermark_sec: float | None = None,
    mode: str = "cow",
    mv_path: str | None = None,
    auto_compact_files: int | None = DEFAULT_COMPACT_FILES,
    replica_path: str | None = None,
    allow_patches: bool = False,
    quarantine_dir: str | None = None,
):
    """Start (and by default drain) the streaming apply loop. Returns the
    StreamingQuery when available_now=False (caller stops it).

    ``mv_path``: keep the per-conversation summary MV (lake/mv.py) in sync
    inside the SAME foreachBatch — after each applied micro-batch the MV
    does a changelog-scoped incremental refresh, so derived-table freshness
    tracks the stream with O(batch keys) extra work per trigger. The MV's
    own table_version pointer makes the refresh idempotent across replays,
    and it runs on every trigger (not only ones that applied new files), so
    a crash between the table commit and the MV refresh is healed by the
    re-delivered trigger even though the merge itself no-ops.

    ``auto_compact_files``: per-trigger maintenance bound — see
    ``replay_feed``; under an endless MOR stream this caps read
    amplification at a constant number of files per bucket.

    ``replica_path``: follow the table with a changelog replica
    (lake/replicate.py) inside the same foreachBatch — each trigger syncs
    the replica by exactly that trigger's diff (created with the table's
    schema on first sync). Same crash-healing shape as the MV: the sync
    runs on every trigger and its ledger makes it idempotent, so a crash
    between the table commit and the replica sync is healed by the
    re-delivered trigger."""
    schema = detect_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(f"{feed_dir}/*").withColumn("__file", F.input_file_name())

    def _apply(df: DataFrame, epoch_id: int) -> None:
        _apply_new_files(df)
        # MV catch-up runs on EVERY trigger, outside the new-files early
        # returns: after a crash between the table commit and the MV
        # refresh, the re-delivered batch no-ops the merge (per-file
        # ledger) but the MV must still be brought up to the table's
        # current snapshot. refresh() itself no-ops when already current.
        if mv_path is not None:
            from etl_spark.lake.mv import ConvSummaryMV

            ConvSummaryMV(mv_path).refresh(spark, table)
        if replica_path is not None:
            from etl_spark.lake.replicate import sync_replica

            rt = LakeTable(replica_path)
            if not rt.exists():
                rt = LakeTable.create(
                    replica_path, table.user_schema(), n_buckets=table.n_buckets
                )
            sync_replica(spark, table, rt, mode=mode)

    def _apply_new_files(df: DataFrame) -> None:
        import os

        # file discovery is plan metadata — no job, no scan of the batch.
        # (The previous select(__file).distinct().collect() materialized
        # every row of every trigger just to enumerate its inputs.)
        files = list(df.inputFiles())
        if not files:
            # defensive fallback for sources that don't expose inputFiles
            files = [r[0] for r in df.select("__file").distinct().collect()]
        if not files:
            return
        # Idempotence is per INPUT FILE: maxFilesPerTrigger can split one
        # segment's files across triggers, so marking a whole segment done
        # on its first partial delivery would silently drop the rest (the
        # round-1 bug, masked by a feed writer that happened to emit fewer
        # files per segment than the trigger size). After checkpoint loss,
        # Spark re-delivers old files grouped differently — the per-file
        # ledger no-ops them regardless of grouping. A segment moves to the
        # compact per-segment map (and its file entries are pruned) only
        # once EVERY file in its directory has been applied. Segments are
        # immutable by contract (like the reference's archives).
        def seg(f: str) -> str:
            return _segment_relative(f).split("/")[0]

        done_segs = table.committed_segments()
        done_inputs = table.committed_inputs()

        def applied(f: str) -> bool:
            return seg(f) in done_segs or _segment_relative(f) in done_inputs

        new_files = sorted(f for f in files if not applied(f))
        if not new_files:
            return
        rel_new = [_segment_relative(f) for f in new_files]
        applied_after = done_inputs | set(rel_new)
        # the ledger stores URI-style names (input_file_name/inputFiles may
        # percent-encode); the directory listing is raw — decode the ledger
        # side for the completion comparison or a file with an encodable
        # character in its name would keep its segment "incomplete" forever
        from urllib.parse import unquote

        applied_decoded = {unquote(x) for x in applied_after}
        # a COMPLETED segment is ledgered under its content fingerprint
        # (all its files), so a later batch replay of the same feed proves
        # same-name-same-content and skips — while a reused segment name
        # with different content is refused instead of silently dropped
        complete_segs: dict[str, str] = {}
        for sname in sorted({seg(f) for f in new_files}):
            d = os.path.join(feed_dir, unquote(sname))
            try:
                allf = {
                    f"{unquote(sname)}/{fn}"
                    for fn in os.listdir(d) if fn.endswith(".parquet")
                }
            except OSError:
                allf = set()
            if allf and allf <= applied_decoded:
                complete_segs[sname] = batch_fingerprint(sorted(allf))
        bid = batch_fingerprint(new_files)
        batch_df = df.filter(F.col("__file").isin(new_files)).drop("__file")
        apply_batch(
            spark,
            table,
            batch_df,
            bid,
            source_files=sorted({seg(f) for f in new_files}),
            fail_threshold=fail_threshold,
            segments=complete_segs,
            input_files=rel_new,
            late_watermark_sec=late_watermark_sec,
            mode=mode,
            allow_patches=allow_patches,
            quarantine_dir=quarantine_dir,
        )
        if auto_compact_files is not None:
            table.compact_small_files(spark, auto_compact_files)

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
