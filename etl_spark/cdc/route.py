"""Multi-table binlog routing — one interleaved change feed, N lake tables.

A real binlog/WAL tail is not per-table: events for every table in the
source database arrive interleaved in one totally-ordered log, each event
naming its table. The reference has the same shape one level up — a task's
archive names its datatype, and a dispatch map routes it to the right
parser and output table (datatype → parser selection,
/root/reference/parser/parser.go:89-112; per-datatype BigQuery targets,
/root/reference/etl/globals.go:309-323); unknown datatypes fail the task
rather than silently dropping data. This module is the sink-side analog:
split one micro-batch by its ``tbl`` column and apply each slice to its
catalog table with the engine's full per-table contract (validation
budget, LWW dedup, Bloom fast path, exactly-once commit ledger).

Exactly-once composition: every table keeps its OWN commit ledger keyed on
the same ``batch_id`` (the binlog segment), so a crash between table A's
commit and table B's leaves a safely re-runnable batch — A skips
idempotently, B applies. When cross-table ATOMICITY matters (readers must
never observe segment k applied to A but not B), ``transactional=True``
stages every slice on a WAP branch via a catalog transaction and publishes
all tables with ONE pin swap (lake/txn.py) — crash before the swap leaves
nothing visible and recovery rolls the branches back.

Scale shape: the batch is analyzed once (one tiny distinct on the route
column — bounded by the table count, not the row count) and cached across
the per-table applies, so the source is scanned once no matter how many
tables the segment touches. Each apply is the ordinary single-exchange
merge; tables are independent, so a scheduler pool could run them
concurrently, but the applies are already cluster-wide jobs — serial
driver dispatch costs only driver latency, not executor idle time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.cdc.apply import MergeStats, apply_batch

ROUTE_COL = "tbl"


class UnknownRouteError(ValueError):
    """The feed named a table the catalog does not know. Failing the batch
    (instead of dropping the slice) mirrors the reference's unknown-datatype
    task error — silent data loss is never the default."""


def route_batch(
    spark: SparkSession,
    catalog,
    batch: DataFrame,
    batch_id: str,
    table_col: str = ROUTE_COL,
    transactional: bool = False,
    on_unknown: str = "fail",  # "fail" | "skip"
    mode: str = "mor",
    include: list[str] | None = None,
    segments: dict[str, str] | None = None,
    ensure: list[str] | None = None,
    segments_cover_batch: bool = False,
    **apply_kwargs,
) -> dict[str, MergeStats]:
    """Apply one interleaved micro-batch to every table it names.

    ``batch``: CHANGE_SCHEMA columns + ``table_col`` holding catalog
    idents (``ns.table``). Returns {ident: MergeStats} for applied slices
    (idempotent re-runs return the per-table skip stats, same as
    ``apply_batch``). ``on_unknown='skip'`` drops unknown-table slices
    and reports them under the pseudo-key ``'!unknown'`` with a row count
    in ``events_in`` — for feeds that legitimately carry tables this
    consumer does not own (Debezium topic-include-list analog).

    ``include``: explicit ownership list — a route value that names an
    EXISTING catalog table outside it is still treated by the
    ``on_unknown`` policy (fail loudly / count + skip), never applied.
    Without it, a feed tagged for another consumer's table would write
    into that table behind its owner's back.

    ``segments``: {segment_name: content_fingerprint} forwarded to every
    slice's commit ledger. Before applying, each routed table is checked
    for a committed segment of the same NAME with a DIFFERENT
    fingerprint — refused loudly (segments are immutable by contract;
    the old skip-by-name behavior silently dropped the new data). A
    slice skips idempotently only when EVERY named segment matches the
    table's ledger (a batch can mix an already-complete segment with new
    files after checkpoint loss — skipping on a partial match would drop
    the new files for that table).

    ``ensure``: idents to apply even when the batch carries no rows for
    them — the empty slice commits a counters-only version that still
    records ``segments``/``input_files``, so every owned table's ledger
    advances in lockstep (the streaming redelivery check needs this)."""
    if table_col not in batch.columns:
        raise ValueError(f"route column {table_col!r} not in batch")
    from etl_spark.cdc.apply import SegmentReuseError
    from etl_spark.lake.catalog import TableNotFoundError

    # one source scan for all slices: cache the (micro-batch-sized) input
    # BEFORE the distinct probe, so the probe materializes the cache and
    # every per-table filter reads memory, not the source
    cached = batch.persist()
    out: dict[str, MergeStats] = {}
    try:
        # bounded collect: distinct route values = number of tables in the
        # segment (tens), never the row count
        idents = sorted(
            {r[0] for r in cached.select(table_col).distinct().collect() if r[0]}
            | set(ensure or [])
        )
        tables = {}
        unknown: list[str] = []
        for ident in idents:
            if include is not None and ident not in include:
                unknown.append(ident)
                continue
            try:
                tables[ident] = catalog.load_table(ident)
            except (TableNotFoundError, KeyError, ValueError):
                unknown.append(ident)
        if unknown and on_unknown != "skip":
            raise UnknownRouteError(
                f"feed routes to unknown/excluded tables {unknown}; create "
                f"them (or add to the include list), or pass "
                f"on_unknown='skip'"
            )

        def _slice(ident: str, t) -> MergeStats:
            if segments:
                fp = t.committed_segments()
                for nm, want in segments.items():
                    if nm in fp and fp[nm] != want:
                        raise SegmentReuseError(
                            f"segment {nm!r} already committed to {ident} "
                            f"with different content (ledger "
                            f"{fp[nm][:12]}…, current {want[:12]}…) — "
                            f"segment names are immutable by contract"
                        )
                # skipping on ledger match is sound only when the caller
                # vouches that `segments` accounts for EVERY row of the
                # batch (replay: one whole segment per call). A streaming
                # trigger can mix a completed segment with files of a
                # still-incomplete one — there the skip would drop the
                # incomplete segment's rows for this table.
                if segments_cover_batch and all(
                    fp.get(nm) == want for nm, want in segments.items()
                ):
                    s = MergeStats(batch_id=batch_id)
                    s.skipped_idempotent = True
                    return s
            return apply_batch(
                spark, t,
                cached.filter(F.col(table_col) == ident).drop(table_col),
                batch_id, mode=mode, segments=segments, **apply_kwargs,
            )

        if transactional:
            txn = catalog.begin()
            try:
                for ident in tables:
                    out[ident] = _slice(ident, txn.table(ident))
                txn.commit()
            except BaseException:
                txn.abort()
                raise
        else:
            for ident, t in tables.items():
                out[ident] = _slice(ident, t)
        if unknown:
            skipped = MergeStats(batch_id=batch_id)
            skipped.events_in = cached.filter(
                F.col(table_col).isin(*unknown)
            ).count()
            out["!unknown"] = skipped
    finally:
        cached.unpersist()
    return out


def replay_feed_routed(
    spark: SparkSession,
    catalog,
    feed_dir: str,
    table_col: str = ROUTE_COL,
    transactional: bool = False,
    on_unknown: str = "fail",
    mode: str = "mor",
    **apply_kwargs,
) -> dict[str, dict[str, MergeStats]]:
    """Batch replay of a multi-table feed directory (one subdir per binlog
    segment, lexicographic order = arrival order): {segment: {ident:
    stats}}. Resumable by construction — the batch id is the segment's
    CONTENT fingerprint (never its name: a same-named segment from a
    different feed must not be silently skipped) and every routed table
    records the segment + input files in its ledger, so a crash mid-feed
    (or mid-segment, without ``transactional``) re-runs to convergence,
    a later ``route_stream`` tail of the same directory recognizes the
    replayed files as applied, and a reused segment name with different
    content is refused (``SegmentReuseError``), same as ``replay_feed``."""
    import os

    from etl_spark.cdc.apply import _segment_relative, batch_fingerprint

    out: dict[str, dict[str, MergeStats]] = {}
    for seg in sorted(os.listdir(feed_dir)):
        d = os.path.join(feed_dir, seg)
        if not os.path.isdir(d):
            continue
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        if not files:  # mid-write / _SUCCESS-only dir: nothing to apply
            continue
        bid = batch_fingerprint(files)
        out[seg] = route_batch(
            spark, catalog, spark.read.parquet(d), bid, table_col=table_col,
            transactional=transactional, on_unknown=on_unknown, mode=mode,
            segments={seg: bid}, segments_cover_batch=True,
            input_files=[_segment_relative(f) for f in files],
            **apply_kwargs,
        )
    return out


def route_stream(
    spark: SparkSession,
    catalog,
    feed_dir: str,
    checkpoint_dir: str,
    idents: list[str],
    table_col: str = ROUTE_COL,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    transactional: bool = False,
    on_unknown: str = "fail",
    mode: str = "mor",
    **apply_kwargs,
):
    """Structured-Streaming tail of a MULTI-TABLE change feed: the real
    binlog deployment shape — one checkpointed stream, events interleaved
    across every table of the source database, each trigger routed through
    ``route_batch``.

    ``idents`` is the explicit include-list of catalog tables this
    consumer owns (the Debezium table-include-list), ENFORCED: a route
    value naming any other table — even one that exists in the catalog —
    is handled by the ``on_unknown`` policy instead of being written
    behind its real owner's back; a typo'd value fails fast under
    ``on_unknown='fail'``.

    Exactly-once composition under redelivery: the trigger's batch id is
    the fingerprint of its input files (NOT Spark's epoch id), and every
    owned table — including ones with zero rows in the trigger, via
    ``ensure`` — records the same ``input_files`` in its own commit
    ledger, so the ledgers advance in lockstep. After checkpoint loss the
    re-delivered files are recognized as applied only when EVERY routed
    table has them — a crash between table A's commit and table B's
    (non-transactional mode) re-runs the trigger, A skips idempotently,
    B applies; with ``transactional=True`` the per-trigger pin swap makes
    even the intermediate state invisible to catalog readers. Completed
    segments collapse into the compact per-segment fingerprint map
    (pruning per-file ledger entries), and a reused segment name with
    different content raises ``SegmentReuseError`` instead of being
    silently skipped or double-applied.
    """
    from pyspark.sql import functions as _F

    from etl_spark.cdc.apply import _segment_relative, batch_fingerprint
    from etl_spark.cdc.stream import detect_feed_schema

    tables = {i: catalog.load_table(i) for i in idents}
    schema = detect_feed_schema(spark, feed_dir)
    if table_col not in schema.fieldNames():
        raise ValueError(f"feed lacks the route column {table_col!r}")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(f"{feed_dir}/*").withColumn(
        "__file", _F.input_file_name()
    )

    from urllib.parse import unquote

    from etl_spark.cdc.apply import (
        check_segment_immutability,
        feed_files_nonempty,
        new_files_predicate,
        segment_listing,
    )

    def _segment_listing(sname: str) -> set[str]:
        return segment_listing(feed_dir, sname)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        files = list(df.inputFiles())
        if not files:
            files = [r[0] for r in df.select("__file").distinct().collect()]
        if not files:
            return
        done = [
            (t, t.committed_segments(), t.committed_inputs())
            for t in tables.values()
        ]

        # A segment ledgered complete is immutable by contract: refuse a
        # file appended to one (shared helper, with the legacy batch-id
        # fallback — see check_segment_immutability). Reuses the ledger
        # snapshots materialized above: no extra manifest I/O per table.
        trigger_segs = sorted({_segment_relative(f).split("/")[0] for f in files})
        check_segment_immutability(
            feed_dir, trigger_segs, [(t, segs) for t, segs, _inps in done]
        )

        def applied_everywhere(f: str) -> bool:
            rel = _segment_relative(f)
            seg = rel.split("/")[0]
            return all(seg in segs or rel in inps for _t, segs, inps in done)

        new_files = sorted(f for f in files if not applied_everywhere(f))
        if not new_files:
            return
        bid = batch_fingerprint(new_files)
        rel_new = [_segment_relative(f) for f in new_files]
        # segment completion (run_stream's bookkeeping, against the LEAST
        # advanced ledger): once every file of a segment is applied in all
        # routed tables, the segment moves to the compact per-segment
        # fingerprint map and its per-file entries are pruned — bounding
        # ledger growth over an endless stream
        common_inputs = (
            set.intersection(*(inps for _t, _segs, inps in done))
            if done
            else set()
        )
        applied_decoded = {unquote(x) for x in (common_inputs | set(rel_new))}
        complete: dict[str, str] = {}
        for sname in sorted({r.split("/")[0] for r in rel_new}):
            allf = _segment_listing(sname)
            if allf and allf <= applied_decoded:
                complete[sname] = batch_fingerprint(sorted(allf))
        # symmetric normalized identity matching (shared helper — see
        # cdc/apply.new_files_predicate for the encoding-drift contract);
        # already-applied sibling files are excluded so a form-decode
        # collision cannot re-admit their rows
        new_set = set(new_files)
        rel_applied = [_segment_relative(f) for f in files if f not in new_set]
        batch_df = df.filter(
            new_files_predicate(rel_new, feed_dir=feed_dir, rel_applied=rel_applied)
        ).drop("__file")
        if batch_df.isEmpty() and not df.isEmpty():
            # rows exist in the trigger but none matched the new files —
            # either the identity normalization above missed (fail loudly
            # instead of ledgering unapplied files), or the new files are
            # legitimately EMPTY parquet (an empty producer partition —
            # footer-probed driver-side, only on this already-failed
            # path); the latter proceeds to ledger them as applied with
            # a counters-only commit per routed table.
            if feed_files_nonempty(feed_dir, rel_new):
                raise RuntimeError(
                    f"route_stream: trigger matched 0 rows for "
                    f"{len(rel_new)} new files ({rel_new[:3]}…) — "
                    f"file-identity normalization mismatch between "
                    f"inputFiles() and input_file_name()"
                )
        route_batch(
            spark, catalog, batch_df, bid, table_col=table_col,
            transactional=transactional, on_unknown=on_unknown, mode=mode,
            include=list(idents), ensure=list(idents),
            segments=complete or None, input_files=rel_new,
            **apply_kwargs,
        )

    writer = src.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()
