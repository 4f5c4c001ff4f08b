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
    **apply_kwargs,
) -> dict[str, MergeStats]:
    """Apply one interleaved micro-batch to every table it names.

    ``batch``: CHANGE_SCHEMA columns + ``table_col`` holding catalog
    idents (``ns.table``). Returns {ident: MergeStats} for applied slices
    (idempotent re-runs return the per-table skip stats, same as
    ``apply_batch``). ``on_unknown='skip'`` drops unknown-table slices
    and reports them under the pseudo-key ``'!unknown'`` with a row count
    in ``events_in`` — for feeds that legitimately carry tables this
    consumer does not own (Debezium topic-include-list analog)."""
    if table_col not in batch.columns:
        raise ValueError(f"route column {table_col!r} not in batch")
    from etl_spark.lake.catalog import TableNotFoundError

    # bounded collect: distinct route values = number of tables in the
    # segment (tens), never the row count
    idents = sorted(
        r[0] for r in batch.select(table_col).distinct().collect() if r[0]
    )
    known: list[str] = []
    unknown: list[str] = []
    for ident in idents:
        try:
            catalog.load_table(ident)
            known.append(ident)
        except (TableNotFoundError, KeyError, ValueError):
            unknown.append(ident)
    if unknown and on_unknown != "skip":
        raise UnknownRouteError(
            f"feed routes to unknown tables {unknown}; create them or pass "
            f"on_unknown='skip'"
        )

    # one source scan for all slices: cache the (usually memory-sized)
    # micro-batch rather than re-reading the segment per table
    cached = batch.persist()
    out: dict[str, MergeStats] = {}
    try:
        if transactional:
            txn = catalog.begin()
            try:
                for ident in known:
                    out[ident] = apply_batch(
                        spark, txn.table(ident),
                        cached.filter(F.col(table_col) == ident).drop(table_col),
                        batch_id, mode=mode, **apply_kwargs,
                    )
                txn.commit()
            except BaseException:
                txn.abort()
                raise
        else:
            for ident in known:
                out[ident] = apply_batch(
                    spark, catalog.load_table(ident),
                    cached.filter(F.col(table_col) == ident).drop(table_col),
                    batch_id, mode=mode, **apply_kwargs,
                )
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
    stats}}. Resumable by construction — every table's ledger skips the
    segments it already committed, so a crash mid-feed (or mid-segment,
    without ``transactional``) re-runs to convergence."""
    import os

    segs = sorted(
        d for d in os.listdir(feed_dir)
        if os.path.isdir(os.path.join(feed_dir, d))
    )
    out: dict[str, dict[str, MergeStats]] = {}
    for seg in segs:
        batch = spark.read.parquet(os.path.join(feed_dir, seg))
        out[seg] = route_batch(
            spark, catalog, batch, seg, table_col=table_col,
            transactional=transactional, on_unknown=on_unknown, mode=mode,
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
    consumer owns (the Debezium table-include-list): they must exist up
    front, so a typo'd route value fails fast under ``on_unknown='fail'``
    instead of silently creating junk tables mid-stream.

    Exactly-once composition under redelivery: the trigger's batch id is
    the fingerprint of its input files (NOT Spark's epoch id), and every
    routed table records the same ``input_files`` in its own commit
    ledger. After checkpoint loss the re-delivered files are recognized
    as applied only when EVERY routed table has them — a crash between
    table A's commit and table B's (non-transactional mode) re-runs the
    trigger, A skips idempotently, B applies; with ``transactional=True``
    the per-trigger pin swap makes even the intermediate state invisible
    to catalog readers. A table that legitimately had zero rows in some
    trigger never ledgers it, so a post-checkpoint-loss replay re-offers
    those files; every re-offer no-ops (same batch id) — redundant work,
    never wrong.
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

    def _apply(df: DataFrame, epoch_id: int) -> None:
        files = list(df.inputFiles())
        if not files:
            files = [r[0] for r in df.select("__file").distinct().collect()]
        if not files:
            return
        done = [
            (t.committed_segments(), t.committed_inputs())
            for t in tables.values()
        ]

        def applied_everywhere(f: str) -> bool:
            rel = _segment_relative(f)
            seg = rel.split("/")[0]
            return all(seg in segs or rel in inps for segs, inps in done)

        new_files = sorted(f for f in files if not applied_everywhere(f))
        if not new_files:
            return
        bid = batch_fingerprint(new_files)
        batch_df = df.filter(_F.col("__file").isin(new_files)).drop("__file")
        route_batch(
            spark, catalog, batch_df, bid, table_col=table_col,
            transactional=transactional, on_unknown=on_unknown, mode=mode,
            input_files=[_segment_relative(f) for f in new_files],
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
