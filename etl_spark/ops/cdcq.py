"""CDC query family — the engine's core semantics, oracle-checkable.

A deterministic CDC change feed is DERIVED from the driver's ``events``
table (pure arithmetic on event_id/user_id — identical expressions on the
Spark and DuckDB side), then reduced to the final transcripts table state
with last-writer-wins semantics:

  * ``cdc_lww_state``   — partial-agg max_by LWW reduce (etl_spark.cdc.dedup)
  * ``cdc_lww_salted``  — two-phase salted variant (hot-key skew path)
  * ``cdc_replay_state``— the FULL engine: feed → segments → LakeTable
                          replay (merge/tombstones/commit-log) → final read
  * ``cdc_dispositions``— winning-op histogram (metrics invariant cross-check)

All four share one oracle shape: group by (conv_id, turn_idx), keep the
max-(ts, op_seq) event, drop keys whose winner is a delete — the same
reduction the reference delegates to gardener's key-based dedup
(/root/reference/parser/parser.go:150-176, schema/README.md:6-10).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.cdc.dedup import lww_dedup, lww_dedup_salted

FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _work_dir(prefix: str) -> str:
    """Temp dir for replay-backed queries. The returned DataFrame reads
    these files LAZILY (the caller executes the plan later), so cleanup is
    deferred to process exit instead of leaking the feed + lake per call."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


# ---------------------------------------------------------------------------
# deterministic feed derivation (Spark side ≡ SQL side below)
# ---------------------------------------------------------------------------

def change_feed_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    eid = F.col("event_id")
    is_del = eid % 19 == 0
    op = (
        F.when(is_del, F.lit("D"))
        .when(eid % 3 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    conv_id = F.concat(
        F.lit("conv-"), F.lpad((F.col("user_id") % 200).cast("string"), 6, "0")
    )
    turn_idx = (eid % 40).cast("int")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        ((eid % 4) + 1).cast("int"),
    )
    text = F.concat_ws("|", F.col("event_type"), F.col("props"))
    tool = F.when(
        eid % 4 == 3, F.concat(F.lit("tool-"), (eid % 7).cast("string"))
    ).otherwise(F.lit(None).cast("string"))
    null_s = F.lit(None).cast("string")
    return ev.select(
        op.alias("op"),
        F.col("ts"),
        eid.alias("op_seq"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(is_del, null_s).otherwise(role).alias("role"),
        F.when(is_del, null_s).otherwise(text).alias("text"),
        F.when(is_del, null_s).otherwise(tool).alias("tool"),
    )


FEED_SQL = """
    SELECT
      CASE WHEN event_id % 19 = 0 THEN 'D'
           WHEN event_id % 3 = 0 THEN 'I' ELSE 'U' END AS op,
      ts,
      event_id AS op_seq,
      'conv-' || lpad(CAST(user_id % 200 AS VARCHAR), 6, '0') AS conv_id,
      CAST(event_id % 40 AS INTEGER) AS turn_idx,
      CASE WHEN event_id % 19 = 0 THEN NULL
           ELSE (['user','assistant','system','tool'])[CAST(event_id % 4 AS INTEGER) + 1]
      END AS role,
      CASE WHEN event_id % 19 = 0 THEN NULL
           ELSE event_type || '|' || props END AS text,
      CASE WHEN event_id % 19 = 0 THEN NULL
           WHEN event_id % 4 = 3 THEN 'tool-' || CAST(event_id % 7 AS VARCHAR)
           ELSE NULL END AS tool
    FROM events
"""

LWW_STATE_SQL = f"""
    WITH feed AS ({FEED_SQL}),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
        ) AS rn
        FROM feed
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""

CONSTRAINT_STATE_SQL = f"""
    WITH feed AS ({FEED_SQL}),
    gated AS (
        SELECT * FROM feed
        -- coalesce(..., FALSE): a NULL role on an upsert makes the inner
        -- predicate NULL, and bare WHERE NOT NULL would EXCLUDE the row —
        -- while the engine's CHECK-constraint semantics (eqNullSafe on
        -- FALSE) let NULL-evaluating rows PASS, per SQL CHECK. Pin the
        -- oracle to the engine's (standard) behavior.
        WHERE NOT coalesce(op IN ('I','U') AND NOT (role <> 'system'), FALSE)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
        ) AS rn
        FROM gated
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""

DISPOSITIONS_SQL = f"""
    WITH feed AS ({FEED_SQL}),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
        ) AS rn
        FROM feed
    )
    SELECT op, count(*) AS n_keys
    FROM ranked WHERE rn = 1 GROUP BY op
"""


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def cdc_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = change_feed_from_events(spark, sf_dir)
    return lww_dedup(feed).filter(F.col("op") != "D").select(*FINAL_COLS)


def cdc_lww_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = change_feed_from_events(spark, sf_dir)
    return (
        lww_dedup_salted(feed, salt_buckets=16)
        .filter(F.col("op") != "D")
        .select(*FINAL_COLS)
    )


def cdc_dispositions(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = change_feed_from_events(spark, sf_dir)
    return lww_dedup(feed).groupBy("op").agg(F.count("*").alias("n_keys"))


def cdc_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-engine path: split the derived feed into 4 binlog segments
    (round-robin on op_seq ⇒ heavy cross-segment out-of-order + duplicate
    keys), replay through LakeTable/apply_batch (bucketed merge, tombstones,
    commit manifest), read back the live table. Same oracle as
    ``cdc_lww_state`` — cross-batch LWW must equal the global reduction."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_replay_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    # table schema mirrors the feed's payload types exactly (parquet loads
    # timestamps as TIMESTAMP_NTZ under Spark 4 — don't fight the source)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    replay_feed(spark, table, feed_dir)
    return table.read(spark).select(*FINAL_COLS)


def cdc_constraint_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay with a declared drop-policy expectation (Delta CHECK /
    DLT analog, LakeTable.add_constraint): ``role <> 'system'`` rows
    are rejected by the ingest path BEFORE the merge, so a violating
    update never clobbers an earlier valid version. Oracle: LWW over
    the feed with violating upserts removed first (tombstones exempt)."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_constraint_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    table.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    # the op_seq%4 segmenting correlates with the derived role, so one
    # segment is ~all violations — the demo disables the error budget to
    # show pure constraint filtering; production keeps the 10% failfast
    replay_feed(spark, table, feed_dir, fail_threshold=1.0)
    return table.read(spark).select(*FINAL_COLS)


def cdc_zorder_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path THROUGH a maintenance rewrite: the 4-segment
    replay of ``cdc_replay_state`` followed by ``cluster_zorder`` (Morton
    re-layout over conv_id x ts, MOR deltas collapsed, stats rebuilt),
    then read back. Same oracle as the plain replay — a maintenance
    rewrite must never change table content, only layout. This is the
    oracle-checked form of the rewrite-safety contract the pruning tests
    assert locally."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_zorder_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    replay_feed(spark, table, feed_dir, mode="mor")
    table.cluster_zorder(spark, files_per_bucket=4)
    return table.read(spark).select(*FINAL_COLS)


def cdc_wap_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish replay (Iceberg WAP analog over branch refs):
    the same 4-segment feed as ``cdc_replay_state`` is staged entirely on
    a branch, audited against the STAGED view (row-accounting invariant
    plus a staged-vs-feed key-count reconciliation), then published by one
    atomic fast-forward of the snapshot pointer. Readers of the published
    table transition base→final in a single step; the final state must
    equal the global LWW oracle — proving staging + publish preserves
    exactly the semantics of direct replay."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import wap_replay
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_wap_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)

    def audit(br: LakeTable) -> bool:
        # staged live keys must not exceed the feed's distinct key count
        # (an over-count would mean duplicate keys leaked past the merge)
        n_staged = br.read(spark).count()
        n_keys = feed.select("conv_id", "turn_idx").distinct().count()
        return 0 < n_staged <= n_keys

    wap_replay(spark, table, feed_dir, audit=audit, mode="mor")
    return table.read(spark).select(*FINAL_COLS)


def cdc_replica_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog replication (CDC-out): replay half the feed into a SOURCE
    table, bootstrap a replica (snapshot copy preserving each row's winning
    (ts, op_seq)), replay the rest into the source, then advance the
    replica INCREMENTALLY from the source's changelog
    (``changes_between(emit_meta=True)`` — inserts/updates/deletes with
    their original LWW metadata). The replica's final state must equal the
    global LWW oracle — i.e. following the changelog is indistinguishable
    from having consumed the feed directly. Replica uses a different
    bucket count (8 vs 16) to prove sync is layout-independent."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.replicate import sync_replica
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_repl_")
    feed_a = os.path.join(work, "feed_a")
    feed_b = os.path.join(work, "feed_b")
    write_feed(feed.filter(F.col("batch") < 2), feed_a)
    write_feed(feed.filter(F.col("batch") >= 2), feed_b)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    src = LakeTable.create(os.path.join(work, "src"), user_schema, n_buckets=16)
    dst = LakeTable.create(os.path.join(work, "dst"), user_schema, n_buckets=8)
    replay_feed(spark, src, feed_a, mode="mor")
    sync_replica(spark, src, dst)  # bootstrap: snapshot copy
    replay_feed(spark, src, feed_b, mode="mor")
    sync_replica(spark, src, dst)  # incremental: changelog diff only
    return dst.read(spark).select(*FINAL_COLS)


STREAM_STATS_SQL = f"""
    WITH feed AS ({FEED_SQL})
    SELECT conv_id,
           count(*) AS events_seen,
           max(turn_idx) AS max_turn,
           max(ts) AS last_ts
    FROM feed GROUP BY conv_id
"""


def cdc_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful STREAMING path (SURVEY §2.9): the derived feed is split
    into 3 binlog segments × 2 files and drained through
    ``conv_running_stats`` (applyInPandasWithState) with
    maxFilesPerTrigger=2, so per-conversation counters MUST survive ≥3
    micro-batch boundaries; the latest emission per conversation is
    returned and must equal the global batch aggregate (the oracle) —
    trigger-count-independent by construction. Reference analog:
    per-session state carried across the input scan
    (/root/reference/parser/ndt.go:210-309)."""
    from etl_spark.cdc.gen import write_feed
    from etl_spark.cdc.stateful import conv_running_stats

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(3)).cast("int")
    )
    work = _work_dir("etl_spark_stream_stats_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=3, files_per_segment=2)
    out_dir = os.path.join(work, "out")
    conv_running_stats(
        spark, feed_dir, os.path.join(work, "ckpt"), out_dir,
        max_files_per_trigger=2,
    )
    out = spark.read.parquet(out_dir)
    last = out.groupBy("conv_id").agg(F.max("emit_seq").alias("emit_seq"))
    return out.join(last, ["conv_id", "emit_seq"]).select(
        "conv_id",
        "events_seen",
        "max_turn",
        F.col("last_ts").cast("timestamp_ntz").alias("last_ts"),
    )


# --- per-conversation final-state rollup -------------------------------------
# The downstream consumer view over the merged lake state: how long is each
# conversation, how tool-heavy, and when did it last change. One hash
# aggregate over the LWW reduction — at 100 TB the groupBy key (conv_id) is
# a strict prefix of the dedup key, so AQE reuses the dedup exchange's
# clustering (no second shuffle after the partial-agg combine).

CONV_STATS_SQL = f"""
    SELECT conv_id,
           count(*) AS n_turns,
           count(tool) AS n_tool_turns,
           max(ts) AS last_ts,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM ({LWW_STATE_SQL})
    GROUP BY conv_id
"""


def cdc_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = cdc_lww_state(spark, sf_dir)
    return state.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_turns"),
        F.max("ts").alias("last_ts"),
        F.sum(F.length("text")).alias("total_chars"),
    )


# --- changelog read (CDC read-side: snapshot diff) ----------------------------

CHANGELOG_SQL = f"""
    WITH feed AS ({FEED_SQL}),
    s1 AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
            ) AS rn
            FROM feed WHERE op_seq % 4 = 0
        ) WHERE rn = 1
    ),
    sf AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
            ) AS rn
            FROM feed
        ) WHERE rn = 1
    ),
    d AS (
        SELECT
            coalesce(a.conv_id, b.conv_id) AS conv_id,
            coalesce(a.turn_idx, b.turn_idx) AS turn_idx,
            b.role AS role, b.text AS text, b.tool AS tool, b.ts AS ts,
            CASE
                WHEN (a.op_seq IS NULL OR a.op = 'D')
                     AND b.op_seq IS NOT NULL AND b.op <> 'D'
                    THEN 'insert'
                WHEN a.op_seq IS NOT NULL AND a.op <> 'D'
                     AND (b.op_seq IS NULL OR b.op = 'D')
                    THEN 'delete'
                WHEN a.op_seq IS NOT NULL AND a.op <> 'D'
                     AND b.op_seq IS NOT NULL AND b.op <> 'D'
                     AND a.op_seq <> b.op_seq
                    THEN 'update_postimage'
            END AS _change_type
        FROM s1 a FULL OUTER JOIN sf b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
    )
    SELECT conv_id, turn_idx,
           CASE WHEN _change_type = 'delete' THEN NULL ELSE role END AS role,
           CASE WHEN _change_type = 'delete' THEN NULL ELSE text END AS text,
           CASE WHEN _change_type = 'delete' THEN NULL ELSE tool END AS tool,
           CASE WHEN _change_type = 'delete' THEN NULL ELSE ts END AS ts,
           _change_type
    FROM d WHERE _change_type IS NOT NULL
"""


def cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog read (LakeTable.changes_between): replay the 4-segment
    feed, then diff snapshot v1 (state after segment 0) against the
    current snapshot. The oracle reproduces the same diff from the raw
    feed: LWW state over op_seq%4=0 vs LWW state over everything,
    insert/update_postimage/delete classified by winner liveness and
    winning op_seq. Exercises time-travel manifests + the co-partitioned
    full-outer snapshot join."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_changelog_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    replay_feed(spark, table, feed_dir)
    versions = table.versions()
    return table.changes_between(spark, v_from=versions[1])


# --- mid-stream schema evolution (north-star case) -----------------------------

EVOLUTION_SQL = f"""
    WITH feed AS (
        SELECT f.*,
               CASE WHEN op_seq % 4 >= 2 AND op <> 'D'
                    THEN 'v' || CAST(op_seq % 5 AS VARCHAR) END AS tool_version,
               CASE WHEN op_seq % 4 >= 2 AND op <> 'D'
                    THEN op_seq % 1000 END AS tool_latency_ms
        FROM ({FEED_SQL}) f
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
        ) AS rn
        FROM feed
    )
    SELECT conv_id, turn_idx, role, text, tool, ts,
           tool_version, tool_latency_ms
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def cdc_evolution_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star schema-evolution case as an oracle-checked query: new
    tool metadata columns (tool_version, tool_latency_ms) appear from
    segment 2 of 4 — segments 0-1 are physically written WITHOUT them
    (they didn't exist yet). The engine evolves the table schema on first
    contact (era-tagged files, no rewrite of old data), and the final
    state must equal the oracle's LWW reduction where pre-evolution
    winners carry NULLs. Reference analog: era-gated fields arriving as
    new JSON keys (/root/reference/parser/ndt5_result.go:72-78)."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir)
    live = F.col("op") != "D"
    feed = (
        feed.withColumn(
            "tool_version",
            F.when(
                live, F.concat(F.lit("v"), (F.col("op_seq") % 5).cast("string"))
            ),
        )
        .withColumn(
            "tool_latency_ms", F.when(live, F.col("op_seq") % 1000)
        )
        .withColumn("batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int"))
    )
    work = _work_dir("etl_spark_evolution_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, evolve_from_batch=2, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    replay_feed(spark, table, feed_dir)
    return table.read(spark)


def cdc_rebucket_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-count evolution under the oracle: full 4-segment replay into
    a 16-bucket table, then rebucket(48) — the final state read from the
    NEW layout must still equal the global LWW reduction (same oracle as
    cdc_replay_state). Proves the rewrite carries rows, tombstones, and
    schema eras without loss."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_rebucket_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    replay_feed(spark, table, feed_dir)
    table.rebucket(spark, 48)
    return table.read(spark).select(*FINAL_COLS)


def _replayed_table(
    spark: SparkSession, sf_dir: str, prefix: str, n_buckets: int = 16,
    mode: str = "cow", skip_blooms: list[str] | None = None,
):
    """Shared scaffold for replay-backed queries: derive the feed, split it
    into 4 binlog segments, replay through the full engine, return the
    LakeTable."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir(prefix)
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(
        os.path.join(work, "lake"), user_schema, n_buckets=n_buckets
    )
    if skip_blooms:
        table.set_skip_blooms(skip_blooms)
    replay_feed(spark, table, feed_dir, mode=mode)
    return table


# --- stats-pruned point lookup ------------------------------------------------
# The serving-side read pattern: fetch ONE conversation out of the lake.
# The manifest prunes to the key's hash bucket, then file-level conv_id
# min/max stats skip files inside the bucket (Iceberg: partition pruning +
# data-file metrics skipping). At 10^10 events / 4096 buckets the lookup
# scans ~1/4096 of the files, independent of table size — never a full scan.

POINT_LOOKUP_CONVS = ["conv-000042", "conv-000137", "conv-000199"]

POINT_LOOKUP_SQL = f"""
    SELECT * FROM ({LWW_STATE_SQL})
    WHERE conv_id IN ('conv-000042', 'conv-000137', 'conv-000199')
"""


def cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full replay, then stats-pruned point reads of three conversations.
    Equality with the filtered global LWW oracle proves the pruned scan set
    (bucket + file-skipping) still covers every file that can hold the key."""
    table = _replayed_table(spark, sf_dir, "etl_spark_ptlookup_", mode="mor")
    out = table.point_read(spark, POINT_LOOKUP_CONVS[0])
    for c in POINT_LOOKUP_CONVS[1:]:
        out = out.unionByName(table.point_read(spark, c))
    return out.select(*FINAL_COLS)


# --- value-bloom file skipping: equality lookup on a NON-key column -----------
# The secondary-lookup serving pattern the manifest min/max stats cannot
# help with: "find the turns whose text equals this exact string". Every
# data file written after set_skip_blooms carries a per-column bloom
# sidecar (Iceberg puffin analog, lake/table.py); the lookup scans only
# files whose bloom admits the probe. The probe is data-derived (the
# lexicographic max text of the final state) so the query is deterministic
# at any scale factor without a hardcoded literal; equality with the
# filtered global LWW oracle proves the pruned scan set loses no row.

VALUE_LOOKUP_SQL = f"""
    WITH state AS ({LWW_STATE_SQL})
    SELECT * FROM state
    WHERE text = (SELECT max(text) FROM state)
"""


def cdc_value_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay with text value-blooms declared, then an exact-match lookup
    on the non-key text column via the bloom-pruned read path. MOR mode —
    the read must hold LWW correctness at bucket granularity while deltas
    are unresolved (see LakeTable.read_where_equal)."""
    table = _replayed_table(
        spark, sf_dir, "etl_spark_vlookup_", mode="mor", skip_blooms=["text"]
    )
    probe = table.read(spark).agg(F.max("text")).first()[0]
    return table.read_where_equal(spark, "text", probe).select(*FINAL_COLS)


# --- incremental materialized-view maintenance --------------------------------
# Replay the feed through the engine, bootstrap the per-conversation rollup
# MV from the FIRST committed snapshot only, then bring it to the head
# snapshot purely through changelog-scoped incremental refreshes. Equality
# with the full-recompute oracle (CONV_STATS_SQL over the whole feed)
# proves the delta-maintenance algebra: partial re-aggregation of affected
# conversations only, O(changed keys) per refresh at any table size.

def cdc_mv_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_spark.lake.mv import ConvSummaryMV

    table = _replayed_table(spark, sf_dir, "etl_spark_mv_", mode="mor")
    versions = table.versions()
    mv = ConvSummaryMV(os.path.join(os.path.dirname(table.path), "mv"))
    mv.full_refresh(spark, table, version=versions[0])
    # step through every retained snapshot so each refresh is a true
    # changelog-scoped delta (not one big diff to head)
    for v in versions[1:]:
        mv.refresh(spark, table, to_version=v)
    return mv.read(spark).select(
        "conv_id", "n_turns", "n_tool_turns", "last_ts", "total_chars"
    )


# --- nested restructure: flat turns → nested transcript record ----------------
# The inverse of hop_tree_flatten and the reference's core row shape: every
# parser there assembles a deeply nested `raw` record from flat pieces
# before emitting (ScamperHop trees, /root/reference/schema/pt_schema.go:14-58;
# nested Web100ValueMap groups, /root/reference/schema/web100.go:26-39).
# Here: the merged LWW state is re-nested into one row per conversation
# holding an ordered array<struct> of its turns, serialized to JSON so the
# DuckDB oracle can compare the nested value byte-for-byte. The groupBy
# key is the bucket key's prefix — at scale this aggregation reuses the
# merge exchange's clustering (no extra shuffle after partial agg).

CONV_TRANSCRIPT_SQL = f"""
    SELECT conv_id,
           count(*) AS n_turns,
           to_json(list(struct_pack(
               turn_idx := turn_idx, role := role, text_md5 := md5(text)
           ) ORDER BY turn_idx, role, md5(text))) AS transcript_json
    FROM ({LWW_STATE_SQL})
    GROUP BY conv_id
"""


def conv_transcript_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = cdc_lww_state(spark, sf_dir)
    turn = F.struct(
        F.col("turn_idx"), F.col("role"), F.md5("text").alias("text_md5")
    )
    return state.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.to_json(F.sort_array(F.collect_list(turn))).alias("transcript_json"),
    )


# --- ts-stats time-window read -------------------------------------------------
# "What changed in week 2?" over the merged state: the manifest's per-file
# ts min/max skip every data file (delta-free buckets) or bucket (MOR)
# that cannot intersect the window. Window literals are fixed so the
# DuckDB oracle is the same predicate over the global LWW reduction.

TIME_WINDOW = ("2024-01-08T00:00:00", "2024-01-15T00:00:00")

TIME_WINDOW_SQL = f"""
    SELECT * FROM ({LWW_STATE_SQL})
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-15 00:00:00'
"""


def cdc_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _replayed_table(spark, sf_dir, "etl_spark_twin_", mode="mor")
    # resolve deltas first so the read exercises the per-FILE skipping
    # path over cluster-sorted rewrites (the MOR bucket-granular path is
    # covered by unit tests)
    table.resolve_deltas(spark)
    return table.read_between(spark, *TIME_WINDOW).select(*FINAL_COLS)


# ---------------------------------------------------------------------------
# partial-update (op='P') per-column LWW — cdc/patch.py driven whole-log
# ---------------------------------------------------------------------------

def change_feed_with_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic feed with every 5th would-be-U remapped to a
    sparse patch: role never patched, text patched on even op_seq (prefix
    'patch|'), tool patched on odd op_seq ('ptool-<n>'). NULL = unchanged."""
    feed = change_feed_from_events(spark, sf_dir)
    is_p = (F.col("op") == "U") & (F.col("op_seq") % 5 == 1)
    null_s = F.lit(None).cast("string")
    return feed.select(
        F.when(is_p, F.lit("P")).otherwise(F.col("op")).alias("op"),
        "ts",
        "op_seq",
        "conv_id",
        "turn_idx",
        F.when(is_p, null_s).otherwise(F.col("role")).alias("role"),
        F.when(
            is_p,
            F.when(F.col("op_seq") % 2 == 0, F.concat(F.lit("patch|"), F.col("text"))),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(
            is_p,
            F.when(
                F.col("op_seq") % 2 == 1,
                F.concat(F.lit("ptool-"), (F.col("op_seq") % 7).cast("string")),
            ),
        )
        .otherwise(F.col("tool"))
        .alias("tool"),
    )


def cdc_patch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-log per-column LWW over a feed with sparse patches: one hash
    aggregation (map-side partials), no join, no window sort — the same
    resolver the patch merge uses batch-wise (cdc/patch.resolve_events)."""
    from etl_spark.cdc.patch import resolve_events

    feed = change_feed_with_patches(spark, sf_dir)
    return (
        resolve_events(feed, ["role", "text", "tool"])
        .filter(F.col("op") == "U")
        .select(*FINAL_COLS)
    )


PATCH_FEED_SQL = f"""
    SELECT CASE WHEN op = 'U' AND op_seq % 5 = 1 THEN 'P' ELSE op END AS op,
           ts, op_seq, conv_id, turn_idx,
           CASE WHEN op = 'U' AND op_seq % 5 = 1 THEN NULL ELSE role END AS role,
           CASE WHEN op = 'U' AND op_seq % 5 = 1
                THEN CASE WHEN op_seq % 2 = 0 THEN 'patch|' || text END
                ELSE text END AS text,
           CASE WHEN op = 'U' AND op_seq % 5 = 1
                THEN CASE WHEN op_seq % 2 = 1
                          THEN 'ptool-' || CAST(op_seq % 7 AS VARCHAR) END
                ELSE tool END AS tool
    FROM ({FEED_SQL})
"""

PATCH_STATE_SQL = f"""
    WITH pfeed AS ({PATCH_FEED_SQL}),
    d AS (
        SELECT conv_id, turn_idx, max(row(ts, op_seq)) AS dord
        FROM pfeed WHERE op = 'D' GROUP BY conv_id, turn_idx
    )
    SELECT f.conv_id, f.turn_idx,
        first(role ORDER BY ts DESC, op_seq DESC)
            FILTER (WHERE op IN ('I','U')) AS role,
        first(text ORDER BY ts DESC, op_seq DESC)
            FILTER (WHERE op IN ('I','U')
                    OR (op = 'P' AND text IS NOT NULL)) AS text,
        first(tool ORDER BY ts DESC, op_seq DESC)
            FILTER (WHERE op IN ('I','U')
                    OR (op = 'P' AND tool IS NOT NULL)) AS tool,
        first(ts ORDER BY ts DESC, op_seq DESC) AS ts
    FROM pfeed f LEFT JOIN d USING (conv_id, turn_idx)
    WHERE f.op <> 'D' AND (d.dord IS NULL OR row(f.ts, f.op_seq) > d.dord)
    GROUP BY f.conv_id, f.turn_idx
"""


def cdc_patch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENGINE path for patches: write the patch feed as binlog segments
    (contiguous op_seq ranges — the binlog contract under which batch-wise
    patch apply equals the whole-log reduction), replay them through
    LakeTable with allow_patches=True (merge-on-read), and read the final
    table. Must equal the same declarative oracle as cdc_patch_state."""
    from pyspark.sql import Window as _W, types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.lake.table import LakeTable

    work = _work_dir("etl_spark_patchreplay_")
    feed_dir = os.path.join(work, "feed")
    feed = change_feed_with_patches(spark, sf_dir)
    # synthesize binlog segments: contiguous chunks of the (ts, op_seq)
    # total order. A REAL binlog arrives already segmented this way — the
    # global ntile sort below exists only because the demo derives the feed
    # from an unordered events table; production replay never sorts.
    n_seg = 4
    tagged = feed.withColumn(
        "__seg", F.ntile(n_seg).over(_W.orderBy("ts", "op_seq")) - 1
    )
    for s in range(n_seg):
        tagged.filter(F.col("__seg") == s).drop("__seg").write.parquet(
            os.path.join(feed_dir, f"segment-{s:04d}")
        )
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(
        os.path.join(work, "lake"), user_schema, n_buckets=32
    )
    replay_feed(spark, table, feed_dir, mode="mor", allow_patches=True)
    return table.read(spark).select(*FINAL_COLS)


# ---------------------------------------------------------------------------
# Debezium-style envelope ingestion (cdc/envelope.py)
# ---------------------------------------------------------------------------

def _wire_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic feed serialized as Debezium-style JSON envelopes —
    the wire a real binlog tail delivers. Construction is explicit string
    concat (identical text in the SQL oracle below); text is sanitized of
    quote/backslash so the envelope needs no JSON escaping."""
    feed = change_feed_from_events(spark, sf_dir)
    dop = (
        F.when(F.col("op") == "D", F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .when(F.col("op_seq") % 10 == 0, F.lit("r"))  # snapshot-read image
        .otherwise(F.lit("c"))
    )
    tsstr = F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    ctext = F.regexp_replace(F.col("text"), r'["\\]', "")
    head = F.concat(
        F.lit('{"op":"'), dop, F.lit('","ts":"'), tsstr,
        F.lit('","lsn":'), F.col("op_seq").cast("string"),
    )
    key_part = F.concat(
        F.lit('{"conv_id":"'), F.col("conv_id"),
        F.lit('","turn_idx":'), F.col("turn_idx").cast("string"),
    )
    after = F.concat(
        key_part,
        F.lit(',"role":"'), F.col("role"),
        F.lit('","text":"'), ctext, F.lit('"'),
        F.when(
            F.col("tool").isNotNull(),
            F.concat(F.lit(',"tool":"'), F.col("tool"), F.lit('"')),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    body = F.when(
        dop == "d", F.concat(F.lit(',"before":'), key_part, F.lit("}"))
    ).otherwise(F.concat(F.lit(',"after":'), after))
    return feed.select(F.concat(head, body, F.lit("}")).alias("value"))


def cdc_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire → engine columns via cdc/envelope.from_debezium: one from_json
    with an explicit schema and pure struct projections (map-only plan; at
    100 TB this is the scan-speed head of the apply pipeline)."""
    from etl_spark.cdc.envelope import from_debezium

    return from_debezium(_wire_df(spark, sf_dir))


_WIRE_SQL = f"""
    SELECT '{{"op":"' || dop || '","ts":"' || strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
           || '","lsn":' || CAST(op_seq AS VARCHAR)
           || CASE WHEN dop = 'd'
                THEN ',"before":{{"conv_id":"' || conv_id || '","turn_idx":'
                     || CAST(turn_idx AS VARCHAR) || '}}'
                ELSE ',"after":{{"conv_id":"' || conv_id || '","turn_idx":'
                     || CAST(turn_idx AS VARCHAR)
                     || ',"role":"' || role || '","text":"'
                     || regexp_replace(text, '["\\\\]', '', 'g') || '"'
                     || CASE WHEN tool IS NOT NULL
                             THEN ',"tool":"' || tool || '"' ELSE '' END
                     || '}}'
              END || '}}' AS value
    FROM (
        SELECT f.*, CASE WHEN op = 'D' THEN 'd'
                         WHEN op = 'U' THEN 'u'
                         WHEN op_seq % 10 = 0 THEN 'r'
                         ELSE 'c' END AS dop
        FROM ({FEED_SQL}) f
    )
"""

ENVELOPE_DECODE_SQL = f"""
    WITH wire AS ({_WIRE_SQL})
    SELECT CASE json_extract_string(value, '$.op')
                WHEN 'c' THEN 'I' WHEN 'r' THEN 'I'
                WHEN 'u' THEN 'U' WHEN 'd' THEN 'D' END AS op,
           CAST(json_extract_string(value, '$.ts') AS TIMESTAMP) AS ts,
           CAST(json_extract_string(value, '$.lsn') AS BIGINT) AS op_seq,
           CASE WHEN json_extract_string(value, '$.op') = 'd'
                THEN json_extract_string(value, '$.before.conv_id')
                ELSE json_extract_string(value, '$.after.conv_id') END AS conv_id,
           CAST(CASE WHEN json_extract_string(value, '$.op') = 'd'
                THEN json_extract_string(value, '$.before.turn_idx')
                ELSE json_extract_string(value, '$.after.turn_idx') END
                AS INTEGER) AS turn_idx,
           CASE WHEN json_extract_string(value, '$.op') = 'd' THEN NULL
                ELSE json_extract_string(value, '$.after.role') END AS role,
           CASE WHEN json_extract_string(value, '$.op') = 'd' THEN NULL
                ELSE json_extract_string(value, '$.after.text') END AS text,
           CASE WHEN json_extract_string(value, '$.op') = 'd' THEN NULL
                ELSE json_extract_string(value, '$.after.tool') END AS tool
    FROM wire
"""


def cdc_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the standard 4-segment feed, then run the row-level
    maintenance pair: DELETE FROM ... WHERE role = 'system' (tombstone +
    payload redaction, etl_spark/lake/table.py delete_where) and
    UPDATE ... SET tool = 'masked' WHERE tool IS NOT NULL (update_where).
    Final state must equal the global LWW oracle minus the deleted rows
    with the update applied — proving the copy-on-write maintenance
    rewrites compose with the CDC merge without disturbing untouched keys.
    Reference analog: gardener reprocess-time row retractions/fix-ups
    (/root/reference/schema/README.md:6-10)."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(4)).cast("int")
    )
    work = _work_dir("etl_spark_delupd_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=4)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    table = LakeTable.create(os.path.join(work, "lake"), user_schema, n_buckets=16)
    replay_feed(spark, table, feed_dir)
    table.delete_where(spark, "role = 'system'")
    table.update_where(spark, "tool IS NOT NULL", {"tool": "'masked'"})
    return table.read(spark).select(*FINAL_COLS)


DELETE_UPDATE_SQL = f"""
    WITH feed AS ({FEED_SQL}),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
        ) AS rn
        FROM feed
    ),
    state AS (
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT conv_id, turn_idx, role, text,
           CASE WHEN tool IS NOT NULL THEN 'masked' ELSE tool END AS tool,
           ts
    FROM state
    WHERE NOT coalesce(role = 'system', FALSE)
"""


# --- multi-table binlog routing (cdc/route.py) ---------------------------------

def cdc_route_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table routing: tag each feed event with its target table
    (``tbl`` = raw.chat / raw.agent by conversation number parity — a
    deterministic split both engines can reproduce), replay the ONE
    interleaved feed through cdc/route.replay_feed_routed with
    transactional cross-table publication, and return the union of both
    tables' final states labeled by table. The oracle is the global LWW
    reduction with the same route label — routing must be a pure partition
    of the feed (each conversation's events all land on one table, so
    per-key LWW is unaffected by the split). Reference analog: datatype →
    parser/table dispatch (/root/reference/parser/parser.go:89-112,
    /root/reference/etl/globals.go:309-323)."""
    from pyspark.sql import types as T

    from etl_spark.cdc.route import replay_feed_routed
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.catalog import LakeCatalog

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(2)).cast("int")
    )
    route = F.when(
        F.substring("conv_id", 6, 10).cast("int") % 2 == 0, F.lit("raw.chat")
    ).otherwise(F.lit("raw.agent"))
    work = _work_dir("etl_spark_route_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed.withColumn("tbl", route), feed_dir, n_batches=2)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    cat = LakeCatalog(os.path.join(work, "cat"))
    cat.create_table("raw.chat", user_schema, n_buckets=8)
    cat.create_table("raw.agent", user_schema, n_buckets=4)
    replay_feed_routed(spark, cat, feed_dir, transactional=True, mode="mor")
    parts = [
        cat.read_committed(spark, ident)
        .select(F.lit(ident).alias("src_table"), *FINAL_COLS)
        for ident in ("raw.chat", "raw.agent")
    ]
    return parts[0].unionByName(parts[1])


ROUTE_SPLIT_SQL = f"""
    WITH feed AS ({FEED_SQL}),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
        ) AS rn
        FROM feed
    ),
    state AS (
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM ranked WHERE rn = 1 AND op <> 'D'
    )
    SELECT CASE WHEN CAST(substr(conv_id, 6) AS INTEGER) % 2 = 0
                THEN 'raw.chat' ELSE 'raw.agent' END AS src_table,
           conv_id, turn_idx, role, text, tool, ts
    FROM state
"""


# --- CDC-out wire round trip (cdc/envelope.to_debezium) ------------------------

def cdc_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-out + CDC-in closure: replay the feed into a source table, read
    its changelog from v0, encode to Debezium wire JSON
    (``to_debezium``), decode with the standard inbound adapter
    (``from_debezium``), apply to a FRESH table, and return that replica's
    final state — which must equal the global LWW oracle. Proves the wire
    format is lossless for op/ts/op_seq/images, i.e. two engines can chain
    over a message bus (the downstream-consumption role of the reference's
    JSONL sink, /root/reference/storage/rowwriter.go:96-107)."""
    from pyspark.sql import types as T

    from etl_spark.cdc.apply import apply_batch, replay_feed
    from etl_spark.cdc.envelope import from_debezium, to_debezium
    from etl_spark.cdc.gen import write_feed
    from etl_spark.lake.table import LakeTable

    feed = change_feed_from_events(spark, sf_dir).withColumn(
        "batch", F.pmod(F.col("op_seq"), F.lit(2)).cast("int")
    )
    work = _work_dir("etl_spark_wire_")
    feed_dir = os.path.join(work, "feed")
    write_feed(feed, feed_dir, n_batches=2)
    feed_t = {f.name: f.dataType for f in feed.schema.fields}
    user_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", feed_t["ts"], True),
        ]
    )
    src = LakeTable.create(os.path.join(work, "src"), user_schema, n_buckets=16)
    replay_feed(spark, src, feed_dir, mode="mor")
    wires = to_debezium(src.changes_between(spark, 0, emit_meta=True, emit_pre=True))
    decoded = from_debezium(wires).withColumn(
        "ts", F.col("ts").cast(feed_t["ts"].simpleString())
    )
    rep = LakeTable.create(os.path.join(work, "rep"), user_schema, n_buckets=8)
    apply_batch(spark, rep, decoded, "wire-boot", mode="mor")
    return rep.read(spark).select(*FINAL_COLS)


# --- envelope repair (bounded malformed-wire recovery) --------------------------
# The reference repairs recoverable broken JSON before giving up
# (/root/reference/parser/pt.go:233-249, jsonnet fallback); the engine
# analog is a pure-Catalyst regexp repair of the two common producer
# malformation classes (trailing commas, unquoted keys), applied ONLY to
# rows the strict parse rejects. This query corrupts a deterministic
# slice of the wire feed three ways — unquoted head key (repairable),
# trailing comma (repairable), truncation (dead) — and returns every
# wire's decode alongside its status, proving repaired and truly-dead
# rows are distinguished exactly as the DuckDB oracle distinguishes them.

def cdc_envelope_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_spark.cdc.envelope import decode_status, from_debezium

    wire = _wire_df(spark, sf_dir)
    lsn = F.get_json_object("value", "$.lsn").cast("long")
    mod = lsn % 10
    corrupted = (
        F.when(mod == 3, F.regexp_replace("value", r'^\{"op":', "{op:"))
        .when(mod == 7, F.regexp_replace("value", r"\}$", ",}"))
        .when(mod == 5, F.expr("substring(value, 1, length(value) - 6)"))
        .otherwise(F.col("value"))
    )
    cw = wire.select(corrupted.alias("value")).withColumn(
        "status", decode_status(F.col("value"))
    )
    return from_debezium(cw, repair=True, keep_cols=("status",))


_WIRE_CORRUPT_SQL = f"""
    SELECT CASE
             WHEN lsn % 10 = 3 THEN regexp_replace(value, '^\\{{"op":', '{{op:')
             WHEN lsn % 10 = 7 THEN regexp_replace(value, '\\}}$', ',}}')
             WHEN lsn % 10 = 5 THEN substr(value, 1, length(value) - 6)
             ELSE value END AS value
    FROM (
        SELECT value, CAST(json_extract_string(value, '$.lsn') AS BIGINT) AS lsn
        FROM ({_WIRE_SQL})
    )
"""

# the repair chain, textually mirrored from cdc/envelope.repair_envelope_json
# (trailing commas globally; unquoted key anchored to the envelope HEAD —
# an unanchored rule would mangle key-looking patterns inside text values)
_REPAIR_SQL = (
    "regexp_replace(regexp_replace(value, ',\\s*(\\}[\\s}\\]]*)$', '\\1'), "
    "'^\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*:', '{\"\\1\":')"
)

ENVELOPE_REPAIR_SQL = rf"""
    WITH cw AS ({_WIRE_CORRUPT_SQL}),
    -- DuckDB's json_valid (yyjson) ACCEPTS trailing commas that the
    -- engine's strict parser (Jackson) rejects; the extra regex guard
    -- aligns the oracle's notion of "strict" with the engine's. The
    -- guard is END-anchored (like the repair rule), so a comma-brace
    -- sequence inside a quoted payload can never affect classification.
    st AS (
        SELECT value,
               strict AND NOT regexp_matches(value, ',\s*\}}[\s}}\]]*$') AS strict_ok,
               rep_valid, repaired
        FROM (
            SELECT value, json_valid(value) AS strict,
                   json_valid({_REPAIR_SQL}) AS rep_valid,
                   {_REPAIR_SQL} AS repaired
            FROM cw
        )
    ),
    st2 AS (
        SELECT value,
               CASE WHEN strict_ok THEN 'ok'
                    WHEN rep_valid THEN 'repaired'
                    ELSE 'dead' END AS status,
               CASE WHEN strict_ok THEN value
                    WHEN rep_valid THEN repaired
                    ELSE NULL END AS v
        FROM st
    )
    SELECT CASE json_extract_string(v, '$.op')
                WHEN 'c' THEN 'I' WHEN 'r' THEN 'I'
                WHEN 'u' THEN 'U' WHEN 'd' THEN 'D' END AS op,
           CAST(json_extract_string(v, '$.ts') AS TIMESTAMP) AS ts,
           CAST(json_extract_string(v, '$.lsn') AS BIGINT) AS op_seq,
           CASE WHEN json_extract_string(v, '$.op') = 'd'
                THEN json_extract_string(v, '$.before.conv_id')
                ELSE json_extract_string(v, '$.after.conv_id') END AS conv_id,
           CAST(CASE WHEN json_extract_string(v, '$.op') = 'd'
                THEN json_extract_string(v, '$.before.turn_idx')
                ELSE json_extract_string(v, '$.after.turn_idx') END
                AS INTEGER) AS turn_idx,
           CASE WHEN json_extract_string(v, '$.op') = 'd' THEN NULL
                ELSE json_extract_string(v, '$.after.role') END AS role,
           CASE WHEN json_extract_string(v, '$.op') = 'd' THEN NULL
                ELSE json_extract_string(v, '$.after.text') END AS text,
           CASE WHEN json_extract_string(v, '$.op') = 'd' THEN NULL
                ELSE json_extract_string(v, '$.after.tool') END AS tool,
           status
    FROM st2
"""
