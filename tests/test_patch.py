"""Partial-update (op='P') CDC merge — per-column LWW with delete
dominance (cdc/patch.py + lake/merge._merge_patch).

Oracle: an independent DuckDB reduction over the WHOLE event log using
ordered filtered aggregates (first(x ORDER BY ts DESC, op_seq DESC)
FILTER (WHERE <setter>)) — per column, the newest setter after the newest
delete. The engine applies the same log split across segments/batches in
both merge modes; final table state must match the set-at-once oracle."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import BatchFailedError, apply_batch, replay_feed
from etl_spark.cdc.patch import resolve_events
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

EVENT_SCHEMA = (
    "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
    "role string, text string, tool string"
)


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk_events(seed: int = 7, n: int = 400) -> list[tuple]:
    """Deterministic mixed feed: ~60% full images, ~25% patches, ~15%
    deletes, ts ties broken by op_seq, duplicate deliveries.

    ts is monotone in op_seq (with ties): a binlog is totally ordered, so
    per-key event time never runs backwards ACROSS segments — the contract
    under which batch-wise patch apply equals the whole-log reduction
    (cdc/patch.py docstring). Cross-batch ts-disorder (late full rows /
    stale patches) is covered by the dedicated tests below."""
    rows = []
    for i in range(n):
        k = (f"conv-{(i * 13) % 23:03d}", (i * 7) % 5)
        ts = _t(i // 3)  # monotone, frequent ties -> op_seq tie-break
        r = (i * 31) % 20
        if r < 3:
            rows.append(("D", ts, i, *k, None, None, None))
        elif r < 8:
            # sparse patch: sets text or tool (or both), never role
            text = f"patch-text-{i}" if i % 2 == 0 else None
            tool = f"patch-tool-{i % 5}" if i % 3 == 0 else None
            if text is None and tool is None:
                text = f"patch-both-{i}"
            rows.append(("P", ts, i, *k, None, text, tool))
        else:
            op = "I" if i % 3 == 0 else "U"
            rows.append(
                (op, ts, i, *k, f"role-{i % 4}", f"full-text-{i}",
                 f"tool-{i % 7}" if i % 4 == 3 else None)
            )
    # duplicate deliveries of a slice (same ts+op_seq → idempotent)
    rows += rows[50:70]
    return rows


ORACLE_SQL = """
WITH d AS (
    SELECT conv_id, turn_idx, max(row(ts, op_seq)) AS dord
    FROM feed WHERE op = 'D' GROUP BY conv_id, turn_idx
),
live AS (
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
    FROM feed f LEFT JOIN d USING (conv_id, turn_idx)
    WHERE f.op <> 'D' AND (d.dord IS NULL OR row(f.ts, f.op_seq) > d.dord)
    GROUP BY f.conv_id, f.turn_idx
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM live
ORDER BY conv_id, turn_idx
"""


def _oracle(rows: list[tuple]) -> pd.DataFrame:
    feed = pd.DataFrame(
        rows,
        columns=["op", "ts", "op_seq", "conv_id", "turn_idx",
                 "role", "text", "tool"],
    )
    con = duckdb.connect()
    con.register("feed", feed)
    out = con.sql(ORACLE_SQL).df()
    con.close()
    return out.reset_index(drop=True)


def _table_state(spark, table: LakeTable) -> pd.DataFrame:
    df = (
        table.read(spark)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return df


def _write_segments(spark, rows: list[tuple], feed_dir: str, n_seg: int = 4):
    n = max(r[2] for r in rows) + 1
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    lo = F.col("op_seq") * n_seg / F.lit(n)
    for s in range(n_seg):
        seg = df.filter(
            (F.floor(lo) == s) | ((s == n_seg - 1) & (F.floor(lo) >= n_seg))
        )
        # shuffled WITHIN the segment: in-batch disorder is fully resolved
        seg.orderBy(F.md5(F.col("op_seq").cast("string"))).coalesce(1).write.parquet(
            os.path.join(feed_dir, f"segment-{s:04d}")
        )


def _assert_state_equal(got: pd.DataFrame, want: pd.DataFrame):
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = got.copy()
    got["ts"] = pd.to_datetime(got["ts"]).dt.tz_localize(None)
    want["ts"] = pd.to_datetime(want["ts"]).dt.tz_localize(None)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_replay_matches_oracle(spark, tmp_path, mode):
    rows = _mk_events()
    feed = str(tmp_path / "feed")
    _write_segments(spark, rows, feed)
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=8
    )
    stats = replay_feed(spark, table, feed, mode=mode, allow_patches=True)
    assert all(s.failed == 0 for s in stats)
    # counting invariant holds per batch
    for s in stats:
        assert s.events_in == s.failed + s.late_dropped + s.dup_dropped + s.applied()
    _assert_state_equal(_table_state(spark, table), _oracle(rows))
    # replay again: every batch idempotent, state unchanged
    stats2 = replay_feed(spark, table, feed, mode=mode, allow_patches=True)
    assert all(s.skipped_idempotent for s in stats2)
    _assert_state_equal(_table_state(spark, table), _oracle(rows))


def test_patch_on_empty_table_upserts_sparse_row(spark, tmp_path):
    """Bloom fast path: patches on unseen keys create rows holding just the
    patched fields (upsert-$set), with no table read."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    batch = spark.createDataFrame(
        [
            ("P", _t(5), 1, "conv-a", 0, None, "hello", None),
            ("P", _t(6), 2, "conv-a", 0, None, None, "grep"),
            ("P", _t(4), 3, "conv-b", 1, None, "older", None),
            ("P", _t(9), 4, "conv-b", 1, None, "newer", None),
        ],
        EVENT_SCHEMA,
    )
    s = apply_batch(spark, table, batch, "patch-batch-1", allow_patches=True)
    assert s.fast_path_append
    got = _table_state(spark, table)
    assert got.loc[0, ["text", "tool"]].tolist() == ["hello", "grep"]
    assert pd.isna(got.loc[0, "role"])
    assert got.loc[1, "text"] == "newer"
    # row (ts, op_seq) is the max non-D event's — LWW-comparable downstream
    assert got.loc[0, "ts"] == _t(6)


def test_patch_after_delete_only_patch_fields_survive(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    b1 = spark.createDataFrame(
        [("U", _t(1), 1, "c", 0, "user", "original", "t0")], EVENT_SCHEMA
    )
    apply_batch(spark, table, b1, "b1", allow_patches=True)
    b2 = spark.createDataFrame(
        [
            ("D", _t(2), 2, "c", 0, None, None, None),
            ("P", _t(3), 3, "c", 0, None, "resurrected", None),
        ],
        EVENT_SCHEMA,
    )
    apply_batch(spark, table, b2, "b2", allow_patches=True)
    got = _table_state(spark, table)
    assert len(got) == 1
    assert got.loc[0, "text"] == "resurrected"
    assert pd.isna(got.loc[0, "role"])  # killed by the delete
    assert pd.isna(got.loc[0, "tool"])


def test_stale_patch_loses_to_newer_committed_row(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    b1 = spark.createDataFrame(
        [("U", _t(10), 5, "c", 0, "user", "current", "t1")], EVENT_SCHEMA
    )
    apply_batch(spark, table, b1, "b1", allow_patches=True)
    late = spark.createDataFrame(
        [("P", _t(3), 6, "c", 0, None, "out-of-order", None)], EVENT_SCHEMA
    )
    s = apply_batch(spark, table, late, "b2", allow_patches=True)
    assert s.stale_skipped == 1 and s.updated == 0
    got = _table_state(spark, table)
    assert got.loc[0, "text"] == "current"


def test_patches_rejected_when_not_enabled(spark, tmp_path):
    """With allow_patches off, 'P' events count as failed rows and trip the
    error budget — never silently applied as full-row upserts."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    batch = spark.createDataFrame(
        [("P", _t(5), 1, "c", 0, None, "x", None)], EVENT_SCHEMA
    )
    with pytest.raises(BatchFailedError):
        apply_batch(spark, table, batch, "b1")


def test_resolver_disposition_vocabulary(spark):
    rows = [
        ("a", 1, "U", _t(1), 1, "r1", "t1", "x1", False),
        ("a", 1, "D", _t(2), 2, None, None, None, False),
        ("a", 1, "P", _t(3), 3, None, "patched", None, False),
        ("a", 3, "U", _t(3), 6, "rv", "tv", "xv", True),
        ("a", 3, "P", _t(2), 7, None, "late-patch", None, False),
        ("a", 4, "U", _t(1), 8, "rv", "tv", None, True),
        ("a", 4, "P", _t(4), 9, None, None, "newtool", False),
        ("a", 5, "U", _t(1), 10, "r5", "t5", None, True),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, op string, ts timestamp, "
        "op_seq long, role string, text string, tool string, "
        "__virtual boolean",
    )
    out = {
        r["turn_idx"]: r
        for r in resolve_events(
            df, ["role", "text", "tool"], virtual_col="__virtual"
        ).collect()
    }
    assert out[1]["__disp"] == "inserted" and out[1]["text"] == "patched"
    assert out[1]["role"] is None  # delete severed the older full image
    assert out[3]["__disp"] == "stale_skipped" and out[3]["text"] == "tv"
    assert out[4]["__disp"] == "updated" and out[4]["tool"] == "newtool"
    assert out[4]["text"] == "tv"  # untouched column survives the patch
    assert out[5]["__disp"] == "carried"


def test_stream_drain_with_patches(spark, tmp_path):
    """Structured Streaming drain (available_now) of a patch-bearing feed
    through run_stream(allow_patches=True) equals the whole-log oracle —
    the streaming driver shares apply_batch, so patches work identically
    under checkpointed micro-batching."""
    from etl_spark.cdc.stream import run_stream

    rows = _mk_events()
    feed = str(tmp_path / "feed")
    _write_segments(spark, rows, feed)
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=8
    )
    run_stream(
        spark, table, feed, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, available_now=True,
        mode="mor", allow_patches=True,
    )
    _assert_state_equal(_table_state(spark, table), _oracle(rows))
    assert len(table.commit_log()) >= 2  # really micro-batched


def test_patch_with_additive_schema_evolution(spark, tmp_path):
    """A patch event may carry a NEW column (additive evolution arriving
    via the sparse path — 'new tool metadata fields appear mid-stream').
    The merge must widen the table schema AND apply per-column semantics:
    the new column is set only where patched, NULL for every earlier row."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    b1 = spark.createDataFrame(
        [
            ("U", _t(1), 1, "c", 0, "user", "hello", None),
            ("U", _t(1), 2, "c", 1, "assistant", "world", None),
        ],
        EVENT_SCHEMA,
    )
    apply_batch(spark, table, b1, "b1", allow_patches=True)
    b2 = spark.createDataFrame(
        [("P", _t(5), 3, "c", 0, None, None, None, 5)],
        EVENT_SCHEMA + ", rating int",
    )
    apply_batch(spark, table, b2, "b2", allow_patches=True)
    got = (
        table.read(spark)
        .orderBy("turn_idx")
        .select("turn_idx", "text", "rating")
        .collect()
    )
    assert [f.name for f in table.user_schema().fields][-1] == "rating"
    assert got[0]["rating"] == 5 and got[0]["text"] == "hello"
    assert got[1]["rating"] is None  # untouched row got NULL, not garbage


def test_mor_stale_patch_stats_and_reduce_state(spark, tmp_path):
    """MOR mode must report the same disposition vocabulary as COW (the
    changed-keys filter prunes only the WRITE, not the metrics), and an
    all-stale batch that appends nothing must not flip needs_reduce on a
    compacted table."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    b1 = spark.createDataFrame(
        [("U", _t(10), 5, "c", 0, "user", "current", "t1")], EVENT_SCHEMA
    )
    apply_batch(spark, table, b1, "b1", allow_patches=True)
    assert not table.manifest().needs_reduce
    late = spark.createDataFrame(
        [("P", _t(3), 6, "c", 0, None, "out-of-order", None)], EVENT_SCHEMA
    )
    s = apply_batch(spark, table, late, "b2", mode="mor", allow_patches=True)
    assert s.stale_skipped == 1 and s.updated == 0  # mode-independent stats
    assert not table.manifest().needs_reduce  # nothing appended, no debt
    assert _table_state(spark, table).loc[0, "text"] == "current"


def test_patch_mor_missing_bloom_no_rebuild_no_false_fastpath(spark, tmp_path):
    """After a plain MOR append drops the bloom sidecar, a patch-carrying
    MOR batch must NOT full-table-rebuild it (it would recur every time)
    and must NOT treat unknown membership as proven-unseen: the fast path
    stays off, the merge reads the touched buckets, and the result is
    still correct. A cow patch batch rebuilds once and persists."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    b1 = spark.createDataFrame(
        [("U", _t(1), 1, "c", 0, "user", "base", "t0")], EVENT_SCHEMA
    )
    apply_batch(spark, table, b1, "b1", mode="mor")  # empty table: fast append
    b2 = spark.createDataFrame(
        [("U", _t(2), 2, "c", 1, "user", "two", None)], EVENT_SCHEMA
    )
    apply_batch(spark, table, b2, "b2", mode="mor")  # non-fast: drops bloom
    assert table.manifest().bloom is None
    p = spark.createDataFrame(
        [("P", _t(5), 3, "c", 0, None, "patched", None)], EVENT_SCHEMA
    )
    s = apply_batch(spark, table, p, "b3", mode="mor", allow_patches=True)
    assert not s.fast_path_append  # unknown membership != proven unseen
    assert table.manifest().bloom is None  # and no recurring rebuild
    got = _table_state(spark, table)
    assert got.loc[0, "text"] == "patched" and got.loc[0, "role"] == "user"
    # cow patch batch: rebuild once, persisted with the commit
    p2 = spark.createDataFrame(
        [("P", _t(6), 4, "c", 1, None, None, "newtool")], EVENT_SCHEMA
    )
    apply_batch(spark, table, p2, "b4", mode="cow", allow_patches=True)
    assert table.manifest().bloom is not None
    got = _table_state(spark, table)
    assert got.loc[1, "tool"] == "newtool" and got.loc[1, "text"] == "two"


def test_invalid_patch_rows_do_not_gate_probe(spark, tmp_path):
    """The lean-gate probe carries the same validity predicate as the merge:
    an invalid patch row (null key) must neither disable the fast-append
    path nor widen the patched-column set — it never reaches the merge."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    # commit a row so the table HAS files (a null-key probe bucket would
    # otherwise trivially pass the has_files check)
    apply_batch(
        spark, table,
        spark.createDataFrame(
            [("I", _t(0), 0, "conv-z", 0, "user", "seed", None)], EVENT_SCHEMA
        ),
        "seed", allow_patches=True,
    )
    # valid patches on UNSEEN keys (fast-append eligible) + one invalid
    # patch row with a NULL conv_id that would probe into an arbitrary
    # bucket if not filtered out
    batch = spark.createDataFrame(
        [
            ("P", _t(5), 10, "conv-new", 0, None, "hello", None),
            ("P", _t(6), 11, None, 0, "bad-role", None, "bad-tool"),
        ],
        EVENT_SCHEMA,
    )
    s = apply_batch(spark, table, batch, "probe-gate", allow_patches=True,
                    fail_threshold=0.9)
    assert s.failed == 1
    assert s.fast_path_append, "invalid patch row disabled the fast path"
    got = _table_state(spark, table)
    assert got.loc[got.conv_id == "conv-new", "text"].item() == "hello"


def test_patch_counters_survive_duplicated_subtree(spark, tmp_path):
    """PLAN PIN (lake/merge.py _merge_patch): in the fast_append=False MOR
    plan, `patch_keys` and `batch_ev` both reference the observed batch
    subtree, so the write job evaluates the validation CollectMetrics node
    from two plan instances. Spark must report ONE complete counter set —
    if this assumption ever breaks (doubled or partial counts), the
    events_in/failed invariant below breaks with it."""
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    seed = spark.createDataFrame(
        [
            ("I", _t(0), 0, "conv-a", 0, "user", "orig-a", None),
            ("I", _t(0), 1, "conv-b", 1, "user", "orig-b", None),
        ],
        EVENT_SCHEMA,
    )
    apply_batch(spark, table, seed, "seed", allow_patches=True, mode="mor")
    # patches on COMMITTED keys force the read-modify-write plan
    # (fast_append=False); invalid rows exercise the failed counter
    batch = spark.createDataFrame(
        [
            ("P", _t(5), 10, "conv-a", 0, None, "patched-a", None),
            ("P", _t(6), 11, "conv-b", 1, None, None, "tool-b"),
            ("U", _t(7), 12, "conv-c", 2, "user", "full-c", None),
            ("X", _t(8), 13, "conv-d", 3, None, "bad-op", None),
            ("P", _t(9), 14, None, 0, None, "null-key", None),
        ],
        EVENT_SCHEMA,
    )
    s = apply_batch(spark, table, batch, "dup-subtree", allow_patches=True,
                    mode="mor", fail_threshold=0.9)
    assert not s.fast_path_append
    assert s.events_in == 5
    assert s.failed == 2
    assert s.events_in == s.failed + s.late_dropped + s.dup_dropped + s.applied()
    got = _table_state(spark, table)
    assert got.loc[got.conv_id == "conv-a", "text"].item() == "patched-a"
    assert got.loc[got.conv_id == "conv-b", "tool"].item() == "tool-b"
    assert got.loc[got.conv_id == "conv-c", "text"].item() == "full-c"
