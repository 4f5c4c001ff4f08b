"""Streaming near-dup admission gate (run_stream(neardup_index_path=...)):
cross-key content duplicates are dropped before the merge, same-key edits
pass, the index persists across micro-batches, and redelivery is
idempotent (deterministic segment name + self-excluding probe)."""

from __future__ import annotations

import datetime as dt
import os

from etl_spark.cdc.stream import run_stream
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA

LOREM = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
OTHER = (
    "one two three four five six seven eight nine ten eleven "
    "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
)


def _row(op, seq, cid, text):
    return (
        op, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=seq), seq, cid, 0, "user", text,
        None, "f",
    )


def _write_seg(spark, feed, name, rows):
    spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.parquet(
        os.path.join(feed, name)
    )


def test_stream_neardup_gate(spark, tmpdir_path):
    feed = os.path.join(tmpdir_path, "feed")
    # seg 1: two distinct documents
    _write_seg(spark, feed, "seg-00000", [
        _row("I", 1, "conv-A", LOREM),
        _row("I", 2, "conv-B", OTHER),
    ])
    # seg 2: C near-dups A's admitted text (cross-key -> dropped);
    # D is fresh (admitted); A edits its own text (same key -> passes)
    _write_seg(spark, feed, "seg-00001", [
        _row("I", 3, "conv-C", LOREM + " extra"),
        _row("I", 4, "conv-D", "completely different words about spark engines"),
        _row("U", 5, "conv-A", LOREM + " revised tail"),
    ])
    t = LakeTable.create(
        os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    run_stream(
        spark, t, feed, os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1, available_now=True, mode="mor",
        neardup_index_path=os.path.join(tmpdir_path, "ndi"),
    )
    state = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert "conv-C" not in state            # cross-key near-dup dropped
    assert state["conv-A"].endswith("revised tail")  # own edit passed
    assert "conv-B" in state and "conv-D" in state
    # the gate's index is batch-id-segmented: re-draining the same feed
    # with a fresh checkpoint must not change the table (merge no-ops via
    # the ledger, the gate no-ops via its deterministic segments)
    run_stream(
        spark, t, feed, os.path.join(tmpdir_path, "ckpt2"),
        max_files_per_trigger=1, available_now=True, mode="mor",
        neardup_index_path=os.path.join(tmpdir_path, "ndi"),
    )
    state2 = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert state2 == state


def test_stream_neardup_gate_in_batch(spark, tmpdir_path):
    """Two different keys with near-identical text in ONE micro-batch:
    exactly one survives (the smaller key hash), deterministically."""
    feed = os.path.join(tmpdir_path, "feed")
    _write_seg(spark, feed, "seg-00000", [
        _row("I", 1, "conv-X", LOREM),
        _row("I", 2, "conv-Y", LOREM + " tail"),
    ])
    t = LakeTable.create(
        os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    run_stream(
        spark, t, feed, os.path.join(tmpdir_path, "ckpt"),
        available_now=True, mode="mor",
        neardup_index_path=os.path.join(tmpdir_path, "ndi"),
    )
    rows = t.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["conv_id"] in ("conv-X", "conv-Y")


def test_exact_flood_is_deduped_linearly(spark, tmpdir_path):
    """A flood of byte-identical documents across many keys must collapse
    to ONE survivor via the exact-hash layer (linear grouping) — the LSH
    band join alone would be quadratic in the flood size (its buckets are
    capped, so it contributes nothing here)."""
    feed = os.path.join(tmpdir_path, "feed")
    _write_seg(spark, feed, "seg-00000", [
        _row("I", i, f"conv-{i:04d}", LOREM) for i in range(1, 301)
    ])
    t = LakeTable.create(
        os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    run_stream(
        spark, t, feed, os.path.join(tmpdir_path, "ckpt"),
        available_now=True, mode="mor",
        neardup_index_path=os.path.join(tmpdir_path, "ndi"),
    )
    assert t.read(spark).count() == 1


def test_all_duplicate_trigger_does_not_crash_stream(spark, tmpdir_path):
    """A trigger that is 100% cross-key duplicates of admitted content is
    the gate's design case, and the zero-row pre-commit guard must NOT
    fire for it (the round-4 review's redelivery-loop scenario): the
    trigger applies as an empty batch, its files ledger, and the drained
    state carries only the originals."""
    feed = os.path.join(tmpdir_path, "feed")
    _write_seg(spark, feed, "batch=00000", [
        _row("I", 1, "conv-a", LOREM),
        _row("I", 2, "conv-b", OTHER),
    ])
    table = LakeTable.create(
        os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=2
    )
    ck = os.path.join(tmpdir_path, "ck")
    idx = os.path.join(tmpdir_path, "nd")
    run_stream(spark, table, feed, ck, mode="mor", neardup_index_path=idx)
    assert table.read(spark).count() == 2
    # second segment: ONLY copies of already-admitted content, new keys
    _write_seg(spark, feed, "batch=00001", [
        _row("I", 10, "conv-c", LOREM),
        _row("I", 11, "conv-d", OTHER),
    ])
    run_stream(spark, table, feed, ck, mode="mor", neardup_index_path=idx)
    got = {r["conv_id"] for r in table.read(spark).collect()}
    assert got == {"conv-a", "conv-b"}
    # files of the all-dup segment are ledgered: a re-drain no-ops
    run_stream(
        spark, table, feed, os.path.join(tmpdir_path, "ck2"), mode="mor",
        neardup_index_path=idx,
    )
    assert {r["conv_id"] for r in table.read(spark).collect()} == got
