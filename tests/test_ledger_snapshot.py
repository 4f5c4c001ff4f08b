"""Commit-ledger snapshotting (lake/table.py, Manifest.ledger): the
idempotence ledger must not grow the per-commit manifest rewrite without
bound under 10^10-event uptime. Once the inline commits/segments tail
exceeds ``ledger_inline_max``, it spills into one immutable cumulative
ledger file (Iceberg manifest-list split analog) and the inline maps
restart empty — while exactly-once membership, segment reuse refusal,
metrics, rollback, OCC rebase, and snapshot expiry all keep seeing the
FULL history through the tail ∪ snapshot merge."""

from __future__ import annotations

import json
import os
import time

import pytest

from etl_spark.cdc.apply import apply_batch, replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.lake.table import LakeTable, MANIFEST_DIR
from etl_spark.schema import TRANSCRIPT_SCHEMA


def _mk(tmp_path, inline_max: int, n_buckets: int = 4) -> LakeTable:
    t = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA,
                         n_buckets=n_buckets)
    t.ledger_inline_max = inline_max
    return t


def _commit_one(t: LakeTable, i: int) -> None:
    t.commit_version(
        {}, [], f"batch-{i:06d}",
        {"events_in": 10, "failed": 0, "late_dropped": 0, "mode": "mor"},
        segments={f"seg-{i:06d}": f"fp-{i:06d}"},
        expected_version=t.current_version(),
    )


def test_soak_manifest_size_and_commit_wall_stay_flat(tmp_path):
    """5k metadata commits: the per-commit manifest JSON and commit wall
    must be flat (bounded by the tail), not O(history). This is the
    10^10-uptime structure check — driver-side only, no Spark."""
    t = _mk(tmp_path, inline_max=256)
    sizes, walls = [], []
    mpath = os.path.join(t.path, MANIFEST_DIR)
    for i in range(5000):
        t0 = time.perf_counter()
        _commit_one(t, i)
        walls.append(time.perf_counter() - t0)
        if i % 500 == 499:
            v = t.current_version()
            sizes.append(os.path.getsize(os.path.join(mpath, f"v{v:08d}.json")))
    # manifest size bounded by the tail: last sample within 2x of first
    # (both hold ≤ inline_max entries), never the ~20x of linear growth
    assert sizes[-1] < sizes[0] * 2, sizes
    assert max(sizes) < 200_000, sizes  # a few hundred KB at most
    # commit wall flat: last-500 median within 3x of first-500 median
    med = lambda xs: sorted(xs)[len(xs) // 2]
    assert med(walls[-500:]) < med(walls[:500]) * 3 + 0.002, (
        med(walls[:500]), med(walls[-500:])
    )
    # full history still visible through the merge
    m = t.manifest()
    assert m.ledger is not None and m.ledger["commits"] >= 4000
    assert t.is_committed("batch-000000") and t.is_committed("batch-004999")
    segs = t.committed_segments()
    assert len(segs) == 5000 and segs["seg-000000"] == "fp-000000"
    # idempotent re-commit of a SPILLED batch short-circuits (no new version)
    v = t.current_version()
    _commit_one(t, 0)
    assert t.current_version() == v


def test_replay_correct_across_spills(spark, tmp_path):
    """The real apply path with a tiny spill threshold: every batch spills
    mid-replay, yet state equals an unspilled replay and re-replay is
    fully idempotent."""
    feed = str(tmp_path / "feed")
    write_feed(
        change_feed_df(spark, n_events=8000, n_convs=120, max_turns=8,
                       seed=61, delete_ratio=0.1, n_batches=8),
        feed,
    )
    t = _mk(tmp_path, inline_max=2, n_buckets=4)
    replay_feed(spark, t, feed, mode="mor")
    assert t.manifest().ledger is not None  # spills actually happened
    ref = LakeTable.create(str(tmp_path / "ref"), TRANSCRIPT_SCHEMA, n_buckets=4)
    replay_feed(spark, ref, feed, mode="mor")

    def _state(x):
        return {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
            for r in x.read(spark).collect()
        }

    assert _state(t) == _state(ref)
    # re-replay: every batch recognized as applied through the spilled ledger
    stats = replay_feed(spark, t, feed, mode="mor")
    assert all(s.skipped_idempotent for s in stats)
    # commit metrics survive the spill: one metrics row per applied batch
    assert t.metrics_df(spark).count() == 8


def test_segment_reuse_refused_after_spill(spark, tmp_path):
    feed_a = str(tmp_path / "fa")
    feed_b = str(tmp_path / "fb")
    write_feed(change_feed_df(spark, n_events=2000, n_convs=40, max_turns=6,
                              seed=71, n_batches=4), feed_a)
    write_feed(change_feed_df(spark, n_events=2000, n_convs=40, max_turns=6,
                              seed=72, n_batches=4), feed_b)  # same seg names
    t = _mk(tmp_path, inline_max=1, n_buckets=4)
    replay_feed(spark, t, feed_a, mode="mor")
    assert t.manifest().ledger is not None
    from etl_spark.cdc.apply import SegmentReuseError

    with pytest.raises(SegmentReuseError):
        replay_feed(spark, t, feed_b, mode="mor")


def test_rollback_reverts_spilled_ledger_with_content(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(change_feed_df(spark, n_events=3000, n_convs=50, max_turns=6,
                              seed=81, n_batches=6), feed)
    t = _mk(tmp_path, inline_max=1, n_buckets=4)
    replay_feed(spark, t, feed, mode="mor")
    n_after = t.read(spark).count()
    mid_v = t.versions()[3]
    t.rollback(mid_v)
    # the ledger reverted with the content: later segments are unseen again
    assert len(t.committed_segments()) < 6
    stats = replay_feed(spark, t, feed, mode="mor")
    assert any(not s.skipped_idempotent for s in stats)
    assert t.read(spark).count() == n_after


def test_occ_rebase_across_spill_boundary(tmp_path):
    """Writer A reads v_base; writer B commits enough batches to trigger a
    spill; A's rebase commit must still apply exactly once and see B's
    spilled batches as committed."""
    t = _mk(tmp_path, inline_max=4)
    _commit_one(t, 0)
    base_v = t.current_version()
    # B advances past the spill threshold
    for i in range(1, 10):
        _commit_one(t, i)
    assert t.manifest().ledger is not None
    # A (stale base) rebases a counters-only append commit
    t.commit_version(
        {}, [], "writer-a-batch", {"events_in": 5, "mode": "mor"},
        segments={"seg-a": "fp-a"}, append_files=True,
        expected_version=base_v, on_conflict="rebase",
    )
    fc = t.full_commits()
    assert "writer-a-batch" in fc
    assert all(f"batch-{i:06d}" in fc for i in range(10))
    # and an idempotent redelivery of A short-circuits
    v = t.current_version()
    t.commit_version(
        {}, [], "writer-a-batch", {"events_in": 5}, segments={"seg-a": "fp-a"},
        expected_version=t.current_version(), on_conflict="rebase",
    )
    assert t.current_version() == v


def test_expire_snapshots_keeps_referenced_ledger_files(tmp_path):
    t = _mk(tmp_path, inline_max=3)
    for i in range(20):
        _commit_one(t, i)
    mdir = os.path.join(t.path, MANIFEST_DIR)
    ledgers_before = [f for f in os.listdir(mdir) if f.startswith("ledger-")]
    assert len(ledgers_before) > 1  # several spill generations
    t.expire_snapshots(keep_last=2, orphan_grace_sec=0)
    ledgers_after = [f for f in os.listdir(mdir) if f.startswith("ledger-")]
    # only ledgers referenced by retained manifests survive
    live = {
        os.path.basename(t.manifest(v).ledger["path"])
        for v in t.versions()
        if t.manifest(v).ledger
    }
    assert set(ledgers_after) == live and live
    # membership across the whole history still intact after expiry
    assert t.is_committed("batch-000000") and t.is_committed("batch-000019")
    assert len(t.committed_segments()) == 20


def test_ledger_file_is_valid_cumulative_json(tmp_path):
    t = _mk(tmp_path, inline_max=5)
    for i in range(12):
        _commit_one(t, i)
    m = t.manifest()
    with open(os.path.join(t.path, m.ledger["path"])) as f:
        led = json.load(f)
    # cumulative: every spilled batch present exactly once, with its record
    assert set(led["commits"]) | set(m.commits) == {
        f"batch-{i:06d}" for i in range(12)
    }
    assert all(c.get("events_in") == 10 for c in led["commits"].values())
    assert set(led["segments"]) | set(m.segments) == {
        f"seg-{i:06d}" for i in range(12)
    }
