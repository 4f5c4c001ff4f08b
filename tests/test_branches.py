"""Branches, tags, and write-audit-publish.

Branch = named snapshot pointer sharing the linear version sequence;
staged commits are invisible to published readers until one atomic
fast-forward of CURRENT (Iceberg WAP analog). Tags pin snapshots against
expire_snapshots for reproducible time travel.
"""

import datetime as dt
import os

import pytest

from etl_spark.cdc import (
    AuditFailedError,
    apply_batch,
    change_feed_df,
    replay_feed,
    wap_replay,
    write_feed,
)
from etl_spark.lake.table import CommitConflictError, LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ev(op, ts_s, seq, conv, turn, text):
    return (op, dt.datetime(2024, 1, 1, 0, 0, ts_s), seq, conv, turn,
            "user", text, None, "f")


def _apply(spark, t, rows, bid):
    return apply_batch(spark, t, spark.createDataFrame(rows, CHANGE_SCHEMA), bid)


def _state(spark, t, **kw):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.read(spark, **kw).collect()
    }


def test_staged_commits_invisible_until_publish(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    _apply(spark, t, [_ev("I", 1, 1, "c1", 0, "base")], "b0")
    v_pub = t.current_version()

    br = t.create_branch("audit")
    _apply(spark, br, [_ev("U", 2, 2, "c1", 0, "staged"),
                       _ev("I", 2, 3, "c2", 0, "new")], "b1")
    _apply(spark, br, [_ev("I", 3, 4, "c3", 5, "more")], "b2")

    # published readers: unchanged version, unchanged rows, staged batch
    # ids absent from the published commit ledger
    assert t.current_version() == v_pub
    assert _state(spark, t) == {("c1", 0): "base"}
    assert not t.is_committed("b1")
    # branch view sees everything staged
    assert _state(spark, br) == {
        ("c1", 0): "staged", ("c2", 0): "new", ("c3", 5): "more"}
    assert br.is_committed("b1") and br.is_committed("b2")

    head = t.publish_branch("audit")
    assert t.current_version() == head.version == v_pub + 2
    assert _state(spark, t) == {
        ("c1", 0): "staged", ("c2", 0): "new", ("c3", 5): "more"}
    # the staged ledgers published with the head manifest
    assert t.is_committed("b1") and t.is_committed("b2")
    assert t.list_branches() == {}


def test_wap_replay_matches_direct_replay(spark, tmpdir_path):
    feed = change_feed_df(spark, n_events=4000, n_convs=80, max_turns=8,
                          seed=7, n_batches=3)
    write_feed(feed, tmpdir_path + "/feed")
    t_wap = LakeTable.create(tmpdir_path + "/wap", TRANSCRIPT_SCHEMA, n_buckets=8)
    t_dir = LakeTable.create(tmpdir_path + "/dir", TRANSCRIPT_SCHEMA, n_buckets=8)
    stats = wap_replay(spark, t_wap, tmpdir_path + "/feed", mode="mor")
    stats_dir = replay_feed(spark, t_dir, tmpdir_path + "/feed", mode="mor")
    assert sum(s.events_in for s in stats) == sum(
        s.events_in for s in stats_dir) > 0
    assert _state(spark, t_wap) == _state(spark, t_dir)
    # ledger published: a re-replay on the published table no-ops
    again = replay_feed(spark, t_wap, tmpdir_path + "/feed", mode="mor")
    assert all(s.skipped_idempotent for s in again)


def test_failed_audit_leaves_published_table_untouched(spark, tmpdir_path):
    write_feed(change_feed_df(spark, n_events=1000, n_convs=30, max_turns=6,
                              seed=3, n_batches=2), tmpdir_path + "/feed")
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    _apply(spark, t, [_ev("I", 1, 1, "keep", 0, "v")], "pre")
    v_pub = t.current_version()

    with pytest.raises(AuditFailedError):
        wap_replay(spark, t, tmpdir_path + "/feed",
                   audit=lambda br: br.read(spark).count() < 0)
    assert t.current_version() == v_pub
    assert _state(spark, t) == {("keep", 0): "v"}
    assert t.list_branches() == {}
    # the dropped branch's staged manifests/files are orphans: collected
    n = t.expire_snapshots(keep_last=10)
    assert n > 0
    assert _state(spark, t) == {("keep", 0): "v"}
    # and a fresh WAP over the same feed succeeds afterwards
    wap_replay(spark, t, tmpdir_path + "/feed")
    assert t.read(spark).count() > 1


def test_publish_requires_fast_forward(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    _apply(spark, t, [_ev("I", 1, 1, "c1", 0, "v")], "b0")
    br = t.create_branch("stale")  # nothing ever staged
    _apply(spark, t, [_ev("I", 2, 2, "c2", 0, "w")], "b1")  # main advances
    # branch head (v1) is now BEHIND the published v2: publish must refuse
    with pytest.raises(CommitConflictError):
        t.publish_branch("stale")
    t.drop_branch("stale")


def test_version_space_is_reserved_by_staged_commits(spark, tmpdir_path):
    """While a branch holds staged snapshots, a main-side commit conflicts
    (shared exclusive-create gate) instead of silently diverging."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    _apply(spark, t, [_ev("I", 1, 1, "c1", 0, "v")], "b0")
    br = t.create_branch("wap")
    _apply(spark, br, [_ev("I", 2, 2, "c2", 0, "s")], "b1")
    with pytest.raises(CommitConflictError):
        _apply(spark, t, [_ev("I", 3, 3, "c3", 0, "m")], "b2")
    t.publish_branch("wap")
    # after publish the same main-side batch applies cleanly
    _apply(spark, t, [_ev("I", 3, 3, "c3", 0, "m")], "b2")
    assert _state(spark, t) == {
        ("c1", 0): "v", ("c2", 0): "s", ("c3", 0): "m"}


def test_tags_pin_snapshots_against_expiry(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    _apply(spark, t, [_ev("I", 1, 1, "c1", 0, "v1")], "b1")
    t.create_tag("release-1")
    v_tag = t.resolve_tag("release-1")
    for i in range(4):
        _apply(spark, t, [_ev("U", 2 + i, 2 + i, "c1", 0, f"v{2 + i}")], f"b{2 + i}")
    t.expire_snapshots(keep_last=1)
    # tagged snapshot still time-travel-readable; untagged old ones gone
    assert _state(spark, t, version=v_tag) == {("c1", 0): "v1"}
    assert v_tag in t.versions()
    with pytest.raises(ValueError):
        t.read(spark, version=v_tag + 1).collect()
    assert t.list_tags() == {"release-1": v_tag}
    # dropping the tag releases the pin
    t.drop_tag("release-1")
    t.expire_snapshots(keep_last=1)
    assert v_tag not in t.versions()


def test_branch_ref_hygiene(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError):
        t.create_branch("bad/name")
    t.create_branch("a")
    with pytest.raises(FileExistsError):
        t.create_branch("a")
    with pytest.raises(ValueError):
        t.branch("missing")
    br = t.branch("a")
    with pytest.raises(ValueError):
        br.expire_snapshots()  # maintenance only on the published view
    with pytest.raises(ValueError):
        br.create_tag("x")
    t.drop_branch("a")
    with pytest.raises(ValueError):
        t.drop_branch("a")


def test_wap_resumes_after_crash_mid_stage(spark, tmpdir_path):
    """A WAP attempt killed mid-replay resumes on the SAME branch (staged
    idempotence ledger) and publishes exactly-once."""
    write_feed(change_feed_df(spark, n_events=2000, n_convs=40, max_turns=6,
                              seed=11, n_batches=4), tmpdir_path + "/feed")
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    br = t.create_branch("wap-fixed")
    # "crash": only the first segment got applied before the driver died
    segs = sorted(os.listdir(tmpdir_path + "/feed"))
    first = [f for f in sorted(
        os.listdir(os.path.join(tmpdir_path + "/feed", segs[0])))
        if f.endswith(".parquet")]
    df = spark.read.parquet(os.path.join(tmpdir_path + "/feed", segs[0]))
    from etl_spark.cdc.apply import batch_fingerprint
    bid = batch_fingerprint([os.path.join(segs[0], f) for f in first])
    apply_batch(spark, br, df, bid, segments=[segs[0]],
                input_files=[f"{segs[0]}/{f}" for f in first])
    # retry with the same branch name: segment 0 no-ops, rest applies
    stats = wap_replay(spark, t, tmpdir_path + "/feed",
                       branch_name="wap-fixed")
    assert stats[0].skipped_idempotent
    t2 = LakeTable.create(tmpdir_path + "/oracle", TRANSCRIPT_SCHEMA, n_buckets=4)
    replay_feed(spark, t2, tmpdir_path + "/feed")
    assert _state(spark, t) == _state(spark, t2)


def test_version_as_of_timestamp_travel(spark, tmp_path):
    import time as _time

    import datetime as _dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA

    schema = (
        "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
        "role string, text string, tool string"
    )
    t = LakeTable.create(str(tmp_path / "lk"), TRANSCRIPT_SCHEMA, n_buckets=4)
    marks = []
    for i in range(3):
        rows = [("I", _dt.datetime(2024, 1, 1), 10 + i, "c", i, "user", f"v{i}", None)]
        apply_batch(spark, t, spark.createDataFrame(rows, schema), f"b{i}")
        marks.append((_time.time(), t.current_version()))
        _time.sleep(0.05)
    # as-of each commit instant resolves to that commit's version
    for when, ver in marks:
        assert t.version_as_of(when + 0.01) == ver
    # now → newest; before the first snapshot → error
    assert t.version_as_of(_time.time()) == marks[-1][1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.version_as_of(marks[0][0] - 3600)
    # the resolved version is readable (time-travel read path)
    v1 = t.version_as_of(marks[1][0] + 0.01)
    assert t.read(spark, version=v1).count() == 2
