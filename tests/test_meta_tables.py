"""Iceberg-style metadata tables (lake/meta.py): files, snapshots,
history, partitions, refs — driver-side relations over the manifests."""

import os

import pytest

from etl_spark.cdc import change_feed_df, write_feed, replay_feed
from etl_spark.lake import LakeTable
from etl_spark.lake.meta import (
    files_df,
    history_df,
    metadata_df,
    partitions_df,
    refs_df,
    snapshots_df,
)
from etl_spark.schema import TRANSCRIPT_SCHEMA


@pytest.fixture()
def table(spark, tmpdir_path):
    feed = os.path.join(tmpdir_path, "feed")
    write_feed(
        change_feed_df(
            spark, n_events=4000, n_convs=80, max_turns=8, seed=11, n_batches=3
        ),
        feed,
    )
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, 8)
    replay_feed(spark, t, feed)
    return t


def test_files_df_matches_manifest(spark, table):
    m = table.manifest()
    n_entries = sum(len(fl) for fl in m.files.values())
    rows = files_df(table, spark, None).collect()
    assert len(rows) == n_entries
    by_path = {r["path"]: r for r in rows}
    for b, fl in m.files.items():
        for fe in fl:
            r = by_path[fe["path"]]
            assert r["bucket"] == int(b)
            assert r["rows"] == fe["rows"]
            assert r["size_bytes"] and r["size_bytes"] > 0
            assert 1 <= r["added_version"] <= table.current_version()
    # total rows agrees with the actual table
    assert sum(r["rows"] for r in rows) >= table.read(spark).count()


def test_files_df_added_version_is_first_reference(spark, table):
    # files written by the FIRST commit must carry added_version == 1
    v1_paths = {
        fe["path"] for fl in table.manifest(1).files.values() for fe in fl
    }
    cur = {r["path"]: r["added_version"] for r in files_df(table, spark).collect()}
    for p, av in cur.items():
        if p in v1_paths:
            assert av == 1


def test_snapshots_df_covers_retained_versions(spark, table):
    snaps = {r["version"]: r for r in snapshots_df(table, spark).collect()}
    assert sorted(snaps) == table.versions()
    # every replay commit names its batch and merge mode
    commit_versions = {
        c["version"]: bid for bid, c in table.commit_log().items()
    }
    for v, r in snaps.items():
        if v in commit_versions:
            assert r["batch_id"] == commit_versions[v]
            assert r["operation"] in ("cow", "mor")
        assert r["parent"] is None or r["parent"] < v
        assert r["committed_at"].endswith("Z")
        assert r["n_buckets"] == 8
    # rows accumulate: final snapshot holds the full state
    assert snaps[table.current_version()]["total_rows"] >= table.read(spark).count()


def test_history_marks_rollback_orphans(spark, table):
    versions = table.versions()
    v_mid = versions[-2]
    v_tip = table.current_version()
    table.rollback(v_mid)
    hist = {r["version"]: r for r in history_df(table, spark).collect()}
    # the undone tip is retained (time-travel) but not a current ancestor
    assert hist[v_tip]["is_current_ancestor"] is False
    assert hist[table.current_version()]["is_current_ancestor"] is True
    assert hist[v_mid]["is_current_ancestor"] is True


def test_partitions_df_rolls_up_files(spark, table):
    parts = partitions_df(table, spark).collect()
    files = files_df(table, spark).collect()
    assert {r["bucket"] for r in parts} == {r["bucket"] for r in files}
    total = sum(r["n_rows"] for r in parts)
    assert total == sum(r["rows"] for r in files)
    for r in parts:
        assert r["size_bytes"] > 0
        assert r["n_files"] >= 1
        assert r["last_updated_version"] <= table.current_version()


def test_refs_df_lists_branches_and_tags(spark, table):
    table.create_tag("audit-1")
    table.create_branch("wip")
    rows = {(r["name"], r["type"]): r["version"] for r in refs_df(table, spark).collect()}
    assert rows[("main", "current")] == table.current_version()
    assert rows[("audit-1", "tag")] == table.current_version()
    assert rows[("wip", "branch")] == table.current_version()


def test_metadata_df_dispatch(spark, table):
    assert metadata_df(table, spark, "files").count() > 0
    assert metadata_df(table, spark, "files", version=1).count() > 0
    with pytest.raises(ValueError, match="unknown metadata table"):
        metadata_df(table, spark, "nope")
    with pytest.raises(ValueError, match="not snapshot-scoped"):
        metadata_df(table, spark, "history", version=1)


def test_cli_inspect(spark, table, capsys):
    from etl_spark.__main__ import main

    rc = main(["inspect", "--table", table.path, "snapshots"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "version" in out and "operation" in out


def test_constraints_metadata_table(spark, table):
    from etl_spark.lake.meta import constraints_df

    assert constraints_df(table, spark).count() == 0
    table.add_constraint(spark, "sane-turn", "turn_idx >= 0", policy="warn")
    rows = metadata_df(table, spark, "constraints").collect()
    assert [(r["name"], r["expr"], r["policy"]) for r in rows] == [
        ("sane-turn", "turn_idx >= 0", "warn")
    ]
