"""Declarative row expectations (Delta CHECK-constraint / DLT analog):
LakeTable.add_constraint + enforcement policies in the ingest path."""

import os

import pytest
from pyspark.sql import Window, functions as F

from etl_spark.cdc import change_feed_df, write_feed, replay_feed
from etl_spark.cdc.apply import BatchFailedError
from etl_spark.lake import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA


def _feed(spark, tmpdir_path, **kw):
    feed = os.path.join(tmpdir_path, "feed")
    kw.setdefault("n_events", 4000)
    kw.setdefault("n_convs", 80)
    kw.setdefault("max_turns", 8)
    kw.setdefault("seed", 21)
    kw.setdefault("n_batches", 2)
    write_feed(change_feed_df(spark, **kw), feed)
    return feed


def _table(tmpdir_path, name="lake"):
    return LakeTable.create(os.path.join(tmpdir_path, name), TRANSCRIPT_SCHEMA, 8)


def _expected_state(spark, feed, drop_expr=None):
    """Independent oracle: LWW over the raw feed, with upsert events
    violating ``drop_expr`` removed BEFORE the reduction (a dropped U
    means the previous valid version survives)."""
    ev = spark.read.parquet(os.path.join(feed, "*", "*.parquet"))
    if drop_expr is not None:
        viol = F.col("op").isin("I", "U") & F.expr(drop_expr).eqNullSafe(F.lit(False))
        ev = ev.filter(~viol)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").desc(), F.col("op_seq").desc()
    )
    rows = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND op <> 'D'")
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    )
    return {tuple(r) for r in rows}


def _state(spark, t):
    return {
        tuple(r)
        for r in t.read(spark).select("conv_id", "turn_idx", "role", "text").collect()
    }


# ------------------------------------------------------------------ API
def test_add_list_drop_roundtrip(spark, tmpdir_path):
    t = _table(tmpdir_path)
    v0 = t.current_version()
    t.add_constraint(spark, "non-negative-turn", "turn_idx >= 0", policy="drop")
    assert t.constraints() == {
        "non-negative-turn": {"expr": "turn_idx >= 0", "policy": "drop"}
    }
    assert t.current_version() == v0 + 1
    t.drop_constraint("non-negative-turn")
    assert t.constraints() == {}
    with pytest.raises(KeyError):
        t.drop_constraint("non-negative-turn")


def test_add_rejects_bad_input(spark, tmpdir_path):
    t = _table(tmpdir_path)
    with pytest.raises(ValueError, match="does not compile"):
        t.add_constraint(spark, "c1", "no_such_column > 0")
    with pytest.raises(ValueError, match="boolean"):
        t.add_constraint(spark, "c2", "turn_idx + 1")
    with pytest.raises(ValueError, match="policy"):
        t.add_constraint(spark, "c3", "turn_idx >= 0", policy="explode")
    with pytest.raises(ValueError, match="invalid constraint name"):
        t.add_constraint(spark, "bad name!", "turn_idx >= 0")


def test_add_validates_existing_rows(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    replay_feed(spark, t, feed)
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint(spark, "no-system", "role <> 'system'")
    # opt-out mirrors Delta's NOT ENFORCED escape hatch
    t.add_constraint(spark, "no-system", "role <> 'system'", validate=False)
    assert "no-system" in t.constraints()
    # a satisfied constraint validates fine against live data
    t.add_constraint(spark, "turn-range", "turn_idx BETWEEN 0 AND 100")


# ---------------------------------------------------------------- policies
def test_drop_policy_filters_counts_and_quarantines(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    qdir = os.path.join(tmpdir_path, "quarantine")
    stats = replay_feed(
        spark, t, feed, fail_threshold=0.9, quarantine_dir=qdir
    )
    # violations counted as failed, budget-visible
    n_failed = sum(s.failed for s in stats)
    ev = spark.read.parquet(os.path.join(feed, "*", "*.parquet"))
    n_system = ev.filter("op IN ('I','U') AND role = 'system'").count()
    assert n_failed == n_system > 0
    # final state equals the filtered-LWW oracle
    assert _state(spark, t) == _expected_state(spark, feed, "role <> 'system'")
    # quarantine carries the constraint reason
    q = spark.read.parquet(os.path.join(qdir, "*"))
    reasons = {r["reason"] for r in q.select("reason").distinct().collect()}
    assert "constraint:no-system" in reasons
    assert q.filter("reason = 'constraint:no-system'").count() == n_system


def test_drop_policy_still_respects_error_budget(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    with pytest.raises(BatchFailedError, match="budget"):
        replay_feed(spark, t, feed, fail_threshold=0.05)


def test_fail_policy_aborts_before_any_write(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="fail")
    v0 = t.current_version()
    with pytest.raises(BatchFailedError, match="constraint"):
        replay_feed(spark, t, feed)
    assert t.current_version() == v0
    assert not t.has_files()
    # a satisfied fail-policy constraint lets the replay through
    t.drop_constraint("no-system")
    t.add_constraint(spark, "turn-range", "turn_idx BETWEEN 0 AND 100", policy="fail")
    replay_feed(spark, t, feed)
    assert _state(spark, t) == _expected_state(spark, feed)


def test_warn_policy_counts_but_applies(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="warn")
    stats = replay_feed(spark, t, feed)
    ev = spark.read.parquet(os.path.join(feed, "*", "*.parquet"))
    n_system = ev.filter("op IN ('I','U') AND role = 'system'").count()
    assert sum(s.constraint_warns.get("no-system", 0) for s in stats) == n_system
    assert sum(s.failed for s in stats) == 0
    # rows still applied — state equals the UNfiltered oracle
    assert _state(spark, t) == _expected_state(spark, feed)


def test_tombstones_and_patches_are_exempt(spark, tmpdir_path):
    # deletes carry NULL payloads; 'text IS NOT NULL' would read FALSE on
    # them without the op-guard — the guard must exempt them
    feed = _feed(spark, tmpdir_path, delete_ratio=0.2)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "text-present", "text IS NOT NULL", policy="fail")
    replay_feed(spark, t, feed)  # must not abort
    assert _state(spark, t) == _expected_state(spark, feed)


def test_cli_constraint_roundtrip(spark, tmpdir_path, capsys):
    from etl_spark.__main__ import main

    t = _table(tmpdir_path)
    rc = main([
        "constraint", "--table", t.path, "add",
        "--name", "no-system", "--expr", "role <> 'system'", "--policy", "drop",
    ])
    assert rc == 0
    rc = main(["constraint", "--table", t.path, "list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "no-system" in out and "drop" in out
    rc = main(["constraint", "--table", t.path, "drop", "--name", "no-system"])
    assert rc == 0
    assert t.constraints() == {}


def test_constraints_enforce_through_streaming(spark, tmpdir_path):
    """run_stream routes every micro-batch through the same apply_batch —
    declared expectations must hold identically on the streaming path."""
    from etl_spark.cdc.stream import run_stream

    feed = _feed(spark, tmpdir_path, n_batches=3)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    qdir = os.path.join(tmpdir_path, "quarantine")
    run_stream(
        spark, t, feed, os.path.join(tmpdir_path, "ckpt"),
        available_now=True, fail_threshold=0.9, quarantine_dir=qdir,
    )
    assert _state(spark, t) == _expected_state(spark, feed, "role <> 'system'")
    q = spark.read.parquet(os.path.join(qdir, "*"))
    ev = spark.read.parquet(os.path.join(feed, "*", "*.parquet"))
    n_system = ev.filter("op IN ('I','U') AND role = 'system'").count()
    assert q.filter("reason = 'constraint:no-system'").count() == n_system


def test_requeue_quarantined_rows_after_fix(spark, tmpdir_path):
    """The dead-letter loop closes: drop-policy violations quarantine,
    the constraint is dropped (cause fixed), requeue re-applies them and
    the table converges to the UNfiltered LWW state. A second requeue of
    the same rows is idempotent."""
    from etl_spark.cdc.apply import requeue_quarantine

    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    qdir = os.path.join(tmpdir_path, "quarantine")
    replay_feed(spark, t, feed, fail_threshold=0.9, quarantine_dir=qdir)
    assert _state(spark, t) == _expected_state(spark, feed, "role <> 'system'")

    t.drop_constraint("no-system")
    s = requeue_quarantine(spark, t, qdir)
    assert s.failed == 0 and s.applied() > 0
    assert _state(spark, t) == _expected_state(spark, feed)  # unfiltered

    s2 = requeue_quarantine(spark, t, qdir)
    assert s2.skipped_idempotent


def test_requeue_still_violating_requarantines(spark, tmpdir_path):
    from etl_spark.cdc.apply import requeue_quarantine

    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    qdir = os.path.join(tmpdir_path, "quarantine")
    replay_feed(spark, t, feed, fail_threshold=0.9, quarantine_dir=qdir)
    state_before = _state(spark, t)
    # cause NOT fixed: rows re-fail; default 10% budget aborts the requeue
    with pytest.raises(BatchFailedError):
        requeue_quarantine(spark, t, qdir)
    # with the budget lifted, they re-quarantine under the requeue id
    s = requeue_quarantine(spark, t, qdir, fail_threshold=1.0)
    assert s.failed > 0 and s.applied() == 0
    assert _state(spark, t) == state_before
    requeue_dirs = [d for d in os.listdir(qdir) if d.startswith("requeue-")]
    assert requeue_dirs


def test_requeue_filters_by_reason(spark, tmpdir_path):
    from etl_spark.cdc.apply import requeue_quarantine

    feed = _feed(spark, tmpdir_path)
    t = _table(tmpdir_path)
    t.add_constraint(spark, "no-system", "role <> 'system'", policy="drop")
    t.add_constraint(spark, "no-tool", "role <> 'tool'", policy="drop")
    qdir = os.path.join(tmpdir_path, "quarantine")
    replay_feed(spark, t, feed, fail_threshold=0.9, quarantine_dir=qdir)
    t.drop_constraint("no-system")
    t.drop_constraint("no-tool")
    # requeue ONLY the no-system rows; the no-tool rows stay out
    requeue_quarantine(spark, t, qdir, reasons=["constraint:no-system"])
    assert _state(spark, t) == _expected_state(spark, feed, "role <> 'tool'")
