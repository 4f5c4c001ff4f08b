"""Multi-table transactions (lake/txn.py): WAP-branch staging per table,
one atomic catalog pin swap as the cross-table commit point, WAL-driven
crash recovery (roll forward / roll back)."""

import os

import pytest

from etl_spark.cdc import change_feed_df, write_feed, replay_feed
from etl_spark.cdc.apply import apply_batch
from etl_spark.lake import LakeCatalog, TxnAbortedError
from etl_spark.lake.txn import TxnStateError
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _batch(spark, cid_prefix, n=4):
    import datetime as dt

    rows = [
        ("I", dt.datetime.fromisoformat("2024-01-01T00:00:01"), i,
         f"{cid_prefix}-{i:03d}", 0, "user", f"t-{cid_prefix}-{i}", None, "f")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


@pytest.fixture()
def cat(tmpdir_path):
    c = LakeCatalog(os.path.join(tmpdir_path, "cat"))
    c.create_table("raw.a", TRANSCRIPT_SCHEMA, n_buckets=4)
    c.create_table("raw.b", TRANSCRIPT_SCHEMA, n_buckets=4)
    return c


def _counts(spark, cat):
    return (
        cat.read_committed(spark, "raw.a").count(),
        cat.read_committed(spark, "raw.b").count(),
    )


def test_commit_is_atomic_for_catalog_readers(spark, cat):
    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    apply_batch(spark, txn.table("raw.b"), _batch(spark, "b", n=6), "b1")
    # staged work is invisible everywhere before commit
    assert _counts(spark, cat) == (0, 0)
    assert cat.load_table("raw.a").read(spark).count() == 0
    staged = txn.commit()
    assert set(staged) == {"raw.a", "raw.b"}
    assert _counts(spark, cat) == (4, 6)
    assert cat.pins() == staged
    assert cat.committed_snapshot() == staged
    # transaction handles are single-shot
    with pytest.raises(TxnStateError):
        txn.table("raw.a")
    with pytest.raises(TxnStateError):
        txn.commit()


def test_abort_leaves_tables_untouched(spark, cat):
    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    txn.abort()
    assert _counts(spark, cat) == (0, 0)
    assert cat.load_table("raw.a").list_branches() == {}
    with pytest.raises(TxnStateError):
        txn.commit()


def test_crash_before_pin_swap_rolls_forward(spark, cat):
    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    apply_batch(spark, txn.table("raw.b"), _batch(spark, "b"), "b1")
    staged = txn.commit(_crash_before_pin_swap=True)
    # publishes happened, but catalog readers still see the BASE pins —
    # the base-pin step closed the unpinned-member fallback window
    assert _counts(spark, cat) == (0, 0)
    out = cat.recover_txns()
    assert out == {txn.txn_id: "rolled_forward"}
    assert _counts(spark, cat) == (4, 4)
    assert cat.pins() == staged
    # recovery is idempotent
    assert cat.recover_txns() == {}


def test_foreign_commit_conflicts_at_stage_time(spark, cat):
    """Branch snapshots share the table's version space, so a foreign
    commit to a member table surfaces as an optimistic-concurrency
    CommitConflictError the moment either side writes next — the txn
    never silently diverges. abort() then cleans up."""
    from etl_spark.lake import CommitConflictError

    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    view_b = txn.table("raw.b")  # branch created at v0
    foreign = cat.load_table("raw.b")
    apply_batch(spark, foreign, _batch(spark, "foreign", n=2), "fb1")
    with pytest.raises(CommitConflictError):
        apply_batch(spark, view_b, _batch(spark, "b"), "b1")
    txn.abort()
    assert cat.load_table("raw.a").read(spark).count() == 0
    assert cat.load_table("raw.b").read(spark).count() == 2
    assert cat.load_table("raw.b").list_branches() == {}


def test_publish_failure_rolls_back_published_members(spark, cat, monkeypatch):
    """If a publish becomes impossible mid-commit (the expire/repair
    scenario — normal writers conflict at stage time instead), every
    already-published member is content-rolled-back and the txn aborts;
    pins never move."""
    from etl_spark.lake import CommitConflictError
    from etl_spark.lake.table import LakeTable

    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    apply_batch(spark, txn.table("raw.b"), _batch(spark, "b"), "b1")
    orig = LakeTable.publish_branch

    def failing(self, name):
        if self.path.endswith("raw/b") or self.path.endswith("raw\\b"):
            raise CommitConflictError("simulated repair moved CURRENT")
        return orig(self, name)

    monkeypatch.setattr(LakeTable, "publish_branch", failing)
    with pytest.raises(TxnAbortedError, match="rolled back"):
        txn.commit()
    monkeypatch.undo()
    # raw.a was published first and must be content-rolled-back
    assert cat.load_table("raw.a").read(spark).count() == 0
    assert cat.read_committed(spark, "raw.a").count() == 0
    assert cat.read_committed(spark, "raw.b").count() == 0
    # pins (if any were written) stay at base — nothing partial visible
    for v in cat.pins().values():
        assert isinstance(v, int)


def test_txn_composes_with_replay(spark, cat, tmpdir_path):
    """The branch views run the full engine path (replay_feed) unchanged."""
    feed = os.path.join(tmpdir_path, "feed")
    write_feed(
        change_feed_df(spark, n_events=2000, n_convs=40, max_turns=6,
                       seed=13, n_batches=2),
        feed,
    )
    txn = cat.begin()
    replay_feed(spark, txn.table("raw.a"), feed)
    assert cat.read_committed(spark, "raw.a").count() == 0
    txn.commit()
    n = cat.read_committed(spark, "raw.a").count()
    assert n > 0
    # a second transaction moves the pin forward consistently
    txn2 = cat.begin()
    apply_batch(spark, txn2.table("raw.a"),
                _batch(spark, "zz", n=3), "extra")
    txn2.commit()
    assert cat.read_committed(spark, "raw.a").count() == n + 3


def test_cli_catalog_ops(spark, cat, capsys):
    from etl_spark.__main__ import main

    assert main(["catalog", "--root", cat.root, "list"]) == 0
    out = capsys.readouterr().out
    assert "raw.a" in out and "raw.b" in out
    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    txn.commit(_crash_before_pin_swap=True)
    assert main(["catalog", "--root", cat.root, "recover"]) == 0
    out = capsys.readouterr().out
    assert "rolled_forward" in out
    assert main(["catalog", "--root", cat.root, "pins"]) == 0
    assert "raw.a" in capsys.readouterr().out


def test_aborted_commit_removes_base_pins_it_added(spark, cat, monkeypatch):
    """A commit that pinned never-pinned members at base and then rolled
    back must REMOVE those pins: tables never transactionally written go
    back to 'read_committed follows current head', so later direct
    (non-txn) writes stay visible."""
    from etl_spark.lake import CommitConflictError
    from etl_spark.lake.table import LakeTable

    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    apply_batch(spark, txn.table("raw.b"), _batch(spark, "b"), "b1")
    orig = LakeTable.publish_branch

    def failing(self, name):
        if self.path.endswith("raw/b") or self.path.endswith("raw\\b"):
            raise CommitConflictError("simulated repair moved CURRENT")
        return orig(self, name)

    monkeypatch.setattr(LakeTable, "publish_branch", failing)
    with pytest.raises(TxnAbortedError):
        txn.commit()
    monkeypatch.undo()
    assert cat.pins() == {}  # base pins removed on rollback
    # direct (non-transactional) write is visible to catalog readers again
    apply_batch(spark, cat.load_table("raw.a"), _batch(spark, "d", n=3), "b2")
    assert cat.read_committed(spark, "raw.a").count() == 3


def test_crash_while_open_is_recovered(spark, cat):
    """A crash while the txn is OPEN (staged but never committed) leaves
    an 'open' WAL; recover_txns drops the orphaned branches."""
    from etl_spark.lake.txn import recover_txns

    txn = cat.begin()
    apply_batch(spark, txn.table("raw.a"), _batch(spark, "a"), "b1")
    # simulate crash: the txn object is simply abandoned (no abort/commit)
    branch = txn._branch
    assert branch in cat.load_table("raw.a").list_branches()
    out = recover_txns(cat)
    assert out == {txn.txn_id: "dropped_open"}
    assert branch not in cat.load_table("raw.a").list_branches()
    assert cat.read_committed(spark, "raw.a").count() == 0
    # idempotent: a second recovery pass does nothing
    assert recover_txns(cat) == {}
