"""Optimistic-concurrency commit rebase/retry (Iceberg commit-retry analog).

Two writers race one table. The loser of the manifest CAS must NOT fail the
job when its edit is still valid on the winner's snapshot:

  * MOR delta appends commute (read-time LWW makes overlapping-key appends
    order-independent) — the losing commit REBASES: same files, new parent.
  * bucket REPLACEMENTS (COW merge, maintenance rewrites) rebase only when
    the winner touched disjoint buckets; otherwise the loser's reads were
    stale and ``merge_into``'s outer loop RECOMPUTES the whole merge.
  * the same batch_id landing from two writers applies exactly once.

The interleave is deterministic: a LakeTable subclass fires the rival
writer's commit from inside ``write_bucket_files`` — after the loser
computed its plan against the old snapshot, before its commit.

Reference parity: the reference delegates concurrent-writer safety to
BigQuery's job-level atomicity (/root/reference/storage/rowwriter.go:83-171
commits one file per task); a standalone lake engine must supply the
retry protocol itself.
"""

import datetime as dt

import pytest

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import CommitConflictError, LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


class _InterleavedTable(LakeTable):
    """Fires a rival apply_batch between this writer's file write and its
    commit — the exact window where a real concurrent writer wins the CAS."""

    def __init__(self, path, spark, rival_batch, rival_id, rival_mode="mor"):
        super().__init__(path)
        self._spark = spark
        self._rival = (rival_batch, rival_id, rival_mode)
        self.fired = 0

    def write_bucket_files(self, *a, **k):
        out = super().write_bucket_files(*a, **k)
        if self.fired == 0 and self._rival[0] is not None:
            self.fired += 1
            batch, rid, mode = self._rival
            apply_batch(self._spark, LakeTable(self.path), batch, rid, mode=mode)
        return out


def test_mor_append_rebases_without_recompute(spark, tmpdir_path):
    path = tmpdir_path + "/t"
    LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    rival = _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c-rival", 0, "user", "their row", None, "fB")])
    t = _InterleavedTable(path, spark, rival, "rivalB")
    ours = _mk(spark, [
        ("I", _ts("2024-01-01T00:00:02"), 2, "c-ours", 0, "user", "our row", None, "fA")])
    s = apply_batch(spark, t, ours, "oursA", mode="mor")
    assert t.fired == 1 and s.inserted == 1

    clean = LakeTable(path)
    m = clean.manifest()
    assert "rivalB" in m.commits and "oursA" in m.commits
    rows = {r["conv_id"]: r["text"] for r in clean.read(spark).collect()}
    assert rows == {"c-rival": "their row", "c-ours": "our row"}
    # rebase, not recompute: exactly one version per commit (create + 2)
    assert m.version == 2


def test_mor_append_rebase_overlapping_keys_lww_holds(spark, tmpdir_path):
    """Appends to the SAME key from both writers: read-time LWW must
    resolve to the later ts regardless of commit order."""
    path = tmpdir_path + "/t"
    LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    rival = _mk(spark, [
        ("U", _ts("2024-01-01T09:00:00"), 7, "c1", 0, "user", "newer-rival", None, "fB")])
    t = _InterleavedTable(path, spark, rival, "rivalB")
    ours = _mk(spark, [
        ("I", _ts("2024-01-01T08:00:00"), 3, "c1", 0, "user", "older-ours", None, "fA")])
    apply_batch(spark, t, ours, "oursA", mode="mor")
    rows = LakeTable(path).read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "newer-rival"


def test_cow_same_bucket_conflict_recomputes(spark, tmpdir_path):
    """COW rewrites the touched bucket; a rival commit into that bucket
    invalidates the rewrite → merge_into recomputes and the final state
    carries BOTH writers' rows."""
    path = tmpdir_path + "/t"
    t0 = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=1)  # force same bucket
    apply_batch(spark, t0, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:00"), 1, "seed", 0, "user", "seed", None, "f0")]),
        "seed")
    rival = _mk(spark, [
        ("I", _ts("2024-01-01T00:01:00"), 2, "c-rival", 0, "user", "their row", None, "fB")])
    t = _InterleavedTable(path, spark, rival, "rivalB", rival_mode="cow")
    ours = _mk(spark, [
        ("I", _ts("2024-01-01T00:02:00"), 3, "c-ours", 0, "user", "our row", None, "fA")])
    s = apply_batch(spark, t, ours, "oursA", mode="cow")
    assert s.inserted == 1
    clean = LakeTable(path)
    rows = {r["conv_id"]: r["text"] for r in clean.read(spark).collect()}
    assert rows == {"seed": "seed", "c-rival": "their row", "c-ours": "our row"}
    assert {"seed", "rivalB", "oursA"} <= set(clean.manifest().commits)


def test_replace_rebases_over_disjoint_commit(spark, tmpdir_path):
    """A stale bucket REPLACEMENT (maintenance shape) commits fine when the
    intervening commit only advanced the watermark / other buckets."""
    path = tmpdir_path + "/t"
    t = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "v1", None, "f1")]), "b1")
    m = t.manifest()
    touched = [int(b) for b, fl in m.files.items() if fl]
    replay_files = {b: list(m.files[str(b)]) for b in touched}  # no-op rewrite
    # rival: watermark-only commit (touches no bucket)
    t.commit_version({}, [], "wm-only", None,
                     new_watermark_us=1, expected_version=m.version)
    with pytest.raises(CommitConflictError):
        t.commit_version(replay_files, touched, None, None,
                         expected_version=m.version)  # on_conflict="error"
    nm = t.commit_version(replay_files, touched, None, None,
                          expected_version=m.version, key_neutral=True,
                          on_conflict="rebase")
    assert nm.version == m.version + 2
    assert LakeTable(path).read(spark).count() == 1


def test_replace_same_bucket_not_rebasable(spark, tmpdir_path):
    path = tmpdir_path + "/t"
    t = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=1)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "v1", None, "f1")]), "b1")
    m = t.manifest()
    replay_files = {0: list(m.files["0"])}
    # rival WRITES INTO bucket 0 → our replacement was computed stale
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "v2", None, "f2")]),
        "b2", mode="mor")
    with pytest.raises(CommitConflictError, match="recompute"):
        t.commit_version(replay_files, [0], None, None,
                         expected_version=m.version, key_neutral=True,
                         on_conflict="rebase")


def test_rebucket_conflict_never_rebases(spark, tmpdir_path):
    path = tmpdir_path + "/t"
    t = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "v1", None, "f1")]), "b1")
    m = t.manifest()
    t.rebucket(spark, 4)
    with pytest.raises(CommitConflictError, match="bucket-layout"):
        t.commit_version({}, [], "late", None, new_watermark_us=5,
                         expected_version=m.version, on_conflict="rebase")


def test_same_batch_id_applies_exactly_once_under_race(spark, tmpdir_path):
    """Two writers race the SAME batch (redelivered trigger): the loser's
    commit short-circuits to the winner's snapshot — no double apply."""
    path = tmpdir_path + "/t"
    LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    batch_rows = [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "once", None, "f1")]
    t = _InterleavedTable(path, spark, _mk(spark, batch_rows), "dup")
    apply_batch(spark, t, _mk(spark, batch_rows), "dup", mode="mor")
    clean = LakeTable(path)
    assert clean.read(spark).count() == 1
    assert clean.manifest().version == 1  # rival's commit only
    assert list(clean.manifest().commits) == ["dup"]


def test_bloom_dropped_when_rebase_cannot_prove_coverage(spark, tmpdir_path):
    """Our COW commit carries bloom = base ∪ batch; the rival's MOR commit
    dropped the sidecar (its keys are uncovered). The rebased commit must
    NOT publish our bloom — a false pure-insert proof would skip the merge
    join for the rival's keys later."""
    path = tmpdir_path + "/t"
    t0 = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t0, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:00"), 1, "seed", 0, "user", "seed", None, "f0")]),
        "seed")  # COW: table now HAS a bloom
    assert LakeTable(path).manifest().bloom is not None
    rival = _mk(spark, [
        ("I", _ts("2024-01-01T00:01:00"), 2, "c-rival", 0, "user", "x", None, "fB")])
    t = _InterleavedTable(path, spark, rival, "rivalB", rival_mode="mor")
    ours = _mk(spark, [
        ("I", _ts("2024-01-01T00:02:00"), 3, "c-ours", 0, "user", "y", None, "fA")])
    apply_batch(spark, t, ours, "oursA", mode="cow")
    clean = LakeTable(path)
    assert clean.manifest().bloom is None  # stale-by-construction → dropped
    # and a later update of the rival's key must still merge correctly
    apply_batch(spark, clean, _mk(spark, [
        ("U", _ts("2024-01-01T00:03:00"), 4, "c-rival", 0, "user", "x2", None, "fC")]),
        "b-after")
    rows = {r["conv_id"]: r["text"] for r in clean.read(spark).collect()}
    assert rows["c-rival"] == "x2" and len(rows) == 3
