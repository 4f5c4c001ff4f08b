"""Two genuinely concurrent writers — a CDC apply loop and a maintenance
job — race one table from separate threads. With optimistic-concurrency
rebase (appends) + recompute-on-reentry (rewrites), both must make
progress and the final state must equal the single-writer oracle.

This is the deployment shape the engine claims at scale: a streaming
driver appending MOR deltas while an independent table-service process
runs compaction/delta-resolve against the same lake path.
"""

import datetime as dt
import threading

from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import CommitConflictError, LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _batch(spark, b):
    """Deterministic batch b: upserts over 40 conversations with rolling
    turn indexes, so consecutive batches overlap keys (real CDC shape)."""
    rows = [
        ("U" if (b + i) % 3 else "I", _ts(b * 100 + i), b * 1000 + i,
         f"c{(i * 7 + b) % 40}", i % 6, "user", f"text-{b}-{i}", None, f"f{b}")
        for i in range(120)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_stream_vs_maintenance_threads(spark, tmpdir_path):
    path = tmpdir_path + "/t"
    LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=4)
    n_batches = 8
    errors: list[BaseException] = []
    done = threading.Event()

    def stream():
        t = LakeTable(path)
        try:
            for b in range(n_batches):
                apply_batch(spark, t, _batch(spark, b), f"b{b}", mode="mor")
        except BaseException as e:  # pragma: no cover - failure surface
            errors.append(e)
        finally:
            done.set()

    maintenance_commits = [0]

    def maintenance():
        t = LakeTable(path)
        while not done.is_set():
            try:
                if t.resolve_deltas(spark):
                    maintenance_commits[0] += 1
            except CommitConflictError:
                pass  # sustained pressure — operator-visible, try next round
            except BaseException as e:  # pragma: no cover
                errors.append(e)
                return
            done.wait(0.05)

    ts_ = [threading.Thread(target=stream), threading.Thread(target=maintenance)]
    for th in ts_:
        th.start()
    for th in ts_:
        th.join(timeout=600)
    assert not errors, errors

    t = LakeTable(path)
    # at least one maintenance pass must land once the stream is quiet
    if t.manifest().needs_reduce:
        assert t.resolve_deltas(spark) >= 0
        maintenance_commits[0] += 1

    # single-writer oracle: LWW over the union of all batches
    union = _batch(spark, 0)
    for b in range(1, n_batches):
        union = union.unionByName(_batch(spark, b))
    from pyspark.sql import Window
    w = (
        F.row_number().over(
            Window.partitionBy("conv_id", "turn_idx")
            .orderBy(F.col("ts").desc(), F.col("op_seq").desc())
        )
    )
    expect = (
        union.withColumn("rn", w).filter("rn = 1").filter("op <> 'D'")
        .select("conv_id", "turn_idx", "text")
    )
    got = t.read(spark).select("conv_id", "turn_idx", "text")
    sym_diff = got.exceptAll(expect).count() + expect.exceptAll(got).count()
    assert sym_diff == 0
    # every batch committed exactly once
    assert {f"b{b}" for b in range(n_batches)} <= set(t.manifest().commits)


def test_external_compaction_retries_through_conflicts(spark, tmpdir_path):
    """Direct re-entry check without thread timing: compaction whose first
    commit loses the CAS recomputes against the fresh snapshot."""
    path = tmpdir_path + "/t"
    t0 = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=2)
    for b in range(3):
        apply_batch(spark, t0, _batch(spark, b), f"b{b}", mode="mor")

    class Racing(LakeTable):
        """Lose the first commit attempt: a rival lands a batch between
        this compaction's read and its commit_version."""

        def __init__(self, path):
            super().__init__(path)
            self.raced = False

        def write_bucket_files(self, *a, **k):
            out = super().write_bucket_files(*a, **k)
            if not self.raced:
                self.raced = True
                apply_batch(spark, LakeTable(self.path), _batch(spark, 9),
                            "rival", mode="mor")
            return out

    t = Racing(path)
    n = t.resolve_deltas(spark)
    assert n > 0 and t.raced
    m = LakeTable(path).manifest()
    assert "rival" in m.commits
    # the rival's rows survived the racing rewrite
    got = LakeTable(path).read(spark).filter(F.col("text").startswith("text-9-"))
    assert got.count() > 0


def test_rebased_resolve_cannot_clear_marker_over_new_deltas(spark, tmpdir_path):
    """resolve_deltas proves 'every delta bucket rewritten reduced' against
    its BASE. A concurrent MOR append into a bucket that was EMPTY at base
    rebases cleanly (disjoint) — but the rebased commit must NOT stamp
    needs_reduce=False over the newcomer's unresolved deltas, or readers
    would skip the LWW reduction and return duplicate key versions."""
    path = tmpdir_path + "/t"
    t0 = LakeTable.create(path, TRANSCRIPT_SCHEMA, n_buckets=2)
    # find conv ids for each bucket deterministically
    conv_b = {t0.bucket_of(spark, f"cv{i}"): f"cv{i}" for i in range(16)}
    c0, c1 = conv_b[0], conv_b[1]

    def rows(conv, ts_sec, seq, text):
        return [("I" if seq < 10 else "U", _ts(ts_sec), seq, conv, 0,
                 "user", text, None, "f")]

    apply_batch(spark, t0, spark.createDataFrame(
        rows(c0, 1, 1, "b0-v1"), CHANGE_SCHEMA), "seed", mode="mor")
    apply_batch(spark, t0, spark.createDataFrame(
        rows(c0, 2, 11, "b0-v2"), CHANGE_SCHEMA), "seed2", mode="mor")
    assert t0.manifest().needs_reduce

    class Racing(LakeTable):
        def __init__(self, path):
            super().__init__(path)
            self.raced = False

        def write_bucket_files(self, *a, **k):
            out = super().write_bucket_files(*a, **k)
            if not self.raced:
                self.raced = True
                rt = LakeTable(self.path)
                # TWO overlapping-key appends into the empty bucket 1
                apply_batch(spark, rt, spark.createDataFrame(
                    rows(c1, 2, 2, "old"), CHANGE_SCHEMA), "r1", mode="mor")
                apply_batch(spark, rt, spark.createDataFrame(
                    rows(c1, 3, 30, "new"), CHANGE_SCHEMA), "r2", mode="mor")
            return out

    t = Racing(path)
    t.resolve_deltas(spark)
    assert t.raced
    m = LakeTable(path).manifest()
    assert m.needs_reduce, "rebase must not clear the marker over new deltas"
    got = LakeTable(path).read(spark).filter(F.col("conv_id") == c1).collect()
    assert len(got) == 1 and got[0]["text"] == "new"
