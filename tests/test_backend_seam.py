"""The Iceberg swap point: the apply/merge/stream paths may only touch the
LakeBackend Protocol surface (etl_spark/lake/backend.py). A proxy records
every attribute the engine reads off the table during a real replay; any
access outside the Protocol fails the test — so an Iceberg-backed
implementation of exactly these methods is a drop-in."""

import os

from etl_spark.cdc.apply import replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.lake.backend import LakeBackend
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

ALLOWED = {name for name in dir(LakeBackend) if not name.startswith("_")}


class RecordingTable:
    """Attribute-access spy around a LakeTable."""

    def __init__(self, inner: LakeTable):
        object.__setattr__(self, "_inner", inner)
        object.__setattr__(self, "accessed", set())

    def __getattr__(self, name):
        if not name.startswith("_"):
            self.accessed.add(name)
        return getattr(self._inner, name)


def test_laketable_satisfies_backend_protocol():
    t = LakeTable.__new__(LakeTable)
    missing = [m for m in ALLOWED if not hasattr(type(t), m)]
    assert not missing, f"LakeTable lacks protocol methods: {missing}"


def test_merge_paths_stay_within_backend_protocol(spark, tmpdir_path):
    feed_dir = os.path.join(tmpdir_path, "feed")
    write_feed(
        change_feed_df(
            spark, n_events=2000, n_convs=40, max_turns=8, seed=31,
            delete_ratio=0.05, dup_ratio=0.05, ooo_ratio=0.1, n_batches=2,
        ),
        feed_dir,
    )
    for mode in ("cow", "mor"):
        inner = LakeTable.create(
            os.path.join(tmpdir_path, f"lake_{mode}"), TRANSCRIPT_SCHEMA, n_buckets=8
        )
        proxy = RecordingTable(inner)
        stats = replay_feed(spark, proxy, feed_dir, mode=mode)
        # dup_ratio re-delivers ~5% of events, so events_in >= n_events
        assert sum(s.events_in for s in stats) >= 2000
        outside = proxy.accessed - ALLOWED
        assert not outside, (
            f"{mode}: engine touched non-protocol table attributes {outside} — "
            "extend LakeBackend (and the Iceberg mapping table) or refactor"
        )
