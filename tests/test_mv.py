"""Incremental materialized-view maintenance (lake/mv.py): delta-scoped
partial recompute must equal a full recompute at every step, including
update-in-place, delete drop-out, and no-op refreshes."""

import datetime as dt

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.mv import ConvSummaryMV, conv_summary
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _assert_mv_equals_full(spark, mv, table):
    got = sorted(map(tuple, mv.read(spark).collect()))
    want = sorted(map(tuple, conv_summary(table.read(spark)).collect()))
    assert got == want


def test_incremental_refresh_tracks_full_recompute(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    mv = ConvSummaryMV(tmpdir_path + "/mv")

    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "hello", None, "f"),
        ("I", _ts("2024-01-01T00:00:02"), 2, "c1", 1, "assistant", "hi!", "tool-a", "f"),
        ("I", _ts("2024-01-01T00:00:03"), 3, "c2", 0, "user", "yo", None, "f"),
    ]), "b1", mode="mor")
    assert mv.refresh(spark, t) == -1  # bootstrap
    _assert_mv_equals_full(spark, mv, t)

    # update c1 turn 0 (longer text) + new conv c3 — c2 must be untouched
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 4, "c1", 0, "user", "hello again", None, "f"),
        ("I", _ts("2024-01-01T00:01:01"), 5, "c3", 0, "user", "new conv", None, "f"),
    ]), "b2", mode="mor")
    assert mv.refresh(spark, t) == 2  # c1 and c3 affected
    _assert_mv_equals_full(spark, mv, t)
    row = {r["conv_id"]: r for r in mv.read(spark).collect()}
    assert row["c1"]["total_chars"] == len("hello again") + len("hi!")
    assert row["c1"]["n_tool_turns"] == 1

    # delete all of c3 — it must drop OUT of the MV
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T00:02:00"), 6, "c3", 0, None, None, None, "f"),
    ]), "b3", mode="mor")
    assert mv.refresh(spark, t) == 1
    _assert_mv_equals_full(spark, mv, t)
    assert "c3" not in {r["conv_id"] for r in mv.read(spark).collect()}

    # no new commits: refresh is a no-op
    assert mv.refresh(spark, t) == 0
    assert mv.table_version == t.current_version()


def test_refresh_stepwise_equals_refresh_to_head(spark, tmpdir_path):
    """Many small refreshes == one big refresh (version-path independence)."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    for i in range(4):
        apply_batch(spark, t, _mk(spark, [
            ("I", _ts(f"2024-01-01T00:0{i}:01"), 10 * i + 1, f"c{i % 2}", i,
             "user", f"m{i}", None, "f"),
        ]), f"b{i}", mode="mor")
    versions = t.versions()
    mv_step = ConvSummaryMV(tmpdir_path + "/mv_step")
    mv_step.full_refresh(spark, t, version=versions[0])
    for v in versions[1:]:
        mv_step.refresh(spark, t, to_version=v)
    mv_big = ConvSummaryMV(tmpdir_path + "/mv_big")
    mv_big.full_refresh(spark, t, version=versions[0])
    mv_big.refresh(spark, t)
    a = sorted(map(tuple, mv_step.read(spark).collect()))
    b = sorted(map(tuple, mv_big.read(spark).collect()))
    assert a == b
    _assert_mv_equals_full(spark, mv_step, t)


def test_streaming_keeps_mv_in_sync(spark, tmpdir_path):
    """mv_path on the streaming driver: after the drain, the MV must equal
    a full recompute of the final table state, having been refreshed only
    through per-trigger changelog deltas."""
    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.cdc.stream import run_stream

    feed_dir = tmpdir_path + "/feed"
    write_feed(
        change_feed_df(spark, n_events=4000, n_convs=60, max_turns=8,
                       seed=13, n_batches=3),
        feed_dir, n_batches=3, files_per_segment=2,
    )
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=8)
    mv_path = tmpdir_path + "/mv"
    run_stream(
        spark, t, feed_dir, tmpdir_path + "/ckpt",
        max_files_per_trigger=2, available_now=True, mode="mor",
        mv_path=mv_path,
    )
    mv = ConvSummaryMV(mv_path)
    assert mv.table_version == t.current_version()
    _assert_mv_equals_full(spark, mv, t)
    # MV telemetry rides the progress rows: at least one delta refresh
    # recorded its arith/re-agg split (first trigger bootstraps → NULL)
    from pyspark.sql import functions as F

    from etl_spark.cdc.stream import progress_df

    p = progress_df(spark, tmpdir_path + "/ckpt/_progress")
    mv_rows = p.filter(F.col("mv_arith").isNotNull()).collect()
    assert mv_rows, "no trigger recorded MV telemetry"
    assert all(r["mv_arith"] + r["mv_reagg"] > 0 for r in mv_rows)


def test_keyed_mv_custom_view(spark, tmpdir_path):
    """KeyedMV accepts any one-row-per-conv view_fn; incremental == full."""
    from pyspark.sql import functions as F

    from etl_spark.lake.mv import KeyedMV

    def role_mix(state):
        return state.groupBy("conv_id").agg(
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
            F.max(F.length("text")).alias("max_len"),
        )

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    mv = KeyedMV(tmpdir_path + "/mv", role_mix)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "hey", None, "f"),
        ("I", _ts("2024-01-01T00:00:02"), 2, "c1", 1, "assistant", "hello!", None, "f"),
    ]), "b1", mode="mor")
    mv.refresh(spark, t)
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 3, "c1", 1, "assistant", "hello again!", None, "f"),
        ("I", _ts("2024-01-01T00:01:01"), 4, "c2", 0, "user", "hi", None, "f"),
    ]), "b2", mode="mor")
    assert mv.refresh(spark, t) == 2
    got = sorted(map(tuple, mv.read(spark).collect()))
    want = sorted(map(tuple, role_mix(t.read(spark)).collect()))
    assert got == want


def test_mv_refresh_across_rebucket(spark, tmpdir_path):
    """Incremental refresh whose interval spans a bucket-count evolution
    must still equal the full recompute (the changelog falls back to a
    full diff; the scoped re-aggregate must use the target layout)."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "one", None, "f"),
        ("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "two", None, "f"),
    ]), "b1", mode="mor")
    mv = ConvSummaryMV(tmpdir_path + "/mv")
    mv.refresh(spark, t)
    t.rebucket(spark, 11)
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 3, "c1", 0, "user", "one-updated", None, "f"),
        ("I", _ts("2024-01-01T00:01:01"), 4, "c3", 0, "user", "three", None, "f"),
    ]), "b2", mode="mor")
    mv.refresh(spark, t)
    _assert_mv_equals_full(spark, mv, t)


def test_streaming_mv_catches_up_after_crash_between_commit_and_refresh(
    spark, tmpdir_path
):
    """Crash window: table committed, MV refresh never ran (simulated by
    draining WITHOUT mv_path). The re-delivered stream (fresh checkpoint,
    same feed) no-ops every merge but must still bring the MV current."""
    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.cdc.stream import run_stream

    feed_dir = tmpdir_path + "/feed"
    write_feed(
        change_feed_df(spark, n_events=2000, n_convs=40, max_turns=6,
                       seed=5, n_batches=2),
        feed_dir, n_batches=2, files_per_segment=2,
    )
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    run_stream(spark, t, feed_dir, tmpdir_path + "/ckpt1",
               available_now=True, mode="mor")  # "crashed before refresh"
    v_done = t.current_version()
    mv_path = tmpdir_path + "/mv"
    run_stream(spark, t, feed_dir, tmpdir_path + "/ckpt2",
               available_now=True, mode="mor", mv_path=mv_path)
    assert t.current_version() == v_done  # merges all no-oped
    mv = ConvSummaryMV(mv_path)
    assert mv.table_version == v_done
    _assert_mv_equals_full(spark, mv, t)


def test_delta_refresh_argmax_fallback_on_delete_of_max(spark, tmpdir_path):
    """Deleting the row that carried a conversation's last_ts invalidates
    the greatest() shortcut — the delta refresh must re-aggregate exactly
    that conversation and land on the surviving max."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "a", None, "f"),
        ("I", _ts("2024-01-01T00:00:09"), 2, "c1", 1, "user", "b", None, "f"),
        ("I", _ts("2024-01-01T00:00:05"), 3, "c1", 2, "user", "c", None, "f"),
    ]), "b1", mode="mor")
    mv = ConvSummaryMV(tmpdir_path + "/mv")
    mv.refresh(spark, t)
    # delete turn 1 (ts :09, the max) — survivors' max is :05
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T00:01:00"), 4, "c1", 1, None, None, None, "f"),
    ]), "b2", mode="mor")
    assert mv.refresh(spark, t) == 1
    _assert_mv_equals_full(spark, mv, t)
    row = {r["conv_id"]: r for r in mv.read(spark).collect()}
    assert row["c1"]["last_ts"] == _ts("2024-01-01T00:00:05")
    assert row["c1"]["n_turns"] == 2


def test_delta_refresh_ts_lowering_update(spark, tmpdir_path):
    """An out-of-order replacement can LOWER the argmax row's event time —
    max(ts) must shrink, which greatest() alone cannot produce."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "a", None, "f"),
        ("I", _ts("2024-01-01T00:00:09"), 2, "c1", 1, "user", "b", None, "f"),
    ]), "b1", mode="mor")
    mv = ConvSummaryMV(tmpdir_path + "/mv")
    mv.refresh(spark, t)
    # turn 1 replaced by a LATER event (op_seq wins) carrying an EARLIER ts
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:09"), 3, "c1", 1, "user", "b2", None, "f"),
    ]), "b2", mode="mor")
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:02"), 4, "c1", 1, "user", "b3", None, "f"),
    ]), "b3", mode="mor")
    # LWW on (ts, op_seq): ts :09 still wins for the ROW, so last_ts stays;
    # this asserts the refresh tracks whatever the engine's state says
    mv.refresh(spark, t)
    _assert_mv_equals_full(spark, mv, t)


def test_delta_refresh_null_text_conversations(spark, tmpdir_path):
    """total_chars must stay NULL for a conversation whose every live text
    is NULL (oracle semantics of sum over all-NULL), through delta
    refreshes that add and remove such rows."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", None, None, "f"),
        ("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "hi", None, "f"),
    ]), "b1", mode="mor")
    mv = ConvSummaryMV(tmpdir_path + "/mv")
    mv.refresh(spark, t)
    row = {r["conv_id"]: r for r in mv.read(spark).collect()}
    assert row["c1"]["total_chars"] is None
    # c1 gains a real text, then loses it again
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:01:00"), 3, "c1", 1, "user", "real", None, "f"),
    ]), "b2", mode="mor")
    mv.refresh(spark, t)
    _assert_mv_equals_full(spark, mv, t)
    row = {r["conv_id"]: r for r in mv.read(spark).collect()}
    assert row["c1"]["total_chars"] == 4
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T00:02:00"), 4, "c1", 1, None, None, None, "f"),
    ]), "b3", mode="mor")
    mv.refresh(spark, t)
    _assert_mv_equals_full(spark, mv, t)
    row = {r["conv_id"]: r for r in mv.read(spark).collect()}
    assert row["c1"]["total_chars"] is None


def test_delta_refresh_random_feed_stepwise(spark, tmpdir_path):
    """Property-style: a generated feed with deletes, duplicates and
    out-of-order events, applied batch by batch with a refresh after each —
    the MV must equal the full recompute at EVERY step."""
    from pyspark.sql import functions as F

    from etl_spark.cdc.gen import change_feed_df

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    mv = ConvSummaryMV(tmpdir_path + "/mv")
    feed = change_feed_df(spark, n_events=3000, n_convs=50, max_turns=8,
                          seed=21, delete_ratio=0.15, ooo_ratio=0.2,
                          n_batches=4).localCheckpoint(eager=True)
    for b in range(4):
        batch = feed.filter(F.col("batch") == b).drop("batch")
        apply_batch(spark, t, batch, f"b{b}", mode="mor")
        mv.refresh(spark, t)
        _assert_mv_equals_full(spark, mv, t)


def test_mv_refresh_cadence_with_final_catchup(spark, tmpdir_path):
    """mv_refresh_every > 1: intermediate triggers skip the refresh, the
    availableNow drain ends with a catch-up, and the final MV equals the
    full recompute."""
    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.cdc.stream import run_stream

    feed_dir = tmpdir_path + "/feed"
    write_feed(
        change_feed_df(spark, n_events=3000, n_convs=50, max_turns=8,
                       seed=31, n_batches=5),
        feed_dir, n_batches=5, files_per_segment=1,
    )
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    mv_path = tmpdir_path + "/mv"
    run_stream(spark, t, feed_dir, tmpdir_path + "/ckpt",
               max_files_per_trigger=1, available_now=True, mode="mor",
               mv_path=mv_path, mv_refresh_every=3)
    mv = ConvSummaryMV(mv_path)
    assert mv.table_version == t.current_version()
    _assert_mv_equals_full(spark, mv, t)


def test_adaptive_cutover_full_recompute(spark, tmp_path):
    """When a refresh interval touches ≥ full_cutover of the view's rows,
    both MV flavors cut over to full_refresh — and the result is
    identical to what the delta path would produce."""
    import os

    from etl_spark.cdc.apply import replay_feed
    from etl_spark.cdc.gen import change_feed_df, write_feed
    from etl_spark.lake.mv import ConvSummaryMV, KeyedMV
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA

    feed = str(tmp_path / "feed")
    write_feed(change_feed_df(spark, n_events=6000, n_convs=40, max_turns=10,
                              seed=17, n_batches=2), feed)
    t = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    segs = sorted(os.listdir(feed))
    first = str(tmp_path / "f1")
    os.makedirs(first)
    os.rename(os.path.join(feed, segs[1]), os.path.join(first, segs[1]))
    replay_feed(spark, t, feed, mode="mor")

    mvs = {}
    for cls, name in ((ConvSummaryMV, "c"), (KeyedMV, "k")):
        cut = cls(str(tmp_path / f"mv_{name}_cut"))
        cut.full_cutover = 0.5  # ConvSummaryMV disables it by default
        ref = cls(str(tmp_path / f"mv_{name}_ref"))
        ref.full_cutover = 1.0  # delta path, no cutover
        cut.refresh(spark, t)
        ref.refresh(spark, t)
        mvs[name] = (cut, ref)

    # second segment touches (nearly) every conversation → cutover fires
    os.rename(os.path.join(first, segs[1]), os.path.join(feed, segs[1]))
    replay_feed(spark, t, feed, mode="mor")
    for name, (cut, ref) in mvs.items():
        calls = []
        orig = type(cut).full_refresh
        type(cut).full_refresh = (
            lambda self, *a, _o=orig, _c=calls, **k: (_c.append(1), _o(self, *a, **k))[1]
        )
        try:
            n1 = cut.refresh(spark, t)
            assert calls, f"{name}: cutover did not fire"
            n2 = ref.refresh(spark, t)
            assert not len(calls) > 1
        finally:
            type(cut).full_refresh = orig
        a = {tuple(r) for r in cut.read(spark).collect()}
        b = {tuple(r) for r in ref.read(spark).collect()}
        assert a == b and a, name
        assert n1 == n2


def test_refresh_telemetry_class_distribution(spark, tmpdir_path):
    """last_refresh_stats pins the arith/fallback split per refresh: an
    arithmetic-only interval reports n_reagg=0; deleting a conversation's
    max-ts turn trips class 1; touching an all-NULL-text conversation
    trips class 2 (round-4 VERDICT ask #3)."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    mv = ConvSummaryMV(tmpdir_path + "/mv")
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "a1", 0, "user", "hello", None, "f"),
        ("I", _ts("2024-01-01T00:00:02"), 2, "a1", 1, "user", "world", None, "f"),
        ("I", _ts("2024-01-01T00:00:03"), 3, "a2", 0, "user", None, None, "f"),
    ]), "b1", mode="mor")
    assert mv.refresh(spark, t) == -1 and mv.last_refresh_stats is None

    # pure-arithmetic interval: appended turn with a NEWER ts
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:01:00"), 4, "a1", 2, "user", "more", None, "f"),
    ]), "b2", mode="mor")
    assert mv.refresh(spark, t) == 1
    s = mv.last_refresh_stats
    assert s == {"n_affected": 1, "n_arith": 1, "n_reagg": 0,
                 "reagg_class_1": 0, "reagg_class_2": 0, "reagg_class_3": 0}
    _assert_mv_equals_full(spark, mv, t)

    # class 1 (a1: max-ts turn deleted) + class 2 (a2: NULL-total conv
    # touched) in one interval
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T00:02:00"), 5, "a1", 2, None, None, None, "f"),
        ("I", _ts("2024-01-01T00:02:01"), 6, "a2", 1, "user", None, None, "f"),
    ]), "b3", mode="mor")
    assert mv.refresh(spark, t) == 2
    s = mv.last_refresh_stats
    assert s["n_reagg"] == 2 and s["n_arith"] == 0
    assert s["reagg_class_1"] == 1 and s["reagg_class_2"] == 1
    _assert_mv_equals_full(spark, mv, t)
