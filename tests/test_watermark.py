"""Event-time watermark: persisted high-watermark frontier + optional
late-event drop policy (batch analog of withWatermark; north-star
"micro-batches with watermarks"). Correctness never depends on it — LWW
does that — so the default is off; when enabled, too-late events are
counted ``late_dropped`` and excluded even when LWW would apply them."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA

T0 = datetime(2024, 6, 1, 12, 0, 0)


def _ev(op, ts, seq, conv, turn, text):
    return (op, ts, seq, conv, turn, "user", text, None, "seg")


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_watermark_advances_and_drops_late(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    assert table.high_watermark_us() is None

    b1 = _batch(
        spark,
        [
            _ev("I", T0, 1, "c1", 0, "v1"),
            _ev("I", T0 + timedelta(minutes=5), 2, "c1", 1, "v1"),
        ],
    )
    s1 = apply_batch(spark, table, b1, "b1", late_watermark_sec=3600)
    assert s1.late_dropped == 0
    wm1 = table.high_watermark_us()
    assert wm1 is not None

    # batch 2: one fresh event (advances wm), one 2h-late event (dropped),
    # one 30min-late event (within the 1h allowance → applied)
    b2 = _batch(
        spark,
        [
            _ev("I", T0 + timedelta(minutes=10), 3, "c2", 0, "fresh"),
            _ev("U", T0 - timedelta(hours=2), 4, "c1", 0, "too-late"),
            _ev("U", T0 - timedelta(minutes=25), 5, "c1", 1, "slightly-late"),
        ],
    )
    s2 = apply_batch(spark, table, b2, "b2", late_watermark_sec=3600)
    assert s2.late_dropped == 1
    assert table.high_watermark_us() > wm1

    final = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read(spark).collect()
    }
    assert final[("c1", 0)] == "v1"  # too-late update NOT applied
    # slightly-late has OLDER ts than v1 → LWW keeps v1 (watermark let it
    # through; LWW then judged it stale)
    assert final[("c1", 1)] == "v1"
    assert final[("c2", 0)] == "fresh"

    # metrics invariant incl. late_dropped
    m = {r["batch_id"]: r for r in table.metrics_df(spark).collect()}
    r = m["b2"]
    assert r["events_in"] == (
        r["failed"] + r["late_dropped"] + r["dup_dropped"] + r["inserted"]
        + r["updated"] + r["deleted"] + r["stale_skipped"]
    )


def test_watermark_off_by_default(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, table, _batch(spark, [_ev("I", T0, 1, "c1", 0, "v1")]), "b1")
    # a very late UPDATE with a NEWER op_seq but older ts loses via LWW;
    # a very late update with newer ts wins — no watermark interference
    b2 = _batch(
        spark,
        [_ev("U", T0 + timedelta(seconds=1), 2, "c1", 0, "late-but-newer")],
    )
    s = apply_batch(spark, table, b2, "b2")
    assert s.late_dropped == 0 and s.updated == 1
    assert table.read(spark).collect()[0]["text"] == "late-but-newer"


def test_all_late_batch_still_commits(spark, tmp_path):
    """A batch that is entirely late must still commit (segment recorded,
    watermark math unchanged) — otherwise replay would re-deliver it
    forever."""
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, table, _batch(spark, [_ev("I", T0, 1, "c1", 0, "v1")]),
                "b1", late_watermark_sec=60)
    b2 = _batch(spark, [_ev("U", T0 - timedelta(hours=5), 2, "c1", 0, "stale")])
    s2 = apply_batch(spark, table, b2, "b2", segments=["seg2"],
                     late_watermark_sec=60)
    assert s2.late_dropped == 1 and s2.applied() == 0
    assert table.is_committed("b2")
    assert "seg2" in table.committed_segments()
    assert table.read(spark).collect()[0]["text"] == "v1"
