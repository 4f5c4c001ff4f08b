"""Row-level DELETE FROM / UPDATE WHERE maintenance (copy-on-write).

delete_where default = tombstone-with-redaction: matching live rows keep
their (ts, op_seq) ordinal but flip ``deleted`` and null every payload
column — so the change feed's LWW stays coherent (a strictly-newer feed
event resurrects, an older replay stays stale) while the content is
physically gone after the rewrite. purge=True removes rows entirely.
Reference analog: gardener reprocess-time retractions
(/root/reference/schema/README.md:6-10).
"""

from __future__ import annotations

import datetime as dt

import pytest

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

SCHEMA = (
    "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
    "role string, text string, tool string"
)
TS = dt.datetime(2024, 1, 1)
TS2 = dt.datetime(2024, 1, 2)


def _mk_table(spark, tmp_path, rows, n_buckets=4):
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets)
    apply_batch(spark, table, spark.createDataFrame(rows, SCHEMA), "b1")
    return table


def _state(spark, table):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text)
        for r in table.read(spark).collect()
    }


BASE = [
    ("I", TS, 1, "a", 0, "user", "keep me", None),
    ("I", TS, 2, "a", 1, "assistant", "secret-123", None),
    ("I", TS, 3, "b", 0, "user", "secret-456", None),
    ("I", TS, 4, "b", 1, "assistant", "fine", None),
]


def test_delete_where_tombstones_and_redacts(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    n = table.delete_where(spark, "text LIKE 'secret%'")
    assert n == 2
    st = _state(spark, table)
    assert set(st) == {("a", 0), ("b", 1)}
    # redaction is physical: no current data file holds the deleted text
    import os

    hits = 0
    m = table.manifest()
    for fl in m.files.values():
        for fe in fl:
            df = spark.read.parquet(os.path.join(table.path, fe["path"]))
            hits += df.filter("text LIKE 'secret%'").count()
    assert hits == 0


def test_delete_where_keeps_lww_ordering(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    table.delete_where(spark, "turn_idx = 1")  # tombstones (a,1) and (b,1)
    # strictly newer feed event resurrects the key
    newer = [("U", TS2, 10, "a", 1, "assistant", "resurrected", None)]
    apply_batch(spark, table, spark.createDataFrame(newer, SCHEMA), "b2")
    # an OLDER replayed event is stale behind the kept tombstone ordinal
    older = [("U", dt.datetime(2023, 12, 31), 0, "b", 1, "user", "stale", None)]
    apply_batch(spark, table, spark.createDataFrame(older, SCHEMA), "b3")
    st = _state(spark, table)
    assert st[("a", 1)] == ("assistant", "resurrected")
    assert ("b", 1) not in st  # tombstone still wins over the older event


def test_delete_where_purge_drops_rows(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    v0 = table.current_version()
    n = table.delete_where(spark, "conv_id = 'b'", purge=True)
    assert n == 2
    assert table.current_version() == v0 + 1
    st = _state(spark, table)
    assert set(st) == {("a", 0), ("a", 1)}
    # purge leaves no tombstone: an OLDER event re-inserts as fresh
    older = [("I", dt.datetime(2023, 12, 31), 0, "b", 0, "user", "back", None)]
    apply_batch(spark, table, spark.createDataFrame(older, SCHEMA), "b2")
    assert _state(spark, table)[("b", 0)] == ("user", "back")


def test_delete_where_no_match_is_noop(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    v0 = table.current_version()
    assert table.delete_where(spark, "text = 'nope'") == 0
    assert table.current_version() == v0


def test_update_where_rewrites_only_matches(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    n = table.update_where(
        spark,
        "text LIKE 'secret%'",
        {"text": "regexp_replace(text, 'secret-[0-9]+', '[REDACTED]')",
         "tool": "'redactor'"},
    )
    assert n == 2
    st = {
        (r.conv_id, r.turn_idx): (r.text, r.tool)
        for r in table.read(spark).collect()
    }
    assert st[("a", 1)] == ("[REDACTED]", "redactor")
    assert st[("b", 0)] == ("[REDACTED]", "redactor")
    assert st[("a", 0)] == ("keep me", None)


def test_update_where_keeps_ordinal_lww(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    table.update_where(spark, "conv_id = 'a' AND turn_idx = 0", {"text": "'fixed'"})
    # newer feed event overwrites the maintenance fix-up
    newer = [("U", TS2, 10, "a", 0, "user", "newer", None)]
    apply_batch(spark, table, spark.createDataFrame(newer, SCHEMA), "b2")
    # older replay is stale against the kept ordinal
    older = [("U", dt.datetime(2023, 12, 31), 0, "a", 1, "user", "stale", None)]
    apply_batch(spark, table, spark.createDataFrame(older, SCHEMA), "b3")
    st = _state(spark, table)
    assert st[("a", 0)] == ("user", "newer")
    assert st[("a", 1)][1] == "secret-123"


def test_update_where_rejects_key_and_system_columns(spark, tmp_path):
    table = _mk_table(spark, tmp_path, BASE)
    with pytest.raises(ValueError):
        table.update_where(spark, "true", {"conv_id": "'x'"})
    with pytest.raises(ValueError):
        table.update_where(spark, "true", {"ts": "ts"})


def test_delete_where_untouched_buckets_reuse_files(spark, tmp_path):
    rows = [
        ("I", TS, i, f"conv-{i}", 0, "user", f"t{i}", None) for i in range(40)
    ] + [("I", TS, 100, "conv-0", 1, "user", "target", None)]
    table = _mk_table(spark, tmp_path, rows, n_buckets=8)
    before = {
        b: [fe["path"] for fe in fl]
        for b, fl in table.manifest().files.items()
    }
    table.delete_where(spark, "text = 'target'")
    after = {
        b: [fe["path"] for fe in fl]
        for b, fl in table.manifest().files.items()
    }
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) == 1  # only the bucket holding conv-0 was rewritten
    unchanged = [b for b in before if b not in changed]
    assert all(before[b] == after[b] for b in unchanged)


def test_delete_where_purge_entire_bucket(spark, tmp_path):
    # all rows share one conv -> one bucket; purging everything must leave
    # a readable empty-bucket manifest and later inserts must still work
    rows = [("I", TS, i, "only-conv", i, "user", f"t{i}", None) for i in range(5)]
    table = _mk_table(spark, tmp_path, rows, n_buckets=4)
    n = table.delete_where(spark, "conv_id = 'only-conv'", purge=True)
    assert n == 5
    assert table.read(spark).count() == 0
    again = [("I", TS2, 100, "only-conv", 0, "user", "fresh", None)]
    apply_batch(spark, table, spark.createDataFrame(again, SCHEMA), "b2")
    assert _state(spark, table) == {("only-conv", 0): ("user", "fresh")}
